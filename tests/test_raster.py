"""Raster ↔ vector tile operators (operators/raster.py).

Hand-computed goldens on tiny point sets plus decode-roundtrip and
polygonize-structure checks; the cross-engine oracles live in
sparktiles/queries.py (raster_tile_stats, raster_polygonize_runs).
"""

import numpy as np
import pytest

from sparktiles.functions.tilemath import HALF_WORLD, WORLD_MERC_WIDTH
from sparktiles.operators.multimodal import decode_sptx
from sparktiles.operators.raster import (
    raster_grid_stats,
    raster_runs_to_features,
    rasterize_cover_tiles,
    rasterize_point_tiles,
)


def _pts(spark, coords):
    return spark.createDataFrame(
        [(float(x), float(y)) for x, y in coords], "x double, y double")


def _merc_of_pixel(z, tx, ty, px, py, grid):
    """Mercator center of pixel (px, py) of tile (tx, ty) at zoom z."""
    tile_w = WORLD_MERC_WIDTH / (1 << z)
    pw = tile_w / grid
    x = -HALF_WORLD + tx * tile_w + (px + 0.5) * pw
    y = HALF_WORLD - ty * tile_w - (py + 0.5) * pw
    return x, y


def test_rasterize_golden(spark):
    # 3 points in one pixel, 1 in another, 1 in a second tile (z=1, 4x4)
    g = 4
    coords = [_merc_of_pixel(1, 0, 0, 1, 2, g)] * 3
    coords.append(_merc_of_pixel(1, 0, 0, 3, 0, g))
    coords.append(_merc_of_pixel(1, 1, 1, 0, 0, g))
    out = rasterize_point_tiles(_pts(spark, coords), zoom=1, grid=g)
    rows = {(r["tx"], r["ty"]): r for r in out.collect()}
    assert set(rows) == {(0, 0), (1, 1)}
    r00 = rows[(0, 0)]
    assert (r00["n_points"], r00["nonzero_pixels"], r00["max_pix"]) == (4, 2, 3)
    a = decode_sptx(bytes(r00["raster"]))[:, :, 0]
    assert a.shape == (g, g)
    assert a[2, 1] == 3 and a[0, 3] == 1 and a.sum() == 4
    a11 = decode_sptx(bytes(rows[(1, 1)]["raster"]))[:, :, 0]
    assert a11[0, 0] == 1 and a11.sum() == 1


def test_rasterize_clip_at_255(spark):
    g = 2
    coords = [_merc_of_pixel(0, 0, 0, 0, 0, g)] * 300
    out = rasterize_point_tiles(_pts(spark, coords), zoom=0, grid=g).collect()[0]
    assert out["n_points"] == 300          # pre-clip count survives
    assert out["max_pix"] == 255           # payload is clipped uint8
    assert decode_sptx(bytes(out["raster"]))[0, 0, 0] == 255


def test_grid_stats_match_decode(spark):
    g = 4
    coords = ([_merc_of_pixel(1, 0, 0, 1, 2, g)] * 3
              + [_merc_of_pixel(1, 0, 0, 2, 2, g)] * 2
              + [_merc_of_pixel(1, 0, 0, 0, 0, g)])
    rasters = rasterize_point_tiles(_pts(spark, coords), zoom=1, grid=g)
    st = {(r["tx"], r["ty"]): r
          for r in raster_grid_stats(rasters, grid=g).collect()}
    r = st[(0, 0)]
    # checksum weights: pixel (px,py) -> py*g+px+1
    assert r["raster_sum"] == 6
    assert r["nonzero_pixels"] == 3
    assert r["pix_checksum"] == 3 * (2 * g + 1 + 1) + 2 * (2 * g + 2 + 1) + 1 * 1


def test_polygonize_runs_structure(spark):
    g = 8
    # row 2: pixels 1,2,3 qualify (one run); row 2 pixel 6 (second run);
    # row 5: pixel 0 below threshold -> no run
    coords = []
    for px in (1, 2, 3):
        coords += [_merc_of_pixel(1, 0, 0, px, 2, g)] * 2
    coords += [_merc_of_pixel(1, 0, 0, 6, 2, g)] * 3
    coords += [_merc_of_pixel(1, 0, 0, 0, 5, g)]
    rasters = rasterize_point_tiles(_pts(spark, coords), zoom=1, grid=g)
    runs = sorted(raster_runs_to_features(rasters, threshold=2).collect(),
                  key=lambda r: (r["py"], r["px0"]))
    assert [(r["py"], r["px0"], r["px1"], r["run_len"], r["run_sum"])
            for r in runs] == [(2, 1, 3, 3, 6), (2, 6, 6, 1, 3)]
    # mercator bounds: run 1 spans pixels 1..3 of tile (0,0) at z=1
    tile_w = WORLD_MERC_WIDTH / 2
    pw = tile_w / g
    r = runs[0]
    assert r["xmin"] == pytest.approx(-HALF_WORLD + 1 * pw)
    assert r["xmax"] == pytest.approx(-HALF_WORLD + 4 * pw)
    assert r["ymax"] == pytest.approx(HALF_WORLD - 2 * pw)
    assert r["ymin"] == pytest.approx(HALF_WORLD - 3 * pw)


def test_polygonize_full_row_run(spark):
    # a run touching both tile edges closes correctly (the ±pad diffs)
    g = 4
    coords = []
    for px in range(g):
        coords += [_merc_of_pixel(0, 0, 0, px, 1, g)]
    rasters = rasterize_point_tiles(_pts(spark, coords), zoom=0, grid=g)
    runs = raster_runs_to_features(rasters, threshold=1).collect()
    assert len(runs) == 1
    r = runs[0]
    assert (r["px0"], r["px1"], r["run_len"], r["run_sum"]) == (0, g - 1, g, g)
    assert r["xmin"] == pytest.approx(-HALF_WORLD)
    assert r["xmax"] == pytest.approx(HALF_WORLD)


def test_raster_vector_roundtrip_counts(spark):
    # vector -> raster -> vector: total run_sum at threshold 1 equals
    # the clipped point count (here nothing clips)
    rng = np.random.default_rng(7)
    pts = [(float(x), float(y))
           for x, y in zip(rng.uniform(-2e7, 2e7, 500),
                           rng.uniform(-2e7, 2e7, 500))]
    rasters = rasterize_point_tiles(_pts(spark, pts), zoom=2, grid=8)
    runs = raster_runs_to_features(rasters, threshold=1)
    total = runs.groupBy().sum("run_sum").collect()[0][0]
    assert total == 500


def test_rasterize_cover_tiles(spark):
    # synthetic pixel-zoom assignment rows: feature covers pixels of
    # tile (0,0) at z=1 given pixel_zoom=3, grid=4 (lg=2)
    rows = [(3, 0, 0), (3, 1, 0), (3, 2, 0),   # run of 3 pixels, py=0
            (3, 1, 0),                          # second feature on px=1
            (3, 5, 6),                          # tile (1,1), pixel (1,2)
            (2, 9, 9)]                          # wrong zoom -> filtered
    cover = spark.createDataFrame(rows, "z int, x long, y long")
    out = {(r["tx"], r["ty"]): r
           for r in rasterize_cover_tiles(cover, pixel_zoom=3, grid=4).collect()}
    assert set(out) == {(0, 0), (1, 1)}
    r00 = out[(0, 0)]
    assert r00["z"] == 1 and r00["n_points"] == 4
    a = decode_sptx(bytes(r00["raster"]))[:, :, 0]
    assert a[0, 0] == 1 and a[0, 1] == 2 and a[0, 2] == 1 and a.sum() == 4
    a11 = decode_sptx(bytes(out[(1, 1)]["raster"]))[:, :, 0]
    assert a11[2, 1] == 1 and a11.sum() == 1


def test_rasterize_cover_rejects_bad_grid(spark):
    cover = spark.createDataFrame([(3, 0, 0)], "z int, x long, y long")
    import pytest as _pt
    with _pt.raises(ValueError):
        rasterize_cover_tiles(cover, pixel_zoom=3, grid=12)


def test_raster_pyramid_equals_direct(spark):
    # pyramid slices must equal per-zoom direct rasterization exactly
    from sparktiles.operators.raster import raster_pyramid

    rng = np.random.default_rng(11)
    pts = [(float(x), float(y))
           for x, y in zip(rng.uniform(-1.9e7, 1.9e7, 400),
                           rng.uniform(-1.9e7, 1.9e7, 400))]
    pyr = raster_grid_stats(
        raster_pyramid(_pts(spark, pts), minzoom=0, maxzoom=3, grid=8),
        grid=8)
    got = {(r["z"], r["tx"], r["ty"]):
           (r["n_points"], r["raster_sum"], r["pix_checksum"], r["max_pix"])
           for r in pyr.collect()}
    want = {}
    for z in range(4):
        direct = raster_grid_stats(
            rasterize_point_tiles(_pts(spark, pts), zoom=z, grid=8), grid=8)
        for r in direct.collect():
            want[(z, r["tx"], r["ty"])] = (
                r["n_points"], r["raster_sum"], r["pix_checksum"], r["max_pix"])
    assert got == want
    assert sum(v[0] for k, v in got.items() if k[0] == 0) == 400


def test_raster_merge_equals_rebuild(spark):
    # standing store from A, merge delta B -> must equal rasterize(A+B)
    # byte-for-byte, including a pixel that saturates across the merge
    from sparktiles.operators.raster import raster_merge

    g = 4
    rng = np.random.default_rng(3)
    a = [(float(x), float(y))
         for x, y in zip(rng.uniform(-1.9e7, 1.9e7, 300),
                         rng.uniform(-1.9e7, 1.9e7, 300))]
    hot = _merc_of_pixel(1, 0, 0, 2, 2, g)
    a += [hot] * 200                       # 200 in one pixel (pre-clip)
    b = [(float(x), float(y))
         for x, y in zip(rng.uniform(-1.9e7, 1.9e7, 150),
                         rng.uniform(-1.9e7, 1.9e7, 150))]
    b += [hot] * 100                       # +100 -> saturates at 255

    standing = rasterize_point_tiles(_pts(spark, a), zoom=1, grid=g)
    merged = raster_merge(standing, _pts(spark, b), zoom=1, grid=g)
    rebuilt = rasterize_point_tiles(_pts(spark, a + b), zoom=1, grid=g)

    def snap(df):
        return {(r["z"], r["tx"], r["ty"]):
                (bytes(r["raster"]), r["n_points"], r["nonzero_pixels"],
                 r["max_pix"])
                for r in df.collect()}

    assert snap(merged) == snap(rebuilt)
    got = snap(merged)[(1, 0, 0)]
    assert got[3] == 255 and got[1] >= 300   # clipped payload, exact count
