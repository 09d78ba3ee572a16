"""Goldens for tile math (reference tests/expected/{ZRes,Z}.sql.out,
TileBBox.sql semantics, utils.py deg2num)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparktiles.functions import tilemath as TM


def test_zres_goldens():
    assert round(TM.zres(0), 4) == 156543.0339
    assert round(TM.zres(19), 4) == 0.2986
    assert round(TM.zres(0.5), 4) == 110692.6408
    assert TM.zres(None) is None


def test_z_goldens():
    assert TM.zoom_from_scale(None) is None
    assert TM.zoom_from_scale(1e9) is None
    assert TM.zoom_from_scale(0) is None
    assert TM.zoom_from_scale(500_000_000) == 0
    assert TM.zoom_from_scale(1000) == 19


def test_tile_bbox():
    xmin, ymin, xmax, ymax = TM.tile_bbox(0, 0, 0)
    assert (xmin, ymin, xmax, ymax) == (
        -TM.TILEBBOX_MAX, -TM.TILEBBOX_MAX, TM.TILEBBOX_MAX, TM.TILEBBOX_MAX
    )
    # z1: four quadrants; (1,0,0) is the NW quadrant
    xmin, ymin, xmax, ymax = TM.tile_bbox(1, 0, 0)
    assert (xmin, ymin) == (-TM.TILEBBOX_MAX, 0.0)
    assert (xmax, ymax) == (0.0, TM.TILEBBOX_MAX)


def test_deg2num():
    # z0 everything is tile (0,0)
    assert TM.deg2num(0.0, 0.0, 0) == (0, 0)
    # classic example: Prague ~ (50.08, 14.42) at z14
    x, y = TM.deg2num(50.08, 14.42, 14)
    assert (x, y) == (8848, 5550)


def test_mercator_roundtrip_and_tiles():
    x, y = TM.lonlat_to_mercator(14.42, 50.08)
    assert x == pytest.approx(1605227.04, abs=1.0)
    # mercator->tile equals deg2num
    import math
    n = 2**14
    xt = int((x + TM.HALF_WORLD) / TM.WORLD_MERC_WIDTH * n)
    yt = int((TM.HALF_WORLD - y) / TM.WORLD_MERC_WIDTH * n)
    assert (xt, yt) == (8848, 5550)


def test_cell_id_roundtrip():
    cid = TM.cell_id(14, 8848, 5588)
    assert cid == (14 << 58) | (8848 << 29) | 5588


def test_column_exprs_match_python(spark):
    rows = [Row(z=z, sd=sd, lon=lon, lat=lat)
            for z, sd, lon, lat in [
                (0, 500_000_000.0, 0.0, 0.0),
                (14, 1000.0, 14.42, 50.08),
                (19, 1e9, -122.419, 37.775),
                (7, 0.0, 151.21, -33.87),
            ]]
    df = spark.createDataFrame(rows)
    xt, yt = TM.lonlat_to_tile_exprs(F.col("lon"), F.col("lat"), F.col("z"))
    out = df.select(
        "z", "lon", "lat",
        TM.zres_expr(F.col("z")).alias("zres"),
        TM.zoom_from_scale_expr(F.col("sd")).alias("zz"),
        xt.alias("xt"), yt.alias("yt"),
        TM.mercator_x_expr(F.col("lon")).alias("mx"),
        TM.mercator_y_expr(F.col("lat")).alias("my"),
        TM.cell_id_expr(F.col("z"), xt, yt).alias("cell"),
    ).collect()
    for r in out:
        assert r.zres == pytest.approx(TM.zres(r.z), rel=1e-12)
        exp_tile = TM.deg2num(r.lat, r.lon, r.z)
        assert (r.xt, r.yt) == exp_tile
        mx, my = TM.lonlat_to_mercator(r.lon, r.lat)
        assert r.mx == pytest.approx(mx, rel=1e-12)
        assert r.my == pytest.approx(my, rel=1e-12)
        assert r.cell == TM.cell_id(r.z, r.xt, r.yt)
    zz = {r.z: r.zz for r in out}
    assert zz[0] == 0 and zz[14] == 19 and zz[19] is None and zz[7] is None


def test_buffered_bbox_matches_reference_formula(spark):
    # reference sqltomvt.py:226-242: expand by world*buffer/256/2^z
    df = spark.range(1).select(F.lit(14).alias("z"), F.lit(8848).alias("x"), F.lit(5588).alias("y"))
    b = TM.buffered_tile_bbox_exprs(F.col("z"), F.col("x"), F.col("y"), buffer_px=64)
    r = df.select(b[0].alias("xmin"), b[1].alias("ymin"), b[2].alias("xmax"), b[3].alias("ymax")).first()
    raw = TM.tile_bbox(14, 8848, 5588)
    m = TM.WORLD_MERC_WIDTH * 64 / 256 / 2**14
    assert r.xmin == pytest.approx(raw[0] - m, rel=1e-12)
    assert r.ymax == pytest.approx(raw[3] + m, rel=1e-12)


def test_quadkey_prefix_alignment(spark):
    # a parent tile's quadkey (shifted) must prefix its 4 children
    df = spark.createDataFrame(
        [(5, 10, 20), (6, 20, 40), (6, 21, 40), (6, 20, 41), (6, 21, 41)],
        "z int, x int, y int",
    )
    r = df.select("z", TM.quadkey_expr(F.col("z"), F.col("x"), F.col("y")).alias("qk")).collect()
    parent = [x.qk for x in r if x.z == 5][0]
    kids = [x.qk for x in r if x.z == 6]
    assert (parent & 31) == 5
    # layout: [morton left-aligned to z15][z:5 bits]; parent morton must
    # prefix every child's morton after alignment
    p_aligned = parent >> 5
    for k in kids:
        assert (k & 31) == 6
        assert (k >> 5) >> (2 * (15 - 5)) == p_aligned >> (2 * (15 - 5))
    # children of one parent are contiguous under the quadkey sort
    assert max(kids) - min(kids) < (1 << 5) * (1 << (2 * (15 - 6) + 2))


def test_coarse_cell_two_level_addressing(spark):
    # a z9 tile's coarse cell == its z5 ancestor's own cell id; tiles
    # above the coarse zoom are their own coarse address
    df = spark.createDataFrame(
        [(9, 300, 200), (5, 300 >> 4, 200 >> 4), (3, 5, 2)],
        "z int, x long, y long",
    )
    r = df.select(
        "z",
        TM.coarse_cell_expr(F.col("z"), F.col("x"), F.col("y")).alias("cc"),
        TM.cell_id_expr(F.col("z"), F.col("x"), F.col("y")).alias("own"),
    ).collect()
    by_z = {row.z: row for row in r}
    assert by_z[9].cc == by_z[5].own == TM.cell_id(5, 300 >> 4, 200 >> 4)
    assert by_z[3].cc == by_z[3].own
