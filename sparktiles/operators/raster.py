"""Raster ↔ vector tile assignment.

The reference pipeline is vector-only (PostGIS → MVT blobs); the
north-star engine additionally names raster↔vector tile assignment.
This module provides both directions over the same z/x/y web-mercator
pyramid the MVT spine uses (functions/tilemath.py):

vector → raster
    `rasterize_point_tiles`: bin point features into a per-tile
    ``grid×grid`` count raster, packed as an SPTX payload (the repo's
    real toy raster format, operators/multimodal.py) — density /
    heatmap tiles.
raster → vector
    `raster_grid_stats`: decode SPTX tiles back to per-tile pixel
    statistics (the decode proof for the binary path).
    `raster_runs_to_features`: run-length polygonize — maximal
    horizontal runs of above-threshold pixels become rectangle
    features with mercator bounds (the classic contour/footprint
    extraction step, vectorized per tile).

Scale shape (100 TB): the only wide exchange is a
``groupBy(tile, pixel).count()`` — map-side combinable, cardinality
bounded by nonzero pixels (≤ 4^z·grid², but in practice the occupied
set), never by input rows. Tile assembly then groups ≤ grid² pixel
rows per tile; rasters travel as one binary per tile from there on,
and the raster→vector direction is embarrassingly parallel
(mapInPandas over tile rows, no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktiles.functions.tilemath import HALF_WORLD, WORLD_MERC_WIDTH
from sparktiles.operators.multimodal import decode_sptx, encode_sptx

RASTER_SCHEMA = ("z int, tx bigint, ty bigint, raster binary, "
                 "n_points bigint, nonzero_pixels bigint, max_pix int")


def pixel_coords(x_col, y_col, zoom: int, grid: int):
    """Global pixel index (gx, gy) of a mercator point on the
    ``2^zoom * grid`` world raster; tile = gx // grid, in-tile pixel =
    gx % grid. Same floor convention as tilemath.tile_xy_expr so a
    point's raster tile always equals its vector tile."""
    n = float((1 << zoom) * grid)
    gx = F.floor((x_col + F.lit(HALF_WORLD)) / F.lit(WORLD_MERC_WIDTH) * F.lit(n))
    gy = F.floor((F.lit(HALF_WORLD) - y_col) / F.lit(WORLD_MERC_WIDTH) * F.lit(n))
    hi = F.lit(int(n) - 1)
    return (F.greatest(F.lit(0), F.least(gx, hi)),
            F.greatest(F.lit(0), F.least(gy, hi)))


def rasterize_point_tiles(df: DataFrame, zoom: int, grid: int = 16,
                          x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Vector → raster: count features per (tile, pixel) and pack each
    tile's ``grid×grid`` count grid as an SPTX payload (uint8, counts
    clipped at 255). Returns one row per nonempty tile with the raster
    plus summary columns (n_points is the pre-clip feature count).
    """
    # NOTE: deliberately NOT spread() — the per-row work is floor
    # arithmetic and the (tile, pixel) groupBy already parallelizes;
    # the r06 A/B measured the extra round-robin exchange of the raw
    # point stream as a net loss at both sf0.1 and sf1.0.
    gx, gy = pixel_coords(F.col(x_col), F.col(y_col), zoom, grid)
    g = F.lit(grid)
    pix = (
        df.select((gx / g).cast("bigint").alias("tx"),
                  (gy / g).cast("bigint").alias("ty"),
                  (gx % g).cast("int").alias("px"),
                  (gy % g).cast("int").alias("py"))
        .groupBy("tx", "ty", "px", "py")
        .agg(F.count("*").alias("cnt"))
    )
    return _pack_pixel_counts(pix, zoom, grid)


def rasterize_cover_tiles(cover: DataFrame, pixel_zoom: int,
                          grid: int = 16) -> DataFrame:
    """Vector → raster for LINES/POLYGONS: rasterization at grid g is
    exactly a supercover tile assignment at pixel zoom z + log2(g) —
    the same O(path) column-strip kernel the MVT spine uses
    (functions/tilecover.py), no new geometry code. Input: assignment
    rows (z, x, y) where z == pixel_zoom (e.g. from
    assign_supercover_tiles_multi(lines, pixel_zoom, pixel_zoom));
    output: one row per nonempty tile at zoom pixel_zoom - log2(g),
    the coverage-count raster (how many features touch each pixel)
    as an SPTX payload."""
    lg = grid.bit_length() - 1
    if (1 << lg) != grid:
        raise ValueError("grid must be a power of two")
    pix = (
        cover.where(F.col("z") == pixel_zoom)
        .select(F.shiftright("x", lg).alias("tx"),
                F.shiftright("y", lg).alias("ty"),
                F.col("x").bitwiseAND(F.lit(grid - 1)).cast("int").alias("px"),
                F.col("y").bitwiseAND(F.lit(grid - 1)).cast("int").alias("py"))
        .groupBy("tx", "ty", "px", "py")
        .agg(F.count("*").alias("cnt"))
    )
    return _pack_pixel_counts(pix, pixel_zoom - lg, grid)


def _pack_block(pdf: pd.DataFrame, zoom: int, grid: int) -> pd.DataFrame:
    """Pack a block of tile-sorted pixel rows (complete tiles only)
    into one SPTX raster row per tile, all tiles in one numpy pass."""
    tx = pdf["tx"].to_numpy()
    ty = pdf["ty"].to_numpy()
    change = np.empty(len(tx), dtype=bool)
    change[0] = True
    np.logical_or(tx[1:] != tx[:-1], ty[1:] != ty[:-1], out=change[1:])
    gi = np.cumsum(change) - 1
    ntiles = int(gi[-1]) + 1
    flat = (gi * (grid * grid)
            + pdf["py"].to_numpy().astype(np.int64) * grid
            + pdf["px"].to_numpy().astype(np.int64))
    arr = np.zeros(ntiles * grid * grid, dtype=np.int64)
    arr[flat] = pdf["cnt"].to_numpy()
    arr = arr.reshape(ntiles, grid, grid)
    clipped = np.minimum(arr, 255).astype(np.uint8)
    starts = np.flatnonzero(change)
    return pd.DataFrame({
        "z": np.full(ntiles, zoom, dtype=np.int32),
        "tx": tx[starts], "ty": ty[starts],
        "raster": [bytearray(encode_sptx(c)) for c in clipped],
        "n_points": arr.sum(axis=(1, 2)),
        "nonzero_pixels": (arr > 0).sum(axis=(1, 2)).astype(np.int64),
        "max_pix": clipped.max(axis=(1, 2)).astype(np.int32),
    })


def _pack_pixel_counts(pix: DataFrame, zoom: int, grid: int) -> DataFrame:
    """(tx, ty, px, py, cnt) pixel rows → one SPTX raster row per tile.

    NOT a groupBy().applyInPandas: at deep zooms there are millions of
    tiles with a handful of pixels each, and per-group pandas overhead
    dominates (the same pathology the MVT encode stage solved with
    batched boundary splitting, operators/mvt.py). Instead: one hash
    repartition on the tile key + an in-partition sort, then a single
    mapInPandas that packs EVERY tile in an Arrow batch in one numpy
    pass — a carry buffer stitches tiles split across batch
    boundaries (≤ grid² rows held back per batch)."""
    part = pix.repartition("tx", "ty").sortWithinPartitions("tx", "ty")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            tx = pdf["tx"].to_numpy()
            ty = pdf["ty"].to_numpy()
            boundary = np.flatnonzero((tx[1:] != tx[:-1])
                                      | (ty[1:] != ty[:-1]))
            if not len(boundary):
                carry = pdf          # one (possibly split) tile so far
                continue
            cut = int(boundary[-1]) + 1
            carry = pdf.iloc[cut:]
            yield _pack_block(pdf.iloc[:cut], zoom, grid)
        if carry is not None and len(carry):
            yield _pack_block(carry, zoom, grid)

    return part.mapInPandas(run, RASTER_SCHEMA)


def raster_grid_stats(rasters: DataFrame, grid: int) -> DataFrame:
    """Raster → stats via a REAL decode of the SPTX payload: per tile,
    the clipped pixel sum, nonzero count, max, and a placement
    checksum ``sum(pix * (py*grid + px + 1))`` that any engine can
    re-derive from the raw points — the byte-path proof. The producer's
    pre-clip n_points column passes through, so no second rasterize
    pipeline (a join back to the producer would recompute it)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.arange(1, grid * grid + 1, dtype=np.int64).reshape(grid, grid)
        for pdf in batches:
            rows = []
            for z, tx, ty, payload, npts in zip(pdf["z"], pdf["tx"],
                                                pdf["ty"], pdf["raster"],
                                                pdf["n_points"]):
                a = decode_sptx(bytes(payload))[:, :, 0].astype(np.int64)
                rows.append((int(z), int(tx), int(ty), int(npts),
                             int(a.sum()), int((a > 0).sum()), int(a.max()),
                             int((a * weights).sum())))
            yield pd.DataFrame(rows, columns=[
                "z", "tx", "ty", "n_points", "raster_sum",
                "nonzero_pixels", "max_pix", "pix_checksum"])

    return rasters.mapInPandas(
        run, "z int, tx bigint, ty bigint, n_points bigint, "
             "raster_sum bigint, nonzero_pixels bigint, max_pix int, "
             "pix_checksum bigint")


def raster_runs_to_features(rasters: DataFrame,
                            threshold: int = 1) -> DataFrame:
    """Raster → vector: run-length polygonize. Each maximal horizontal
    run of pixels ≥ threshold becomes one rectangle feature with
    pixel-space extent (py, px0..px1) and mercator bounds. Vectorized
    per tile: run starts/ends come from a diff over the boolean mask —
    no per-pixel Python. No shuffle: tiles are independent."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for z, tx, ty, payload in zip(pdf["z"], pdf["tx"], pdf["ty"],
                                          pdf["raster"]):
                a = decode_sptx(bytes(payload))[:, :, 0].astype(np.int64)
                mask = a >= threshold
                # pad each row with False on both sides; +1/-1 diffs
                # mark run starts/ends across the whole tile at once
                pad = np.zeros((mask.shape[0], 1), dtype=np.int8)
                d = np.diff(np.hstack([pad, mask.astype(np.int8), pad]), axis=1)
                sy, sx = np.nonzero(d == 1)
                ey, ex = np.nonzero(d == -1)
                tile_w = WORLD_MERC_WIDTH / (1 << int(z))
                x0m = -HALF_WORLD + int(tx) * tile_w
                y0m = HALF_WORLD - int(ty) * tile_w
                pw = tile_w / a.shape[1]
                csum = np.cumsum(np.hstack([np.zeros((a.shape[0], 1),
                                                     dtype=np.int64),
                                            a * mask]), axis=1)
                for py, px0, px1 in zip(sy, sx, ex):
                    rows.append((
                        int(z), int(tx), int(ty), int(py),
                        int(px0), int(px1 - 1), int(px1 - px0),
                        int(csum[py, px1] - csum[py, px0]),
                        x0m + px0 * pw, y0m - (py + 1) * pw,
                        x0m + px1 * pw, y0m - py * pw,
                    ))
            yield pd.DataFrame(rows, columns=[
                "z", "tx", "ty", "py", "px0", "px1", "run_len", "run_sum",
                "xmin", "ymin", "xmax", "ymax"])

    return rasters.mapInPandas(
        run, "z int, tx bigint, ty bigint, py int, px0 int, px1 int, "
             "run_len int, run_sum bigint, xmin double, ymin double, "
             "xmax double, ymax double")


def raster_pyramid(df: DataFrame, minzoom: int, maxzoom: int,
                   grid: int = 16, x_col: str = "x",
                   y_col: str = "y") -> DataFrame:
    """Multi-zoom raster pyramid from ONE pass over the input points —
    the raster twin of the tile pyramid's impute optimization: points
    are binned once at the FINEST zoom's global pixel grid; every
    coarser zoom's pixel counts derive from that (small, aggregated)
    pixel table by right-shifting the global pixel index log2(4)
    bits per zoom step and re-summing. The input is scanned once; the
    per-zoom aggregations run over occupied-pixel rows (bounded by the
    finest grid's occupancy), never over input rows. Returns the same
    schema as rasterize_point_tiles with a z column spanning
    [minzoom, maxzoom]."""
    gx, gy = pixel_coords(F.col(x_col), F.col(y_col), maxzoom, grid)
    base = (
        df.select(gx.alias("gx"), gy.alias("gy"))
        .groupBy("gx", "gy")
        .agg(F.count("*").alias("cnt"))
    )
    g = F.lit(grid)
    out = None
    for z in range(maxzoom, minzoom - 1, -1):
        sh = maxzoom - z
        if sh == 0:
            zagg = base.select(F.col("gx").alias("zgx"),
                               F.col("gy").alias("zgy"), "cnt")
        else:
            zagg = (
                base.select(F.shiftright("gx", sh).alias("zgx"),
                            F.shiftright("gy", sh).alias("zgy"), "cnt")
                .groupBy("zgx", "zgy")
                .agg(F.sum("cnt").alias("cnt"))
            )
        # (tx, ty, px, py) is a bijection of (zgx, zgy) — no re-agg
        zpix = zagg.select(
            (F.col("zgx") / g).cast("bigint").alias("tx"),
            (F.col("zgy") / g).cast("bigint").alias("ty"),
            (F.col("zgx") % g).cast("int").alias("px"),
            (F.col("zgy") % g).cast("int").alias("py"),
            "cnt")
        part = _pack_pixel_counts(zpix, z, grid)
        out = part if out is None else out.unionByName(part)
    return out


def raster_merge(rasters: DataFrame, delta: DataFrame, zoom: int,
                 grid: int = 16, x_col: str = "x",
                 y_col: str = "y") -> DataFrame:
    """Incremental raster maintenance: merge NEW points into standing
    density tiles without rebuilding the pyramid base — the raster
    analog of the incremental tile path (streaming/incremental.py).
    Touched tiles are decoded, delta counts added, re-encoded;
    untouched tiles pass through byte-identical. Saturation commutes
    with addition (min(255, a+d) == min(255, min(255,a)+d) for a,d ≥
    0), so the merged store equals a full rebuild EXACTLY — asserted
    in tests.

    Scale shape: the delta aggregates to (tile, pixel) counts map-side
    and then to one bounded array per touched tile (≤ grid² structs);
    a crawl-day delta is small next to the standing store, so Catalyst
    broadcasts it and the standing rasters never shuffle."""
    gx, gy = pixel_coords(F.col(x_col), F.col(y_col), zoom, grid)
    g = F.lit(grid)
    dpix = (
        delta.select((gx / g).cast("bigint").alias("tx"),
                     (gy / g).cast("bigint").alias("ty"),
                     (gx % g).cast("int").alias("px"),
                     (gy % g).cast("int").alias("py"))
        .groupBy("tx", "ty", "px", "py")
        .agg(F.count("*").alias("cnt"))
        .groupBy("tx", "ty")
        .agg(F.collect_list(F.struct("px", "py", "cnt")).alias("_dp"),
             F.sum("cnt").alias("_dn"))
    )
    joined = rasters.join(dpix, ["tx", "ty"], "full_outer")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tx, ty, payload, npts, dp, dn in zip(
                    pdf["tx"], pdf["ty"], pdf["raster"], pdf["n_points"],
                    pdf["_dp"], pdf["_dn"]):
                has_delta = dp is not None and not (
                    isinstance(dp, float) and pd.isna(dp))
                if payload is None or (isinstance(payload, float)
                                       and pd.isna(payload)):
                    arr = np.zeros((grid, grid), dtype=np.int64)
                    npts = 0
                else:
                    arr = decode_sptx(bytes(payload))[:, :, 0].astype(np.int64)
                    npts = int(npts)
                    if not has_delta:      # untouched: pass through
                        rows.append((int(zoom), int(tx), int(ty),
                                     bytearray(bytes(payload)), npts,
                                     int((arr > 0).sum()), int(arr.max())))
                        continue
                for e in dp:
                    arr[e["py"], e["px"]] += e["cnt"]
                clipped = np.minimum(arr, 255).astype(np.uint8)
                rows.append((int(zoom), int(tx), int(ty),
                             bytearray(encode_sptx(clipped)),
                             npts + int(dn), int((arr > 0).sum()),
                             int(clipped.max())))
            yield pd.DataFrame(rows, columns=[
                "z", "tx", "ty", "raster", "n_points",
                "nonzero_pixels", "max_pix"])

    return joined.mapInPandas(run, RASTER_SCHEMA)
