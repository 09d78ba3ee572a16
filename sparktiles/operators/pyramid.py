"""Tile-pyramid operators: enumeration, tile assignment, impute.

Reference counterparts:
- pyramid enumeration (T1)  -> bin/generate-tiles:94-98 + utils.py:103-113
- impute (T3)               -> mbtile_tools.py:106-196 (children math
                               at 179-190; dup threshold 20 / 50 for
                               z>12 at mbtile_tools.py:36-38)
- MID_ZOOM driver loop (T4) -> bin/generate-tiles:100-117
- tile_multiplier (T5)      -> bin/tile_multiplier:24-54

Scale design notes (100 TB / 1000 executors):
- Point->tile assignment is MAP-SIDE column math (no join): a feature
  row knows its tile(s) from its mercator coords; the only shuffle is
  the per-tile groupBy that builds the MVT — keyed by (z,x,y), which
  quadkey-partitions evenly except hot cells (salting handled by AQE
  skew split since the aggregation is applyInPandas over a shuffle).
- The buffer ring duplicates a feature into at most 4 tiles (corner
  case) via a static array + explode — constant fan-out, no UDF.
- Empty tiles are never enumerated above MID_ZOOM: impute walks the
  pyramid top-down and only *generates* children of non-dup parents,
  exactly the reference's dominant z12-14 optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparktiles.functions.tilemath import (
    HALF_WORLD,
    WORLD_MERC_WIDTH,
    lonlat_to_tile_exprs,
)

EMPTY_TILE_DUP_THRESHOLD = 20       # mbtile_tools.py:36-38
EMPTY_TILE_DUP_THRESHOLD_HIGH = 50  # for z > 12


def tile_pyramid(
    spark: SparkSession,
    minzoom: int,
    maxzoom: int,
    bounds_lonlat: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """All (z, x, y) for z in [minzoom, maxzoom], optionally restricted
    to a lon/lat bbox (reference utils.py:103-113 clamped tile ranges).
    Pure generator: sequence + explode, no driver-side loops."""
    zs = spark.range(minzoom, maxzoom + 1).select(F.col("id").cast("int").alias("z"))
    n = F.pow(F.lit(2.0), F.col("z").cast("double"))
    if bounds_lonlat is None:
        x0, y0 = F.lit(0).cast("long"), F.lit(0).cast("long")
        x1 = (n - 1).cast("long")
        y1 = (n - 1).cast("long")
    else:
        lon0, lat0, lon1, lat1 = bounds_lonlat
        x0, y1 = lonlat_to_tile_exprs(F.lit(lon0), F.lit(lat0), F.col("z"))
        x1, y0 = lonlat_to_tile_exprs(F.lit(lon1), F.lit(lat1), F.col("z"))
    strips = zs.select(
        "z", F.explode(F.sequence(x0, x1)).alias("x"),
        y0.alias("y0"), y1.alias("y1"))
    # spread the x-strips before the y-explode: without this every
    # zoom's ENTIRE universe streams out of the single task holding its
    # z-row (one thread emitting 268M rows at z14); the strip shuffle
    # is tiny (sum 2^z rows) and the y-explode then runs on every core
    return (
        strips.repartition(F.col("z"), F.col("x"))
        .select("z", "x", F.explode(F.sequence("y0", "y1")).alias("y"))
    )


def assign_point_tiles(
    features: DataFrame,
    zoom,
    buffer_px: float = 0.0,
    x_col: str = "px",
    y_col: str = "py",
) -> DataFrame:
    """Map each point feature to its containing tile at `zoom`, plus
    neighbor tiles whose buffered envelope contains it (the set-oriented
    re-formulation of the reference's per-tile `geometry && bbox` GiST
    scan, sqltomvt.py:197-198 / SURVEY.md J1).

    A feature within buffer_px/256 of a tile edge also belongs to the
    adjacent tile(s) — up to 4 tiles at a corner. Emits columns z, x
    (tile), y (tile) while preserving feature columns; the mercator
    coords stay available as px/py.
    """
    z = F.lit(zoom) if not isinstance(zoom, F.Column) else zoom
    n = F.pow(F.lit(2.0), z.cast("double"))
    fx = (F.col(x_col) + F.lit(HALF_WORLD)) / F.lit(WORLD_MERC_WIDTH) * n
    fy = (F.lit(HALF_WORLD) - F.col(y_col)) / F.lit(WORLD_MERC_WIDTH) * n
    bf = F.lit(float(buffer_px) / 256.0)
    top = (n - 1).cast("long")

    df = features.withColumn("_fx", fx).withColumn("_fy", fy)
    tx = F.floor("_fx").cast("long")
    ty = F.floor("_fy").cast("long")
    # candidate offsets: own tile always; +-1 when within buffer of edge
    west = (F.col("_fx") - tx < bf) & (tx > 0)
    east = (tx + 1 - F.col("_fx") < bf) & (tx < top)
    north = (F.col("_fy") - ty < bf) & (ty > 0)
    south = (ty + 1 - F.col("_fy") < bf) & (ty < top)

    def cand(cond, dx, dy):
        s = F.struct((tx + dx).alias("cx"), (ty + dy).alias("cy"))
        return F.when(cond, s) if cond is not None else s

    cands = F.array_compact(
        F.array(
            cand(None, 0, 0),
            cand(west, -1, 0),
            cand(east, 1, 0),
            cand(north, 0, -1),
            cand(south, 0, 1),
            cand(west & north, -1, -1),
            cand(east & north, 1, -1),
            cand(west & south, -1, 1),
            cand(east & south, 1, 1),
        )
    )
    out = (
        df.withColumn("_c", F.explode(cands))
        .withColumn("z", z.cast("int"))
        .withColumn("x", F.col("_c.cx"))
        .withColumn("y", F.col("_c.cy"))
        .drop("_fx", "_fy", "_c")
    )
    return out


def assign_point_tiles_multi(
    features: DataFrame, minzoom: int, maxzoom: int, buffer_px: float = 0.0,
    x_col: str = "px", y_col: str = "py",
) -> DataFrame:
    """All zooms in one plan: explode z in [minzoom, maxzoom] then
    assign. One wide map stage; the whole pyramid becomes a single
    shuffle keyed (z,x,y)."""
    zdf = features.withColumn(
        "zz", F.explode(F.sequence(F.lit(minzoom), F.lit(maxzoom)))
    )
    return assign_point_tiles(zdf, F.col("zz"), buffer_px, x_col, y_col).drop("zz")


def assign_bbox_tiles(
    df: DataFrame, zoom, xmin="xmin", ymin="ymin", xmax="xmax", ymax="ymax",
    buffer_px: float = 0.0,
) -> DataFrame:
    """Explode a mercator-bbox row (e.g. polygon envelope) to all tiles
    whose buffered envelope it overlaps at `zoom` (candidate generation
    for the polygon path of J1/J2). Fan-out bounded by geometry size;
    the exact clip happens later in the MVT kernel. The tile buffer
    follows the reference formula world*buffer/256/2^z
    (sqltomvt.py:226-242)."""
    z = F.lit(zoom) if not isinstance(zoom, F.Column) else zoom
    n = F.pow(F.lit(2.0), z.cast("double"))
    margin = F.lit(WORLD_MERC_WIDTH * float(buffer_px) / 256.0) / n
    top = (n - 1).cast("long")

    def tx_of(c, sign):
        v = (F.col(c) if isinstance(c, str) else c) + sign * margin
        t = F.floor((v + F.lit(HALF_WORLD)) / F.lit(WORLD_MERC_WIDTH) * n).cast("long")
        return F.greatest(F.lit(0).cast("long"), F.least(t, top))

    def ty_of(c, sign):
        v = (F.col(c) if isinstance(c, str) else c) + sign * margin
        t = F.floor((F.lit(HALF_WORLD) - v) / F.lit(WORLD_MERC_WIDTH) * n).cast("long")
        return F.greatest(F.lit(0).cast("long"), F.least(t, top))

    x0, x1 = tx_of(xmin, -1), tx_of(xmax, 1)
    y0, y1 = ty_of(ymax, 1), ty_of(ymin, -1)  # y inverts
    return (
        df.withColumn("z", z.cast("int"))
        .withColumn("x", F.explode(F.sequence(x0, x1)))
        .withColumn("y", F.explode(F.sequence(y0, y1)))
    )


def assign_bbox_tiles_multi(
    df: DataFrame, minzoom: int, maxzoom: int, buffer_px: float = 0.0, **kw
) -> DataFrame:
    """assign_bbox_tiles across a zoom range in one plan (polygon/line
    analog of assign_point_tiles_multi)."""
    zdf = df.withColumn("zz", F.explode(F.sequence(F.lit(minzoom), F.lit(maxzoom))))
    return assign_bbox_tiles(zdf, F.col("zz"), buffer_px=buffer_px, **kw).drop("zz")


def assign_supercover_tiles_multi(
    df: DataFrame, minzoom: int, maxzoom: int, buffer_px: float = 0.0,
    geom_col: str = "geom",
) -> DataFrame:
    """Supercover tile assignment for WKB features across a zoom range —
    the O(path-length) replacement for `assign_bbox_tiles_multi`'s
    O(bbox-area) explode (the reference's per-tile `geometry &&
    ST_Expand(envelope, buffer)` GiST predicate, sqltomvt.py:197-242,
    re-formulated set-oriented).

    One mapInPandas stage: each Arrow batch decodes its WKB ONCE
    (`vecmvt.decode_wkb_batch`), then per zoom rasterizes segments to
    the tile cells they actually pass through (+ buffer margin;
    polygons keep interior cells via per-column fill) and fans out as
    numpy index views over the batch — no per-candidate WKB decode, no
    doomed-row explosion. Candidates are a strict superset of the
    exact-clip survivor set (property-tested) and typically within ~2x
    of it, vs the measured 23x of the bbox explode on line layers
    (docs/SCALE.md "KNOWN NEXT", round 3).

    Output: input columns + z int, x long, y long — drop-in for
    assign_bbox_tiles_multi. Rows with NULL/unsupported geometry emit
    nothing (their clip would drop them anyway).
    """
    import pandas as pd

    from sparktiles.functions.tilecover import cover_cells_zoom
    from sparktiles.functions.vecmvt import decode_wkb_batch

    bf = float(buffer_px) / 256.0
    in_cols = [f.name for f in df.schema]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
        + ["z int", "x long", "y long"]
    )

    def run(batches):
        import numpy as np  # noqa: F811 (worker-side)

        for pdf in batches:
            if not len(pdf):
                continue
            pt, ln, pg = decode_wkb_batch(pdf[geom_col].to_numpy())
            rows_all, z_all, x_all, y_all = [], [], [], []
            for z in range(minzoom, maxzoom + 1):
                r, cx, cy = cover_cells_zoom(pt, ln, pg, z, bf)
                if len(r):
                    rows_all.append(r)
                    z_all.append(np.full(len(r), z, dtype=np.int32))
                    x_all.append(cx)
                    y_all.append(cy)
            if not rows_all:
                continue
            idx = np.concatenate(rows_all)
            out = {c: pdf[c].to_numpy()[idx] for c in in_cols}
            out["z"] = np.concatenate(z_all)
            out["x"] = np.concatenate(x_all)
            out["y"] = np.concatenate(y_all)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, out_schema)


def with_tile_rank(assigned: DataFrame, order_by, rank_col: str = "rank") -> DataFrame:
    """Per-tile importance rank starting at 1 (W2 — the mountain_peak
    layer's `rank` field, tests/testlayers/mountain_peak/
    mountain_peak.yaml:24): rank within (z,x,y) by the given ordering."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("z", "x", "y").orderBy(*order_by)
    return assigned.withColumn(rank_col, F.rank().over(w))


# ----------------------------------------------------------------- impute

def dup_tile_ids(tile_map: DataFrame, zoom: int | None = None) -> DataFrame:
    """Duplicate-tile finder (A6, reference mbtile_tools.py:49-103):
    tile_ids appearing >= threshold times — 'empty-ish' content
    (oceans, deserts). Threshold 20, or 50 above z12."""
    th = EMPTY_TILE_DUP_THRESHOLD_HIGH if (zoom or 0) > 12 else EMPTY_TILE_DUP_THRESHOLD
    df = tile_map
    if zoom is not None:
        df = df.where(F.col("zoom_level") == zoom)
    return (
        df.groupBy("tile_id").count().where(F.col("count") >= F.lit(th)).select("tile_id")
    )


def impute_children(parents: DataFrame, dup_keys: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Reference impute (T3, mbtile_tools.py:106-196): for each parent
    tile at z-1, emit its 4 children at z. Children of parents whose
    tile_id is in dup_keys inherit the tile_id as-is (imputed rows for
    tile_map); the rest become the to-generate list for zoom z.

    parents: zoom_level, tile_column, tile_row, tile_id.
    Returns (imputed_map_rows, generate_list) — generate_list columns
    (z, x, y).
    """
    kids = parents.join(F.broadcast(dup_keys.withColumn("_dup", F.lit(True))),
                        "tile_id", "left")
    children = kids.select(
        (F.col("zoom_level") + 1).alias("zoom_level"),
        F.explode(
            F.array(
                F.struct((F.col("tile_column") * 2).alias("cx"), (F.col("tile_row") * 2).alias("cy")),
                F.struct((F.col("tile_column") * 2 + 1).alias("cx"), (F.col("tile_row") * 2).alias("cy")),
                F.struct((F.col("tile_column") * 2).alias("cx"), (F.col("tile_row") * 2 + 1).alias("cy")),
                F.struct((F.col("tile_column") * 2 + 1).alias("cx"), (F.col("tile_row") * 2 + 1).alias("cy")),
            )
        ).alias("c"),
        "tile_id",
        "_dup",
    ).select(
        "zoom_level",
        F.col("c.cx").alias("tile_column"),
        F.col("c.cy").alias("tile_row"),
        "tile_id",
        "_dup",
    )
    imputed = children.where(F.col("_dup")).drop("_dup")
    generate = children.where(F.col("_dup").isNull()).select(
        F.col("zoom_level").cast("int").alias("z"),
        F.col("tile_column").alias("x"),
        F.col("tile_row").alias("y"),
    )
    return imputed, generate


def tile_multiplier(changed: DataFrame, minzoom: int, maxzoom: int) -> DataFrame:
    """Expand changed tiles (z,x,y at some zoom) to every overlapping
    tile for z in [minzoom, maxzoom] (T5, reference bin/tile_multiplier:
    24-54): parents via x >> k, children via the 2^k x 2^k grid.
    Distinct'd — drives incremental re-tiling."""
    src = changed.select("z", "x", "y")
    levels = src.withColumn("tz", F.explode(F.sequence(F.lit(minzoom), F.lit(maxzoom))))
    dz = F.col("tz") - F.col("z")
    # parents (dz < 0): floor-divide by 2^{-dz}; children (dz>0): range
    parents = levels.where(dz <= 0).select(
        F.col("tz").alias("z"),
        F.call_function("shiftright", F.col("x"), (-dz).cast("int")).alias("x"),
        F.call_function("shiftright", F.col("y"), (-dz).cast("int")).alias("y"),
    )
    k = dz.cast("int")
    children = (
        levels.where(dz > 0)
        .select(
            F.col("tz").alias("z"),
            F.explode(
                F.sequence(
                    F.call_function("shiftleft", F.col("x"), k),
                    F.call_function("shiftleft", F.col("x") + 1, k) - 1,
                )
            ).alias("x"),
            F.call_function("shiftleft", F.col("y"), k).alias("y0"),
            (F.call_function("shiftleft", F.col("y") + 1, k) - 1).alias("y1"),
        )
        .select("z", "x", F.explode(F.sequence("y0", "y1")).alias("y"))
    )
    return parents.unionByName(children).distinct()
