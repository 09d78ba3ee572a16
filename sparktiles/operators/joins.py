"""Spatial join operators (SURVEY.md §2.3).

J1 cell-indexed tile join   -> operators.pyramid.assign_point_tiles
J2 point-in-polygon         -> broadcast_pip_join (small polygon side,
                               the reference's admin-area pattern) and
                               cell_pip_join (large-large, cell-keyed)
J3 wikidata label lookup    -> merge_wiki_names_join
J8 kNN                      -> knn_join_broadcast (exact) and
                               knn_join_cells (cell-candidate, the
                               scale path: query cell + ring-1)

Design: polygons are WKB; the exact containment test runs in a
vectorized numpy kernel (points_in_polygon, one pass per edge set) via
mapInPandas — candidates are pre-filtered JVM-side with bbox column
math so the Python kernel sees only plausible pairs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparktiles.functions import geom as G
from sparktiles.operators.pyramid import assign_point_tiles


def polygons_with_bounds(polys: DataFrame, geom_col: str = "geom") -> DataFrame:
    """Add xmin/ymin/xmax/ymax columns from WKB (one-shot pandas pass)."""

    def add_bounds(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bs = [G.bounds(G.wkb_loads(bytes(b))) if b is not None else None
                  for b in pdf[geom_col]]
            pdf = pdf.copy()
            pdf["xmin"] = [b[0] if b else np.nan for b in bs]
            pdf["ymin"] = [b[1] if b else np.nan for b in bs]
            pdf["xmax"] = [b[2] if b else np.nan for b in bs]
            pdf["ymax"] = [b[3] if b else np.nan for b in bs]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in polys.schema)
    schema += ", xmin double, ymin double, xmax double, ymax double"
    return polys.mapInPandas(add_bounds, schema)


def broadcast_pip_join(
    points: DataFrame,
    polygons: DataFrame,
    poly_id: str = "poly_id",
    geom_col: str = "geom",
    x_col: str = "px",
    y_col: str = "py",
    how: str = "inner",
) -> DataFrame:
    """Point-in-polygon with a broadcastable polygon side (J2).

    Plan: data-induced global-bbox predicate on the point side (the
    union bbox of the polygon set, derived at plan time — the
    "data-induced predicates" trick of Kandula et al., VLDB 2019) ->
    bbox prefilter as a broadcast range join (JVM) -> exact
    containment in a grouped numpy kernel. The induced predicate is a
    plain comparison filter, so it reaches the parquet scan as
    PushedFilters and prunes row groups whose min/max lie outside all
    polygons — at corpus scale most of the planet. Points can match
    multiple polygons (overlaps allowed); `how='left'` keeps
    unmatched points with NULL poly columns (the induced filter only
    gates the match path, never the left side).
    """
    pb = polygons_with_bounds(polygons, geom_col)
    gb = pb.agg(F.min("xmin").alias("x0"), F.min("ymin").alias("y0"),
                F.max("xmax").alias("x1"), F.max("ymax").alias("y1")).first()
    pts = points
    if gb["x0"] is not None:
        pts = points.where(
            (F.col(x_col) >= gb["x0"]) & (F.col(x_col) <= gb["x1"])
            & (F.col(y_col) >= gb["y0"]) & (F.col(y_col) <= gb["y1"]))
    cand = pts.join(
        F.broadcast(pb),
        (F.col(x_col) >= F.col("xmin")) & (F.col(x_col) <= F.col("xmax"))
        & (F.col(y_col) >= F.col("ymin")) & (F.col(y_col) <= F.col("ymax")),
        "inner",
    )

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in cand.schema
        if f.name not in (geom_col, "xmin", "ymin", "xmax", "ymax")
    )

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            xs = pdf[x_col].to_numpy(dtype=float)
            ys = pdf[y_col].to_numpy(dtype=float)
            for pid, idx in pdf.groupby(poly_id).indices.items():
                wkb = bytes(pdf[geom_col].iloc[idx[0]])
                g = cache.get(pid)
                if g is None:
                    g = cache[pid] = G.wkb_loads(wkb)
                keep[idx] = G.points_in_polygon(xs[idx], ys[idx], g)
            yield pdf.loc[keep].drop(columns=[geom_col, "xmin", "ymin", "xmax", "ymax"])

    matched = cand.mapInPandas(exact, out_schema)
    if how == "inner":
        return matched
    if how == "left":
        missing = points.join(
            matched.select(*points.columns).distinct(), points.columns, "left_anti"
        )
        pad = [c for c in matched.columns if c not in points.columns]
        for c in pad:
            missing = missing.withColumn(c, F.lit(None))
        return matched.unionByName(missing.select(matched.columns))
    raise ValueError(how)


def cell_pip_join(
    points: DataFrame,
    polygons: DataFrame,
    zoom: int = 7,
    poly_id: str = "poly_id",
    geom_col: str = "geom",
    x_col: str = "px",
    y_col: str = "py",
) -> DataFrame:
    """Large-large PIP: both sides keyed by z-`zoom` tile cells, shuffle
    equi-join on (z,x,y), exact numpy containment after. This is the
    scale path when the polygon side exceeds broadcast size; skewed
    cells are split by AQE (sort-merge join on the cell key)."""
    from sparktiles.operators.pyramid import assign_supercover_tiles_multi

    # supercover cell keying (round 4): a polygon is keyed only to the
    # cells it actually touches (outline rasterization + interior
    # fill), not its bbox — for diagonal/sparse polygons this cuts the
    # candidate (point, polygon) pairs the exact containment must
    # reject, same superset guarantee (a point inside the polygon is in
    # a cell the polygon's interior intersects)
    poly_cells = assign_supercover_tiles_multi(
        polygons.select(poly_id, geom_col), zoom, zoom
    ).select(poly_id, geom_col, "x", "y")
    pt_cells = assign_point_tiles(points, zoom, 0.0, x_col, y_col)
    cand = pt_cells.join(poly_cells, ["x", "y"], "inner").drop("x", "y", "z")

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in cand.schema if f.name != geom_col
    )

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            xs = pdf[x_col].to_numpy(dtype=float)
            ys = pdf[y_col].to_numpy(dtype=float)
            for pid, idx in pdf.groupby(poly_id).indices.items():
                g = cache.get(pid)
                if g is None:
                    g = cache[pid] = G.wkb_loads(bytes(pdf[geom_col].iloc[idx[0]]))
                keep[idx] = G.points_in_polygon(xs[idx], ys[idx], g)
            yield pdf.loc[keep].drop(columns=[geom_col])

    # a point may fall in several cells? no — exactly one cell; but a
    # polygon spans many cells, so (point, polygon) pairs are unique.
    return cand.mapInPandas(exact, out_schema)


def knn_join_broadcast(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    qid: str = "qid",
    bid: str = "bid",
    qx: str = "qx", qy: str = "qy", bx: str = "bx", by: str = "by",
) -> DataFrame:
    """Exact kNN when one side broadcasts: cross join + window top-k
    (J8; the reference's LabelGrid/rank-per-cell pattern,
    sql/LabelGrid.sql:20-29). Deterministic tie-break on (dist2, bid)."""
    j = queries.crossJoin(F.broadcast(base))
    d2 = (F.col(qx) - F.col(bx)) ** 2 + (F.col(qy) - F.col(by)) ** 2
    w = Window.partitionBy(qid).orderBy(d2.asc(), F.col(bid).asc())
    return (
        j.withColumn("dist2", d2)
        .withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


def knn_join_cells(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    zoom: int = 6,
    qid: str = "qid",
    bid: str = "bid",
    qx: str = "qx", qy: str = "qy", bx: str = "bx", by: str = "by",
) -> DataFrame:
    """Scale-path kNN: candidate generation by cell equi-join — each
    query point joins base points in its z-`zoom` cell AND the 8
    neighbors (ring-1), then exact window top-k within candidates
    (SURVEY.md J8). Exact whenever each ring-1 neighborhood holds >= k
    base points AND the kth distance <= one cell width; choose `zoom`
    so the expected cell occupancy >> k. Returns same shape as
    knn_join_broadcast plus a candidate count for diagnostics."""
    bcell = assign_point_tiles(base, zoom, 0.0, bx, by).select(
        F.col("x").alias("_cx"), F.col("y").alias("_cy"), *base.columns
    )
    qcell = assign_point_tiles(queries, zoom, 0.0, qx, qy)
    # explode query cell to its 3x3 ring
    ring = qcell.select(
        *queries.columns,
        F.explode(
            F.array(*[
                F.struct((F.col("x") + dx).alias("_cx"), (F.col("y") + dy).alias("_cy"))
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            ])
        ).alias("_r"),
    ).select(*queries.columns, F.col("_r._cx").alias("_cx"), F.col("_r._cy").alias("_cy"))
    cand = ring.join(bcell, ["_cx", "_cy"], "inner").drop("_cx", "_cy")
    d2 = (F.col(qx) - F.col(bx)) ** 2 + (F.col(qy) - F.col(by)) ** 2
    w = Window.partitionBy(qid).orderBy(d2.asc(), F.col(bid).asc())
    return (
        cand.withColumn("dist2", d2)
        .withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


def merge_wiki_names_join(
    features: DataFrame,
    wd_names: DataFrame,
    tags_col: str = "tags",
    languages: list[str] | None = None,
) -> DataFrame:
    """merge_wiki_names (J3, reference sql/zzz_language.sql:127-151):
    if tags has a 'wikidata' key, look the id up in wd_names(id,labels)
    and — when any label value overlaps the tag values — merge the
    language-sliced labels UNDER the existing tags (tags win on
    conflict, hstore `||` semantics)."""
    from sparktiles.functions.scalars import slice_language_tags

    langs = languages or []
    wd = wd_names.select(F.col("id").alias("_wd_id"), F.col("labels").alias("_wd_labels"))
    t = F.col(tags_col)
    j = features.join(
        F.broadcast(wd), F.element_at(t, "wikidata") == F.col("_wd_id"), "left"
    )
    overlap = F.arrays_overlap(
        F.map_values(F.col("_wd_labels")), F.map_values(t)
    )
    sliced = slice_language_tags(F.col("_wd_labels"), langs)
    merged = F.when(
        F.col("_wd_labels").isNotNull() & overlap,
        F.map_concat(
            F.map_filter(sliced, lambda k, v: ~F.map_contains_key(t, k)), t
        ),
    ).otherwise(t)
    return j.withColumn(tags_col, merged).drop("_wd_id", "_wd_labels")
