"""Spatial join operators vs pure-python oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparktiles.functions import geom as G
from sparktiles.operators.joins import (
    broadcast_pip_join,
    cell_pip_join,
    knn_join_broadcast,
    knn_join_cells,
    merge_wiki_names_join,
)
from sparktiles.sources.polygons import generate_polygons


@pytest.fixture(scope="module")
def points(spark):
    # deterministic mercator point cloud
    df = spark.range(2000).select(
        F.col("id").alias("pt_id"),
        (((F.col("id") * 37) % 344).cast("double") * 100000.0 - 17200000.0).alias("px"),
        (((F.col("id") * 13) % 272).cast("double") * 100000.0 - 13600000.0).alias("py"),
    )
    return df.cache()


@pytest.fixture(scope="module")
def polys(spark):
    return generate_polygons(spark, n_grid=6).cache()


def _oracle_pip(points_rows, polys_rows):
    out = set()
    for pid, wkb in polys_rows:
        g = G.wkb_loads(bytes(wkb))
        if G.is_empty(g):
            continue
        xs = np.array([p.px for p in points_rows])
        ys = np.array([p.py for p in points_rows])
        m = G.points_in_polygon(xs, ys, g)
        for i in np.nonzero(m)[0]:
            out.add((points_rows[i].pt_id, pid))
    return out


def test_broadcast_pip_matches_oracle(spark, points, polys):
    got = broadcast_pip_join(points, polys.select("poly_id", "geom"))
    got_pairs = {(r.pt_id, r.poly_id) for r in got.select("pt_id", "poly_id").collect()}
    pts = points.collect()
    ps = [(r.poly_id, r.geom) for r in polys.select("poly_id", "geom").collect()]
    exp = _oracle_pip(pts, ps)
    assert got_pairs == exp
    assert len(exp) > 100  # sanity: the lattice actually covers points


def test_cell_pip_matches_broadcast(spark, points, polys):
    a = broadcast_pip_join(points, polys.select("poly_id", "geom"))
    b = cell_pip_join(points, polys.select("poly_id", "geom"), zoom=4)
    pa = {(r.pt_id, r.poly_id) for r in a.select("pt_id", "poly_id").collect()}
    pb = {(r.pt_id, r.poly_id) for r in b.select("pt_id", "poly_id").collect()}
    assert pa == pb


def test_pip_left_join_keeps_unmatched(spark, points, polys):
    j = broadcast_pip_join(points, polys.select("poly_id", "geom"), how="left")
    assert j.where(F.col("poly_id").isNull()).count() == (
        points.count()
        - j.where(F.col("poly_id").isNotNull()).select("pt_id").distinct().count()
    ) or j.count() >= points.count()
    # every input point appears at least once
    assert j.select("pt_id").distinct().count() == points.count()


def test_knn_broadcast_matches_oracle(spark):
    qs = spark.range(30).select(
        F.col("id").alias("qid"),
        ((F.col("id") * 11 % 100).cast("double") * 10.0).alias("qx"),
        ((F.col("id") * 17 % 100).cast("double") * 10.0).alias("qy"),
    )
    bs = spark.range(500).select(
        F.col("id").alias("bid"),
        ((F.col("id") * 7 % 100).cast("double") * 10.0 + 3.0).alias("bx"),
        ((F.col("id") * 3 % 100).cast("double") * 10.0 + 5.0).alias("by"),
    )
    got = knn_join_broadcast(qs, bs, k=4).select("qid", "bid", "knn_rank").collect()
    qrows = qs.collect()
    brows = bs.collect()
    for q in qrows:
        dists = sorted(
            ((q.qx - b.bx) ** 2 + (q.qy - b.by) ** 2, b.bid) for b in brows
        )[:4]
        exp = [bid for _, bid in dists]
        mine = [r.bid for r in sorted(
            (r for r in got if r.qid == q.qid), key=lambda r: r.knn_rank)]
        assert mine == exp, q.qid


def test_knn_cells_matches_broadcast_when_dense(spark):
    # dense base: every ring-1 neighborhood holds >> k points at z3
    qs = spark.range(20).select(
        F.col("id").alias("qid"),
        ((F.col("id") * 11 % 50).cast("double") * 100000.0 - 2000000.0).alias("qx"),
        ((F.col("id") * 17 % 50).cast("double") * 100000.0 - 2000000.0).alias("qy"),
    )
    bs = spark.range(3000).select(
        F.col("id").alias("bid"),
        ((F.col("id") * 7 % 60).cast("double") * 100000.0 - 2500000.0).alias("bx"),
        ((F.col("id") * 13 % 60).cast("double") * 100000.0 - 2500000.0).alias("by"),
    )
    a = knn_join_broadcast(qs, bs, k=3).select("qid", "bid", "knn_rank")
    b = knn_join_cells(qs, bs, k=3, zoom=3).select("qid", "bid", "knn_rank")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_merge_wiki_names(spark):
    feats = spark.createDataFrame(
        [
            (1, {"name": "Praha", "wikidata": "Q1"}),       # overlap -> merge
            (2, {"name": "Nowhere", "wikidata": "Q2"}),     # no overlap -> keep
            (3, {"name": "NoWd"}),                           # no wikidata key
            (4, {"name": "Praha", "wikidata": "Q404"}),     # unknown id
        ],
        "fid int, tags map<string,string>",
    )
    wd = spark.createDataFrame(
        [
            ("Q1", {"name:en": "Prague", "name:de": "Prag", "name": "Praha",
                    "ignored_key": "x"}),
            ("Q2", {"name:en": "Elsewhere", "name": "Different"}),
        ],
        "id string, labels map<string,string>",
    )
    out = {r.fid: r.tags for r in merge_wiki_names_join(
        feats, wd, languages=["en", "de"]).collect()}
    assert out[1] == {"name": "Praha", "wikidata": "Q1",
                      "name:en": "Prague", "name:de": "Prag"}
    assert out[2] == {"name": "Nowhere", "wikidata": "Q2"}
    assert out[3] == {"name": "NoWd"}
    assert out[4] == {"name": "Praha", "wikidata": "Q404"}
