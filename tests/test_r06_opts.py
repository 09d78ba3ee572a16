"""Round-6 optimization guards: value parity of the vectorized paths
and plan-shape contracts for the scale fixes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import sparktiles.operators.ann as A
import sparktiles.operators.text as T
from sparktiles.operators.spread import spread


@pytest.fixture(scope="module")
def emb64(spark):
    rows = [(i, [float(((i * 31 + j * 7) % 23) - 11) / 7.0
                 for j in range(16)]) for i in range(300)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_argmin_arrow_matches_literal(spark, emb64):
    """The broadcast-matrix argmin kernel must reproduce the literal
    when-chain bit-for-bit (same fold order, same strict-< tie rule)."""
    cents = [[float(((c * 13 + j * 5) % 19) - 9) / 5.0 for j in range(16)]
             for c in range(10)]  # k=10: literal-eligible (chain is O(2^k))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pts = emb64.select("vec_id", v.alias("_v"))
    lit = {r.vec_id: r.c for r in pts.select(
        "vec_id", A._argmin_centroid(F.col("_v"), cents).alias("c")).collect()}
    arw = {r.vec_id: r.c for r in pts.select(
        "vec_id", A._argmin_centroid_arrow(F.col("_v"), cents).alias("c")).collect()}
    assert lit == arw


def test_argmin_dispatch_large_k_plan_bounded(spark, emb64):
    """k*dim above the literal ceiling must route to the kernel: the
    plan string stays O(1) in k (no k-deep CASE chain)."""
    cents = [[float((c + j) % 7) for j in range(16)] for c in range(512)]
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pts = emb64.select("vec_id", v.alias("_v"))
    df = pts.select("vec_id", A._argmin(F.col("_v"), cents).alias("c"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan
    assert len(plan) < 20000  # literal chain for k=512 would be ~MB
    got = df.groupBy("c").count().count()
    assert got >= 1


def test_pack_sequences_no_docgrain_global_window(spark):
    """The only partition-less ordered window may read the super-block
    totals (bounded N/(block*65536) rows), never a doc-grain frame."""
    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(500)],
        "doc_id long, text string")
    df = T.pack_sequences(docs, budget=64, block=8)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re
    # windowspec with empty partition list: "windowspecdefinition(_sb#..."
    bad = re.findall(r"windowspecdefinition\((?:doc_id|_blk)#\d+L? ASC",
                     plan)
    assert not bad, f"doc/block-grain global window in plan: {bad}"
    # and outputs still match a direct python prefix sum
    rows = sorted((r.doc_id, r.n_tokens, r.token_offset)
                  for r in df.collect())
    off = 0
    for did, n, got_off in rows:
        assert got_off == off, (did, got_off, off)
        off += n


def test_spread_identity_content(spark):
    d = spark.createDataFrame([(i, str(i)) for i in range(100)],
                              "a long, b string")
    out = spread(d)
    assert sorted((r.a, r.b) for r in out.collect()) == \
        sorted((r.a, r.b) for r in d.collect())


def test_winnow_kernel_empty_and_short_docs(spark):
    d = spark.createDataFrame(
        [(1, "abcdefghij" * 4), (2, "tiny"), (3, "")],
        "doc_id long, text string")
    out = T.winnowing_fingerprints(d, k=8, window=4).collect()
    assert {r.doc_id for r in out} == {1}
    assert all(len(r.fp) == 32 for r in out)


def test_local_union_find_matches_star_labels(spark):
    """Local-finish union-find must emit the exact min-id component
    labels the distributed star rounds produce."""
    import sparktiles.operators.graph as G
    edges = [(1, 2), (2, 3), (10, 11), (5, 5), (7, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component
           for r in G.connected_components_star(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 5: 5}
    # force the distributed rounds too (gate below the edge count)
    got2 = {r.node: r.component
            for r in G.connected_components_star(
                e, local_finish_rows=0).collect()}
    assert got2 == got
