"""Bloom-filter incremental dedup (operators/sketch.py): position
math vs a pure-python reference, the zero-false-negative guarantee,
FP behavior at tiny m, the rescue join, and the bounded bit table."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparktiles.operators.sketch import (
    bloom_bit_table, bloom_dedup_incremental, bloom_positions,
    bloom_probe_flag, bloom_sketch_bitmap,
)

SF = "/root/testdata/sf0.001"


def ref_positions(text: str, m_bits: int, k: int) -> list[int]:
    """Driver-side twin of bloom_positions (the md5-integer idiom)."""
    return [
        int(hashlib.md5(f"{i}{text}".encode()).hexdigest()[:15], 16) % m_bits
        for i in range(k)
    ]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_positions_match_pure_python_reference(spark):
    rows = [("alpha beta gamma",), ("the quick brown fox",), ("x",)]
    df = spark.createDataFrame(rows, "text string")
    got = df.select(
        "text", bloom_positions(F.col("text"), 4096, 5).alias("p")).collect()
    for r in got:
        assert list(r.p) == ref_positions(r.text, 4096, 5)


def test_bit_table_bounded_and_bitmap_agrees(docs):
    m = 1 << 12
    table = {r.pos for r in bloom_bit_table(docs, m_bits=m, k=4).collect()}
    assert len(table) <= m
    bm = bloom_sketch_bitmap(docs, m_bits=m, k=4)
    assert bm.shape == (m >> 3,)
    set_bits = {
        int(i * 8 + b) for i in np.flatnonzero(bm)
        for b in range(8) if bm[i] >> b & 1
    }
    assert set_bits == table


def test_no_false_negatives_and_rescue_join(spark, docs):
    standing = docs.where(F.col("doc_id") % 4 != 0).select("doc_id", "text")
    replicas = standing.where(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text")
    batch = (docs.where(F.col("doc_id") % 4 == 0).select("doc_id", "text")
             .unionAll(replicas))
    out = bloom_dedup_incremental(
        standing, batch, m_bits=1 << 14, k=4).cache()
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == batch.count()
    # every injected replica (a true dup of a standing doc) is flagged
    # AND rescued — Bloom filters have no false negatives
    for r in replicas.collect():
        assert rows[r.doc_id].maybe_dup, r.doc_id
        assert rows[r.doc_id].is_dup, r.doc_id
    # is_dup implies maybe_dup (rescue only ever clears flags)
    assert all(r.maybe_dup for r in rows.values() if r.is_dup)
    # ground truth: is_dup == text's md5 exists in standing
    truth = {r[0] for r in standing.select(F.md5("text")).collect()}
    got = {r.doc_id: r.is_dup for r in rows.values()}
    exact = {
        r.doc_id: hashlib.md5(r.text.encode()).hexdigest() in truth
        for r in batch.collect()
    }
    assert got == exact
    out.unpersist()


def test_tiny_m_saturates_to_false_positives_never_negatives(spark, docs):
    # 64 bits for ~375 standing docs: the sketch saturates, so nearly
    # every batch doc reads maybe_dup (FPs) — but is_dup (exact) stays
    # correct, demonstrating why the rescue join exists
    standing = docs.where(F.col("doc_id") % 4 != 0).select("doc_id", "text")
    batch = docs.where(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    out = bloom_dedup_incremental(standing, batch, m_bits=64, k=2).cache()
    n = out.count()
    n_flag = out.where("maybe_dup").count()
    n_dup = out.where("is_dup").count()
    assert n_flag > n_dup          # false positives exist at m=64
    assert n_flag >= n * 0.9       # saturated sketch flags ~everything
    assert n_dup == 0              # sf0.001 texts are unique
    out.unpersist()


def test_verify_false_skips_rescue(spark, docs):
    standing = docs.where(F.col("doc_id") % 4 != 0).select("doc_id", "text")
    batch = docs.where(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    out = bloom_dedup_incremental(
        standing, batch, m_bits=1 << 14, k=4, verify=False)
    assert out.columns == ["doc_id", "maybe_dup", "is_dup"]
    assert out.where(F.col("is_dup").isNotNull()).count() == 0


def test_probe_flag_is_map_only(spark, docs):
    # the batch-side probe adds NO exchange: plan has no shuffle above
    # the scan (the sketch is a broadcast variable, not a join)
    bm = bloom_sketch_bitmap(docs.limit(50), m_bits=1 << 12, k=4)
    flagged = bloom_probe_flag(
        docs.select("doc_id", "text"), bm, m_bits=1 << 12, k=4)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
