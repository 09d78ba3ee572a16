"""Perplexity bucketing, MinHash candidate verification, and
best-of-cluster dedup representative selection."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sparktiles.operators import text as T
from sparktiles.operators.graph import dedup_keep_best

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


# ------------------------------------------------- perplexity buckets

def test_perplexity_buckets_covers_corpus_with_balanced_bands(spark, docs):
    out = T.perplexity_buckets(docs, vocab_size=16, n_buckets=3).cache()
    n = docs.count()
    assert out.count() == n  # every doc is banded exactly once
    per_lang = out.groupBy("lang", "ppl_bucket").count().collect()
    sizes = {}
    for r in per_lang:
        sizes.setdefault(r.lang, Counter())[r.ppl_bucket] = r["count"]
    for lang, c in sizes.items():
        assert set(c) <= {"head", "middle", "tail"}
        # equal-frequency bands: sizes differ by at most 1
        assert max(c.values()) - min(c.values()) <= 1, (lang, c)
    out.unpersist()


def test_perplexity_buckets_head_is_lowest_bits(spark, docs):
    out = T.perplexity_buckets(docs, vocab_size=16, n_buckets=3)
    agg = (
        out.groupBy("lang", "ppl_bucket")
        .agg(F.min("bits_per_token").alias("lo"),
             F.max("bits_per_token").alias("hi"))
        .collect()
    )
    by = {(r.lang, r.ppl_bucket): (r.lo, r.hi) for r in agg}
    for lang in {k[0] for k in by}:
        h, m, t = by[(lang, "head")], by[(lang, "middle")], by[(lang, "tail")]
        # band edges may share a tied bits value but never invert
        assert h[1] <= m[0] or abs(h[1] - m[0]) < 1e-9
        assert m[1] <= t[0] or abs(m[1] - t[0]) < 1e-9


def test_perplexity_buckets_two_band_labels(spark):
    d = spark.createDataFrame(
        [(i, "tok" + str(i % 4) + " tok0 tok1", "en") for i in range(8)],
        "doc_id long, text string, lang string",
    )
    out = T.perplexity_buckets(d, vocab_size=2, n_buckets=2)
    got = {r.ppl_bucket for r in out.collect()}
    assert got == {"head", "tail"}  # no 'middle' band when n_buckets=2


# ------------------------------------------- minhash verify estimates

def test_minhash_verify_clones_estimate_one(spark, docs):
    clones = docs.limit(6).withColumn("doc_id", F.col("doc_id") + 500000)
    d = docs.limit(60).unionByName(clones)
    out = T.minhash_jaccard_verify(d, threshold=0.0).cache()
    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in out.collect()}
    # identical texts agree on every signature component
    hits = [v for (a, b), v in est.items() if b - a == 500000]
    assert len(hits) >= 5 and all(v == 1.0 for v in hits)
    # ordered pairs, no self-pairs
    assert all(a < b for (a, b) in est)
    out.unpersist()


def test_minhash_verify_threshold_filters(spark, docs):
    clones = docs.limit(6).withColumn("doc_id", F.col("doc_id") + 500000)
    d = docs.limit(60).unionByName(clones)
    all_pairs = T.minhash_jaccard_verify(d, threshold=0.0)
    strict = T.minhash_jaccard_verify(d, threshold=0.9)
    n_all, n_strict = all_pairs.count(), strict.count()
    assert n_strict <= n_all
    assert strict.where(F.col("est_jaccard") < 0.9).count() == 0
    # every band-colliding pair agrees on >= one band = 2/8 components
    assert all_pairs.where(F.col("est_jaccard") < 0.25).count() == 0


# ------------------------------------------------ keep-best selection

def test_dedup_keep_best_prefers_longest(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (1, base, len(base)),
        (2, base + " extra", len(base) + 6),          # longest clone wins
        (3, base + " x", len(base) + 2),
        (10, "totally different text with its own tokens here", 48),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    out = dedup_keep_best(d, quality_col="n_chars").collect()
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == {1, 2, 3}  # doc 10 is in no component
    assert all(r.component == 1 for r in out)
    assert all(r.keep_id == 2 for r in out)  # longest, not smallest id
    assert [r.doc_id for r in out if r.is_kept] == [2]


def test_dedup_keep_best_one_keeper_per_component(spark, docs):
    clones = docs.limit(8).withColumn("doc_id", F.col("doc_id") + 700000)
    d = docs.limit(80).unionByName(clones)
    out = dedup_keep_best(d, quality_col="n_chars").cache()
    per_comp = out.groupBy("component").agg(
        F.sum(F.col("is_kept").cast("int")).alias("n_kept"),
        F.count("*").alias("n"),
    ).collect()
    assert all(r.n_kept == 1 for r in per_comp)
    assert all(r.n >= 2 for r in per_comp)  # singletons never appear
    # the keeper maximizes n_chars within its component (ties: min id)
    joined = out.join(
        d.select("doc_id", "n_chars"), "doc_id").cache()
    best = joined.groupBy("component").agg(
        F.max(F.struct(F.col("n_chars").alias("n_chars"),
                       (-F.col("doc_id")).alias("neg_id"))).alias("m"))
    kept = joined.where("is_kept").select(
        "component", "n_chars", (-F.col("doc_id")).alias("neg_id"))
    chk = kept.join(best, "component").where(
        (F.col("m.n_chars") != F.col("n_chars"))
        | (F.col("m.neg_id") != F.col("neg_id")))
    assert chk.count() == 0
    joined.unpersist()
    out.unpersist()
