"""Winnowing fingerprint sets, DSIR importance weights, and BPE pair
counting — each checked against a small pure-Python reference on real
corpus rows plus structural invariants."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sparktiles.operators import text as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


# ------------------------------------------------- winnowing (MOSS)

def py_winnow(text, k=8, window=4):
    """Reference winnowing: per-window min hash, rightmost tie-break."""
    n = len(text) - k + 1
    if n < window:
        return set()
    hs = [hashlib.md5(text[i:i + k].encode()).hexdigest()
          for i in range(n)]
    out = set()
    for s in range(n - window + 1):
        wh = hs[s:s + window]
        m = min(wh)
        pos = s + max(i for i, h in enumerate(wh) if h == m)
        out.add((pos, m))
    return out


def test_winnowing_matches_python_reference(spark, docs):
    rows = docs.orderBy("doc_id").limit(20).collect()
    got = (T.winnowing_fingerprints(
        docs.where(F.col("doc_id") < 20), k=8, window=4)
        .collect())
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for r in rows:
        assert by_doc.get(r.doc_id, set()) == py_winnow(r.text), r.doc_id


def test_winnowing_density_and_coverage(spark, docs):
    # guaranteed: >= 1 fingerprint per window position, <= n selected;
    # expected density ~ 2/(w+1)
    out = T.winnowing_fingerprints(docs, k=8, window=4)
    stats = (out.groupBy("doc_id").count()
             .join(docs.select("doc_id",
                               (F.length("text") - F.lit(7)).alias("n")),
                   "doc_id")
             .agg(F.sum("count").alias("sel"), F.sum("n").alias("grams"))
             .first())
    density = stats.sel / stats.grams
    assert 0.25 < density < 0.55  # 2/(4+1) = 0.4 nominal


def test_winnowing_rightmost_tiebreak(spark):
    # a constant string: every k-gram hash is identical, so each
    # window must select its RIGHTMOST position; selected set =
    # {(s + w - 1, h)} for every window start s
    d = spark.createDataFrame([(1, "a" * 20)], "doc_id long, text string")
    got = sorted((r.pos, r.fp)
                 for r in T.winnowing_fingerprints(d, k=8, window=4)
                 .collect())
    h = hashlib.md5(b"a" * 8).hexdigest()
    n = 20 - 8 + 1  # 13 grams, windows s = 0..9
    assert got == [(s + 3, h) for s in range(n - 4 + 1)]


# --------------------------------------------------- DSIR importance

def test_dsir_target_scores_higher(spark, docs):
    out = (T.dsir_logweights(docs, target_col="lang", target_value="en")
           .join(docs.select("doc_id", "lang"), "doc_id"))
    m = (out.groupBy(F.col("lang") == "en")
         .agg(F.avg("log_weight").alias("w"))
         .collect())
    means = {r[0]: r.w for r in m}
    # importance weights trained toward 'en' must rank 'en' docs higher
    assert means[True] > means[False]


def test_dsir_feature_count_is_2n_minus_1(spark, docs):
    out = T.dsir_logweights(docs)
    j = (out.join(
        docs.select(
            "doc_id",
            F.size(F.filter(F.split("text", " "),
                            lambda t: t != "")).alias("nt")),
        "doc_id")
        .where(F.col("n_feats") != 2 * F.col("nt") - 1))
    assert j.count() == 0  # uni (n) + bi (n-1) grams, no doc dropped


def test_dsir_python_reference_on_sample(spark, docs):
    rows = docs.collect()

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 256

    cr, ct = Counter(), Counter()
    per_doc = {}
    for r in rows:
        ts = [t for t in r.text.split(" ") if t]
        gs = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        bs = [bucket(g) for g in gs]
        per_doc[r.doc_id] = bs
        cr.update(bs)
        if r.lang == "en":
            ct.update(bs)
    tr, tt = sum(cr.values()), sum(ct.values())
    lam = {b: math.log((ct[b] + 1.0) / (tt + 256.0))
           - math.log((cr[b] + 1.0) / (tr + 256.0)) for b in cr}
    got = {r.doc_id: r.log_weight
           for r in T.dsir_logweights(docs).collect()}
    for doc_id, bs in per_doc.items():
        assert abs(got[doc_id] - sum(lam[b] for b in bs)) < 1e-3, doc_id


# ------------------------------------------------- BPE pair counting

def test_bpe_pair_counts_match_python(spark, docs):
    rows = docs.collect()
    ref = Counter()
    for r in rows:
        for w in r.text.split(" "):
            if len(w) >= 2:
                for a, b in zip(w, w[1:]):
                    ref[(a, b)] += 1
    top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [((r.left_sym, r.right_sym), r.cnt)
           for r in T.bpe_pair_counts(docs, top_k=20)
           .orderBy(F.col("cnt").desc(), "left_sym", "right_sym")
           .collect()]
    assert got == top


def test_winnowing_overlap_detects_planted_clone(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet forest before dawn")
    rows = [(1, base), (2, base + " with a changed tail here"),
            (3, "completely different content about spark shuffles "
                "and partitions and broadcast joins at scale")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.shared_fps
           for r in T.winnowing_overlap_pairs(
               d, k=8, window=4, min_shared=2, max_df=16).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 2   # clone pair found
    assert (1, 3) not in got and (2, 3) not in got


def test_winnowing_overlap_hot_fp_cut(spark):
    # 20 docs all sharing one identical sentence: every fingerprint of
    # that sentence has df=20 > max_df=16, so the cut removes them and
    # NO pair survives — the boilerplate guard working as intended
    rows = [(i, f"unique{i}x prefix words " +
             "shared boilerplate sentence appearing everywhere")
            for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = T.winnowing_overlap_pairs(d, k=8, window=4,
                                    min_shared=2, max_df=16)
    assert out.count() == 0
