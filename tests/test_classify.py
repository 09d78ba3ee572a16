"""Model-based quality filter (operators/classify.py): feature math
checked against a pure-Python reference on real corpus rows, lr_train
checked against its numpy twin, and the frozen-weight scorer checked
for determinism + threshold semantics."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparktiles.operators.classify import (
    DEFAULT_WEIGHTS, FEATURE_COLS, _STOPWORDS, lr_score, lr_train,
    np_reference_train, quality_classifier, quality_features, sigmoid)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def py_features(text):
    toks = text.split(" ")
    n_stop = sum(1 for t in toks if t in _STOPWORDS)
    n_char = len(text)
    punct = sum(1 for c in text if c in ".,;:!?")
    digit = sum(1 for c in text if c.isdigit())
    upper = sum(1 for c in text if "A" <= c <= "Z")
    return {
        "stopword_ratio": round(n_stop / len(toks), 4),
        "punct_ratio": round(punct / n_char, 4),
        "digit_ratio": round(digit / n_char, 4),
        "upper_ratio": round(upper / n_char, 4),
        "tok_len_scaled": round(n_char / len(toks) / 10.0, 4),
    }


def test_features_match_python_reference(spark, docs):
    rows = docs.orderBy("doc_id").limit(30).collect()
    got = {r["doc_id"]: r.asDict() for r in
           quality_features(docs.where(F.col("doc_id") < 30)).collect()}
    for r in rows:
        want = py_features(r.text)
        g = got[r.doc_id]
        assert g["bias"] == 1.0
        for k, v in want.items():
            assert g[k] == pytest.approx(v, abs=1e-9), (r.doc_id, k)


def test_lr_train_matches_numpy_reference(spark, docs):
    feat = quality_features(docs).withColumn(
        "_lbl", (F.col("stopword_ratio") > 0.05).cast("int"))
    w = lr_train(feat, "_lbl", iters=15, lr=1.0)
    pdf = feat.select("_lbl", "bias", *FEATURE_COLS).toPandas()
    X = pdf[["bias"] + FEATURE_COLS].to_numpy(dtype=float)
    y = pdf["_lbl"].to_numpy(dtype=float)
    ref = np_reference_train(X, y, iters=15, lr=1.0)
    # partition-order float-sum noise only — far below 1e-6 relative
    assert np.allclose(np.array(w), ref, rtol=1e-6, atol=1e-9)


def test_lr_train_is_single_job_per_iteration(spark, docs):
    """The narrow frame is checkpointed: the per-iteration plan must
    not contain the text scan (regexp machinery) anymore."""
    feat = quality_features(docs.limit(50)).withColumn(
        "_lbl", F.lit(1))
    w = lr_train(feat, "_lbl", iters=2, lr=0.5)
    assert len(w) == len(FEATURE_COLS) + 1
    assert all(math.isfinite(x) for x in w)


def test_scorer_threshold_and_determinism(spark, docs):
    out = quality_classifier(docs).select("doc_id", "lr_logit", "lr_keep")
    a = {r.doc_id: (r.lr_logit, r.lr_keep) for r in out.collect()}
    b = {r.doc_id: (r.lr_logit, r.lr_keep) for r in out.collect()}
    assert a == b
    for logit, keep in a.values():
        assert keep == (logit > 0.0)
    # the frozen weights must separate the corpus non-trivially
    kept = sum(1 for _, k in a.values() if k)
    assert 0 < kept < len(a)


def test_scorer_matches_driver_side_dot_product(spark, docs):
    rows = (quality_classifier(docs.where(F.col("doc_id") < 20))
            .orderBy("doc_id").collect())
    for r in rows:
        x = [1.0] + [r[c] for c in FEATURE_COLS]
        want = round(sum(w * xi for w, xi in zip(DEFAULT_WEIGHTS, x)), 4)
        assert r.lr_logit == pytest.approx(want, abs=1e-9)


def test_custom_weights_and_threshold(spark, docs):
    feat = quality_features(docs.limit(40))
    w = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0]  # logit == stopword_ratio
    out = lr_score(feat, weights=w, threshold=0.05).collect()
    for r in out:
        assert r.lr_logit == pytest.approx(
            round(r.stopword_ratio, 4), abs=1e-9)
        assert r.lr_keep == (r.lr_logit > 0.05)


def test_sigmoid_sanity():
    assert sigmoid(0.0) == 0.5
    assert sigmoid(10.0) > 0.9999
    assert sigmoid(-10.0) < 0.0001
