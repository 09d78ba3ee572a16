"""exact_group_quantiles: Python-reference parity and edge semantics."""

import math

import pytest

from sparktiles.operators.stats import exact_group_quantiles


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .cache())


def ref_quantile(vals, q):
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def test_matches_python_reference(spark, docs):
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    rows = docs.select("lang", "n_chars").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.n_chars)
    got = {(r.grp, r.q): r.value
           for r in exact_group_quantiles(docs, "lang", "n_chars",
                                          qs).collect()}
    assert len(got) == len(by_lang) * len(qs)
    for lang, vals in by_lang.items():
        for q in qs:
            assert got[(lang, q)] == ref_quantile(vals, q), (lang, q)


def test_ties_and_extremes(spark):
    d = spark.createDataFrame(
        [("a", v) for v in [5, 5, 5, 1, 9]] + [("b", 7)],
        "grp string, v long")
    got = {(r.grp, r.q): r.value
           for r in exact_group_quantiles(d, "grp", "v",
                                          [0.01, 0.5, 1.0]).collect()}
    assert got[("a", 0.01)] == 1 and got[("a", 0.5)] == 5
    assert got[("a", 1.0)] == 9
    assert got[("b", 0.5)] == 7 and got[("b", 1.0)] == 7
