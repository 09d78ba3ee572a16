"""Regression: operators whose arrays are read by HOF lambdas must be
lambda-bound (docs/SCALE.md 'lambda-bind' rule) — a pushed-down
predicate must cost one chain evaluation, not one per array element.
The optimized-plan copy count is the cheap, deterministic proxy: the
pre-fix gopher gate showed 6 chain copies (and O(n) re-evaluation per
row inside the lambdas); the floor is one per n-gram order."""

import pytest
from pyspark.sql import functions as F

from sparktiles.operators import text as T


@pytest.fixture(scope="module")
def docs_small(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .cache())


def _opt_plan(df):
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_gopher_filter_context_chain_copies(spark, docs_small):
    gated = (T.repetition_signals(docs_small)
             .where(~F.col("repetitive")).select("doc_id"))
    # one tokenize+hash chain per n-gram order (2- and 3-grams) — the
    # minimum; the pre-fix plan inlined 6
    assert _opt_plan(gated).count("xxhash64") <= 2


def test_exactsubstr_kept_text_filter_chain_copies(spark, docs_small):
    cut = (T.exactsubstr_cut(docs_small, window=5)
           .where(F.col("kept_text") != "").select("doc_id"))
    # gram-build + mark-back join — the two structural uses
    assert _opt_plan(cut).count("xxhash64") <= 2


def test_gopher_filter_matches_unfiltered(spark, docs_small):
    full = {r.doc_id: r.repetitive
            for r in T.repetition_signals(docs_small).collect()}
    gated = {r.doc_id for r in T.repetition_signals(docs_small)
             .where(~F.col("repetitive")).select("doc_id").collect()}
    assert gated == {d for d, rep in full.items() if not rep}
