"""Regression: the LM scoring probes stay long-keyed and model-side
(docs/SCALE.md 'streams carry longs, math lives on model rows' rule).
The per-token stream must probe a broadcast join keyed on xxhash64
longs with log2 absent from the stream side — the session-15 rewrite
moved the ppl leg's 2v8 ABBA bracket 0.41 -> 0.77 raw on exactly this
shape, so a silent regression to string keys or inline per-token log2
is a scaling bug even while every value stays identical."""

import pytest

from sparktiles.operators import text as T


@pytest.fixture(scope="module")
def docs_small(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .cache())


def _physical(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_unigram_probe_is_long_keyed_broadcast(spark, docs_small):
    plan = _physical(T.unigram_lm_scores(docs_small, vocab_size=16))
    # the probe is a BroadcastHashJoin whose key is the xxhash64 long
    assert "BroadcastHashJoin [_h" in plan
    # log2 is computed exactly once in the whole plan, and that one
    # occurrence is the <=V-row model-side Project (same line builds
    # the hash key from the vocab tok) — never per stream token
    lines = [l for l in plan.splitlines() if "log2" in l.lower()]
    assert len(lines) == 1 and "xxhash64(tok" in lines[0]


def test_unigram_single_aggregation_exchange(spark, docs_small):
    # the scoring pass has exactly ONE exchange: the per-doc aggregate
    # (the broadcast never shuffles the stream); the vocab sort-limit
    # exchanges live in separate collected jobs, not this plan
    plan = _physical(T.unigram_lm_scores(docs_small, vocab_size=16))
    assert plan.count("Exchange hashpartitioning") == 1


def test_kn_stream_is_long_keyed(spark, docs_small):
    plan = _physical(T.kn_bigram_scores(docs_small, vocab_size=16))
    # all three stream-side probes (two UNK maps + the model) are
    # broadcast joins on long hash columns
    assert plan.count("BroadcastHashJoin [h") + \
        plan.count("BroadcastHashJoin [_hm") >= 3
    # no string-keyed broadcast join anywhere in the scoring stream
    assert "BroadcastHashJoin [v_raw" not in plan
    assert "BroadcastHashJoin [tok" not in plan
    probe_and_below = plan[plan.index("BroadcastHashJoin"):]
    assert "log2" not in probe_and_below
