"""filter_blocked_domains / corpus_stats / source_mix_report
(operators/text.py) — hand-computed goldens; cross-engine parity via
the queries.py oracles."""

import math


def test_blocklist_exact_subdomain_and_survivors(spark):
    from sparktiles.operators.text import filter_blocked_domains

    rows = [
        (1, "http://bad.example.com/x"),          # exact
        (2, "https://www.bad.example.com/y"),     # www-stripped exact
        (3, "https://deep.sub.bad.example.com/"),  # subdomain
        (4, "http://notbad.example.com/z"),       # NOT a dot-suffix
        (5, "https://good.org/a?b=c"),
        (6, "http://localhost:8080/p"),           # single-label + port
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r["domain"]
           for r in filter_blocked_domains(
               df, ["bad.example.com", "localhost"]).collect()}
    assert set(out) == {4, 5}
    assert out[4] == "notbad.example.com"
    assert out[5] == "good.org"

    # empty blocklist keeps everything
    n = filter_blocked_domains(df, []).count()
    assert n == 6


def test_corpus_stats_hand_case(spark):
    from sparktiles.operators.text import corpus_stats

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c  d"), (3, "")],
        "doc_id long, text string")
    row = corpus_stats(df).collect()[0]
    # tokens: a a b b c d -> 6; types: a b c d -> 4; hapax: c d -> 2
    assert row["n_docs"] == 3
    assert row["n_tokens"] == 6
    assert row["n_types"] == 4
    assert row["hapax_frac"] == 0.5
    assert row["top10_coverage"] == 1.0     # <=10 types


def test_source_mix_report_hand_case(spark):
    from sparktiles.operators.text import source_mix_report

    rows = [
        (1, "x y", "en", "s1"), (2, "x", "en", "s1"),
        (3, "x y z", "de", "s1"), (4, "q", "fr", "s2"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = {r["source"]: r for r in source_mix_report(df).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 3 and s1["n_tokens"] == 6
    assert s1["n_langs"] == 2 and s1["top_lang"] == "en"
    p_en, p_de = 2 / 3, 1 / 3
    want = round(-(p_en * math.log2(p_en) + p_de * math.log2(p_de)), 4)
    assert s1["lang_entropy_bits"] == want
    s2 = out["s2"]
    assert (s2["n_docs"], s2["n_langs"], s2["top_lang"]) == (1, 1, "fr")
    # the +0.0 fold: single-lang entropy is POSITIVE zero exactly
    assert repr(s2["lang_entropy_bits"]) == "0.0"
