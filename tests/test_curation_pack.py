"""ExactSubstr span cut, sequence packing, temperature resampling
(operators/text.py round-5 curation additions)."""

import hashlib

from sparktiles.operators.text import (
    domain_temperature_resample,
    exactsubstr_cut,
    pack_sequences,
)


# ------------------------------------------------------- exactsubstr_cut

def _cut(spark, rows, window=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in
            exactsubstr_cut(df, window=window).collect()}


def test_exactsubstr_cut_cross_doc(spark):
    # "a b c" appears in both docs -> those 3 tokens cut from each
    out = _cut(spark, [(1, "x a b c y"), (2, "a b c z")])
    assert out[1]["n_tokens"] == 5
    assert out[1]["n_removed"] == 3
    assert out[1]["kept_text"] == "x y"
    assert out[2]["kept_text"] == "z"


def test_exactsubstr_cut_intra_doc(spark):
    # the paper's criterion counts intra-document repeats too
    out = _cut(spark, [(1, "a b c q a b c")])
    assert out[1]["n_removed"] == 6
    assert out[1]["kept_text"] == "q"


def test_exactsubstr_cut_overlapping_spans_union(spark):
    # two dup windows overlapping by 2 tokens: covered set is the
    # union, not the sum
    out = _cut(spark, [(1, "a b c d x"), (2, "a b c y"), (3, "b c d z")])
    assert out[1]["n_removed"] == 4          # positions 1-4, not 6
    assert out[1]["kept_text"] == "x"


def test_exactsubstr_cut_clean_and_short_docs(spark):
    out = _cut(spark, [(1, "p q r s"), (2, "u v")])  # no dups; doc 2 < window
    assert out[1]["n_removed"] == 0
    assert out[1]["kept_text"] == "p q r s"
    assert out[2]["n_removed"] == 0
    assert out[2]["kept_text"] == "u v"


def test_exactsubstr_cut_whole_doc_removed(spark):
    out = _cut(spark, [(1, "a b c"), (2, "a b c")])
    assert out[1]["n_removed"] == 3
    assert out[1]["kept_text"] == ""


# -------------------------------------------------------- pack_sequences

def _toks(n):
    return " ".join(f"t{i}" for i in range(n))


def test_pack_sequences_chunk_math(spark):
    # budget 10: doc0 has 4 tokens [0,4), doc1 has 8 [4,12) -> crosses,
    # doc2 has 10 [12,22) -> crosses, doc3 has 3 [22,25)
    rows = [(0, _toks(4)), (1, _toks(8)), (2, _toks(10)), (3, _toks(3))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=10).collect()}
    assert (out[0]["token_offset"], out[0]["first_chunk"],
            out[0]["last_chunk"]) == (0, 0, 0)
    assert out[1]["token_offset"] == 4
    assert (out[1]["first_chunk"], out[1]["last_chunk"],
            out[1]["crosses_boundary"]) == (0, 1, True)
    assert out[2]["n_chunks"] == 2 and out[2]["chunk_offset"] == 2
    assert (out[3]["first_chunk"], out[3]["crosses_boundary"]) == (2, False)


def test_pack_sequences_exact_boundary_fit(spark):
    # doc ending exactly at a chunk boundary does not cross it
    rows = [(0, _toks(10)), (1, _toks(10))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=10).collect()}
    assert out[0]["crosses_boundary"] is False
    assert (out[1]["first_chunk"], out[1]["crosses_boundary"]) == (1, False)


def test_pack_sequences_blocked_scan_matches_naive(spark):
    # tiny block size forces many blocks through the two-pass scan;
    # offsets must equal the naive cumulative sum
    rows = [(i, _toks(1 + (i * 7) % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["token_offset"]
           for r in pack_sequences(df, budget=16, block=4).collect()}
    acc = 0
    for i in range(40):
        assert out[i] == acc
        acc += 1 + (i * 7) % 5


# --------------------------------------- domain_temperature_resample

def test_resample_quota_curve(spark):
    # 25 docs -> floor(4*sqrt(25)) = 20 kept; 4 docs -> floor(8)=8 > 4
    # so the small domain survives whole
    rows = [(i, "big") for i in range(25)] + [(100 + i, "small")
                                              for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_temperature_resample(df).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    big = by_dom["big"]
    assert big[0]["quota"] == 20
    assert sum(r["kept"] for r in big) == 20
    small = by_dom["small"]
    assert small[0]["quota"] == 4
    assert all(r["kept"] for r in small)


def test_resample_rank_is_md5_deterministic(spark):
    rows = [(i, "d") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(domain_temperature_resample(df).collect(),
                 key=lambda r: r["sample_rank"])
    expect = sorted(range(10),
                    key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(),
                                   i))
    assert [r["doc_id"] for r in out] == expect
    # run twice -> identical ranks
    again = sorted(domain_temperature_resample(df).collect(),
                   key=lambda r: r["sample_rank"])
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in out]


# ----------------------------------------- inverted_index / ngram table

def test_inverted_index_postings(spark):
    from sparktiles.operators.text import inverted_index
    rows = [(1, "a b a"), (2, "b c"), (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["token"]: r for r in inverted_index(df).collect()}
    assert out["a"]["df"] == 2 and out["a"]["cf"] == 3
    assert out["a"]["postings"] == "1:2,3:1"
    assert out["b"]["postings"] == "1:1,2:1"
    assert out["c"]["df"] == 1


def test_inverted_index_max_df_cut(spark):
    from sparktiles.operators.text import inverted_index
    rows = [(i, "the x%d" % i) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {r["token"] for r in inverted_index(df, max_df=3).collect()}
    assert "the" not in toks          # df=5 > 3: stopword cut
    assert "x0" in toks and len(toks) == 5


def test_ngram_count_table_prune(spark):
    from sparktiles.operators.text import ngram_count_table
    rows = [(1, "a b c"), (2, "a b d"), (3, "z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["gram"]: r["cnt"]
           for r in ngram_count_table(df, n=2, min_count=2).collect()}
    assert out == {"a b": 2}          # "b c"/"b d" pruned; "z" too short
