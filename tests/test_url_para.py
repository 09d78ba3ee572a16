"""URL canonicalization/dedup and paragraph-level dedup (operators/text.py)."""

from pyspark.sql import functions as F

from sparktiles.operators.text import (
    canonical_url,
    dedup_url_canonical,
    paragraph_dedup,
)


def _canon(spark, url: str) -> str:
    return (spark.range(1)
            .select(canonical_url(F.lit(url)).alias("c"))
            .collect()[0]["c"])


def test_canonical_url_forms(spark):
    assert _canon(spark, "https://www.EX.com/A/b/") == "ex.com/a/b"
    assert _canon(spark, "http://ex.com/a#frag") == "ex.com/a"
    assert _canon(spark, "https://ex.com/a?utm_source=x&utm_campaign=y") == "ex.com/a"
    # real params survive, in order; utm_* dropped from anywhere
    assert (_canon(spark, "https://ex.com/a?utm_source=x&id=7&utm_medium=m&q=z")
            == "ex.com/a?id=7&q=z")
    # bare domain with trailing slash
    assert _canon(spark, "http://www.ex.com/") == "ex.com"
    # no scheme at all
    assert _canon(spark, "ex.com/path?ref=r") == "ex.com/path?ref=r"


def test_dedup_url_canonical_picks_best(spark):
    rows = [
        (1, "https://www.ex.com/a", 10),
        (2, "http://ex.com/a/", 50),          # same canon, higher quality
        (3, "https://ex.com/a?utm_source=t", 50),  # same canon, tie -> min id
        (4, "https://ex.com/b", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    out = {r["canon_url"]: r for r in dedup_url_canonical(df).collect()}
    assert out["ex.com/a"]["doc_id"] == 2
    assert out["ex.com/a"]["n_dupes"] == 3
    assert out["ex.com/b"]["doc_id"] == 4
    assert out["ex.com/b"]["n_dupes"] == 1


def test_paragraph_dedup_hand_case(spark):
    shared = " ".join(f"w{i}" for i in range(4))        # one 4-word para
    rows = [
        (1, shared + " " + "a b c d"),
        (2, shared + " " + "e f g h"),
        (3, shared + " " + "i j k l"),
        (4, "m n o p q r"),                             # 2 paras (4+2 words)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in paragraph_dedup(df, k_words=4, max_docs=2).collect()}
    # `shared` appears in 3 > 2 docs -> removed from all three
    assert out[1]["text"] == "a b c d"
    assert out[2]["text"] == "e f g h"
    assert out[3]["text"] == "i j k l"
    assert out[1]["n_paras"] == 2 and out[1]["n_removed"] == 1
    # doc 4 untouched, including its short tail paragraph
    assert out[4]["text"] == "m n o p q r"
    assert out[4]["n_paras"] == 2 and out[4]["n_removed"] == 0


def test_paragraph_dedup_doc_fully_removed(spark):
    para = "x y z w"
    rows = [(i, para) for i in range(1, 5)]  # same single para in 4 docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = paragraph_dedup(df, k_words=4, max_docs=2).collect()
    assert all(r["text"] == "" and r["n_removed"] == 1 for r in out)
    assert len(out) == 4


def test_paragraph_dedup_order_stable(spark):
    # many paragraphs, none removed -> rebuild must equal the original
    words = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    out = paragraph_dedup(df, k_words=7, max_docs=2).collect()[0]
    assert out["text"] == words
    assert out["n_paras"] == 15 and out["n_removed"] == 0


def test_unigram_lm_scores_hand_case(spark):
    from sparktiles.operators.text import unigram_lm_scores

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    # cf: a=2 b=2 c=1, total=5; vocab(2) = {a, b} (tie a<b); OOV mass
    # p(c) = (5-4)/5/(3-2) = 0.2; p(a)=p(b)=0.4
    out = {r["doc_id"]: r
           for r in unigram_lm_scores(df, vocab_size=2).collect()}
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
    assert out[1]["bits_per_token"] == 1.3219   # -log2(0.4)
    assert out[2]["bits_per_token"] == 1.8219   # mean(-log2 .4, -log2 .2)


def test_bm25_hand_case(spark):
    import math

    from sparktiles.operators.text import bm25_topk

    # d1 has 'q' twice in 4 tokens, d2 once in 2, d3 none
    df = spark.createDataFrame(
        [(1, "q a q b"), (2, "q c"), (3, "x y z w")],
        "doc_id long, text string")
    out = bm25_topk(df, ["q"], k=5).collect()
    assert [r["doc_id"] for r in out] == [1, 2]   # tf=2 beats shorter doc
    n, df_q, avgdl = 3.0, 2.0, (4 + 2 + 4) / 3.0
    idf = math.log((n - df_q + 0.5) / (df_q + 0.5) + 1.0)

    def s(tf, dl):
        return round(idf * tf * (1.2 + 1.0)
                     / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4)

    assert out[0]["score"] == s(2, 4) and out[1]["score"] == s(1, 2)


def test_bm25_multi_term_and_k(spark):
    from sparktiles.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 else "alpha") for i in range(1, 9)],
        "doc_id long, text string")
    out = bm25_topk(df, ["alpha", "beta"], k=3).collect()
    assert len(out) == 3
    # two-term docs outrank one-term docs; ties break on doc_id asc
    assert [r["doc_id"] for r in out] == [1, 3, 5]


def test_canonical_url_variant_invariance(spark):
    """canon(u) is identical across scheme/www/utm/fragment/trailing-
    slash variants of the same page, and canon is idempotent."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(200):
        host = f"h{rng.randrange(50)}.example.org"
        path = "/".join(f"s{rng.randrange(9)}" for _ in range(rng.randrange(1, 4)))
        qs = rng.choice(["", "?id=7", "?id=7&x=1"])
        base = f"{host}/{path}{qs}"
        variants = [
            f"https://{base}",
            f"http://{base}",
            f"https://www.{base}",
            f"https://{base}#sec{i}",
            (f"https://{host}/{path}?utm_source=a&"
             f"{qs[1:] if qs else 'utm_medium=b'}"),
        ]
        if not qs:  # trailing slash only merges when there's no query
            variants.append(f"https://{base}/")
        for v in variants:
            rows.append((i, v))
    df = spark.createDataFrame(rows, "grp int, url string")
    from sparktiles.operators.text import canonical_url
    out = df.select("grp", canonical_url(F.col("url")).alias("c"),
                    canonical_url(canonical_url(F.col("url"))).alias("cc"))
    agg = out.groupBy("grp").agg(
        F.count_distinct("c").alias("nc"),
        F.sum(F.when(F.col("c") == F.col("cc"), 0).otherwise(1)).alias("bad"))
    rows = agg.collect()
    assert all(r["nc"] == 1 for r in rows), [r for r in rows if r["nc"] != 1][:3]
    assert all(r["bad"] == 0 for r in rows)
