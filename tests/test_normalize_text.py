"""normalize_text (operators/text.py) — rule-by-rule goldens plus
idempotence. Cross-engine parity lives in the generated oracle
(queries.py text_normalize, SQL built from the operator's own rule
tables). All specials are \\u escapes — raw mojibake/NBSP bytes in
source are exactly the ambiguity this operator exists to remove."""

from pyspark.sql import functions as F

RSQ_MOJI = "\u00e2\u20ac\u2122"      # E2 80 99 mis-decode of right quote
EACUTE_MOJI = "\u00c3\u00a9"         # C3 A9 mis-decode of e-acute
LDQ, RDQ = "\u201c", "\u201d"
ENDASH, EMDASH = "\u2013", "\u2014"
NBSP, ELLIPSIS = "\u00a0", "\u2026"
EACUTE = "\u00e9"


def _norm(spark, texts):
    from sparktiles.operators.text import normalize_text

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    return {r["doc_id"]: (r["norm_text"], r["changed"])
            for r in normalize_text(df).collect()}


def test_rule_goldens(spark):
    out = _norm(spark, [
        f"It{RSQ_MOJI}s fine",                  # mojibake ’ -> '
        f"{EACUTE_MOJI}lan",                    # mojibake é repaired
        f"{LDQ}q{RDQ} {ENDASH} {EMDASH} x",     # quote/dash fold
        f"a{NBSP}b",                            # NBSP -> space
        f"wait{ELLIPSIS}",                      # ellipsis -> ...
        "be\x07ll\x00",                         # controls stripped
        "  a \t b\t\t c  ",                     # whitespace collapse
        "untouched text",
    ])
    assert out[0] == ("It's fine", True)
    assert out[1] == (EACUTE + "lan", True)
    assert out[2] == ('"q" - - x', True)
    assert out[3] == ("a b", True)
    assert out[4] == ("wait...", True)
    assert out[5] == ("bell", True)
    assert out[6] == ("a b c", True)
    assert out[7] == ("untouched text", False)


def test_newlines_survive(spark):
    # C4 keeps line structure: \n and paragraph breaks are NOT
    # whitespace-collapsed (only space/tab runs are)
    out = _norm(spark, ["line one\nline  two\n\npara"])
    assert out[0][0] == "line one\nline two\n\npara"


def test_idempotent(spark):
    from sparktiles.operators.text import normalize_text

    texts = [f"It{RSQ_MOJI}s  {LDQ}ok{RDQ}{ELLIPSIS} \t x",
             "plain", "a  b"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    once = normalize_text(df)
    again = normalize_text(
        once.select(F.col("doc_id"), F.col("norm_text").alias("text")))
    a = {r["doc_id"]: r["norm_text"] for r in once.collect()}
    b = {r["doc_id"]: r["norm_text"] for r in again.collect()}
    assert a == b
    assert all(not r["changed"] for r in again.collect())
