"""Goldens for reference scalar functions (tests/sql/*.sql + expected/)."""

import pytest
from pyspark.sql import functions as F

from sparktiles.functions import scalars as S

# reference tests/sql/CleanNumeric.sql — (input, expected) pairs
CLEAN_NUMERIC_CASES = [
    (None, None), (".", None), ("", None), ("-", None), ("+", None),
    ("foobar", None), ("e", None), ("E", None), ("e2", None), ("E3", None),
    (".e", None), (".E", None), ("4e", None), ("5E", None), ("6.e", None),
    ("7.E", None), (".e8", None), (".E9", None), ("a10", None), ("11a", None),
    ("12", 12.0), ("14", 14.0), ("16", 16.0), ("18", 18.0), ("20", 20.0),
    ("22", 22.0), ("24", 24.0), ("  26   ", 26.0), ("28e29", 28e29),
    ("-3.5", -3.5), ("+.5", 0.5), ("1.", 1.0), ("1.5e-3", 0.0015),
]


def test_clean_numeric_goldens(spark):
    df = spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(CLEAN_NUMERIC_CASES)], "i int, s string"
    )
    rows = df.select(
        "i",
        S.clean_numeric("s").alias("v"),
        S.omt_as_numeric("s").alias("n"),
    ).orderBy("i").collect()
    for (inp, exp), r in zip(CLEAN_NUMERIC_CASES, rows):
        assert r.v == (pytest.approx(exp) if exp is not None else None), inp
        assert r.n == pytest.approx(-1.0 if exp is None else exp), inp


# reference tests/sql/omt_is_latin.sql semantics
IS_LATIN_CASES = [
    ("abc", True), ("ABC123", True), ("", True),
    ("café", True),                # Latin-1
    ("Ḁỿ", True),             # Latin Extended Additional
    ("á", True),                  # combining acute
    ("ə", True),                   # schwa
    ("ɐ", False),                  # 0x250 = 592 > 591 -> not latin
    ("ɠ", False),                  # 0x260 > 591, not allowed
    ("Москва", False), ("東京", False), ("abcШ", False),
    (None, None),
]


def test_is_latin(spark):
    for s, exp in IS_LATIN_CASES:
        assert S._is_latin_str(s) is exp or S._is_latin_str(s) == exp
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(IS_LATIN_CASES)], "i int, s string"
    )
    rows = df.select("i", S.omt_is_latin(F.col("s")).alias("v")).orderBy("i").collect()
    for (s, exp), r in zip(IS_LATIN_CASES, rows):
        assert r.v == exp, s


def test_remove_latin():
    assert S._remove_latin_str("Москва Moscow") == "Москва"
    assert S._remove_latin_str("abc") == ""
    assert S._remove_latin_str(None) is None
    # bracketed latin remnants are cleaned: "東京 (Tokyo)" -> "東京"
    assert S._remove_latin_str("東京 (Tokyo)") == "東京"


# reference tests/sql/delete_empty_keys.sql
def test_delete_empty_keys(spark):
    df = spark.createDataFrame(
        [
            (1, {"empty": ""}),
            (2, {"foo": "bar"}),
            (3, {"foo": "bar", "empty": ""}),
            (4, {"foo": "bar", "empty": "", "xx": "zz"}),
            (5, {"": "empty_key"}),
            (6, None),
        ],
        "i int, tags map<string,string>",
    )
    rows = {r.i: r.v for r in df.select("i", S.delete_empty_keys("tags").alias("v")).collect()}
    assert rows[1] == {}
    assert rows[2] == {"foo": "bar"}
    assert rows[3] == {"foo": "bar"}
    assert rows[4] == {"foo": "bar", "xx": "zz"}
    assert rows[5] == {"": "empty_key"}
    assert rows[6] is None


def test_slice_language_tags(spark):
    df = spark.createDataFrame(
        [(1, {"name": "X", "name:en": "Y", "name:de": "", "highway": "yes",
              "wikidata": "Q42", "int_name": "Z", "name:xx": "W"})],
        "i int, tags map<string,string>",
    )
    v = df.select(
        S.slice_language_tags("tags", ["en", "de"]).alias("v")
    ).first().v
    # name:de dropped (empty), highway dropped (not whitelisted),
    # name:xx dropped (xx not configured)
    assert v == {"name": "X", "name:en": "Y", "wikidata": "Q42", "int_name": "Z"}


def test_basic_names(spark):
    df = spark.createDataFrame(
        [
            (1, {"name": "Praha", "name:en": "Prague"}),
            (2, {"name": "Москва", "name:en": "Moscow"}),
            (3, {"name": "東京"}),
        ],
        "i int, tags map<string,string>",
    )
    rows = {r.i: r.v for r in df.select("i", S.get_basic_names("tags").alias("v")).collect()}
    # latin name kept as name:latin; name_int prefers name:en
    # (reference zzz_language.sql:101-106)
    assert rows[1] == {"name:latin": "Praha", "name_int": "Prague"}
    # nonlatin name -> latin from name:en, nonlatin preserved
    assert rows[2] == {"name:latin": "Moscow", "name:nonlatin": "Москва", "name_int": "Moscow"}
    # no latin source at all -> nonlatin only, name_int falls back to name
    assert rows[3] == {"name:nonlatin": "東京", "name_int": "東京"}


def test_label_grid_golden():
    # reference tests/expected/LabelGrid.sql.out
    assert S.label_grid_text(100.0, -100.0, 64 * 9.5546285343) == (
        "POINT(305.7481130976 -305.7481130976)"
    )
    assert S.label_grid_text(1.0, 1.0, 0) == "null"


def test_label_grid_exprs(spark):
    df = spark.createDataFrame([(100.0, -100.0)], "x double, y double")
    sx, sy = S.label_grid_exprs("x", "y", 64 * 9.5546285343)
    r = df.select(sx.alias("sx"), sy.alias("sy")).first()
    assert r.sx == pytest.approx(305.7481130976)
    assert r.sy == pytest.approx(-305.7481130976)


def test_line_label(spark):
    # reference tests/sql/LineLabel.sql: z14 'Foobar' on 300m line -> f; z15 -> t; point -> t
    df = spark.createDataFrame(
        [(14, "Foobar", 0.0), (14, "Foobar", 300.0), (15, "Foobar", 300.0),
         (21, "Foobar", 1.0), (14, "", 300.0)],
        "z int, label string, glen double",
    )
    rows = df.select(
        "z", "glen", S.line_label(F.col("z"), "label", "glen").alias("v")
    ).collect()
    got = [(r.z, r.glen, r.v) for r in rows]
    assert (14, 0.0, True) in got       # zero length -> point -> true
    assert (14, 300.0, False) in got    # 300/2^6 = 4.69 < 6
    assert (15, 300.0, True) in got     # 300/2^5 = 9.375 >= 6
    assert (21, 1.0, True) in got       # zoom > 20
    assert (14, 300.0, False) in got
