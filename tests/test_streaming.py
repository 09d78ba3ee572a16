"""Structured Streaming surface tests (memory sink + availableNow)."""

import pytest
from pyspark.sql import functions as F

from sparktiles.sources.pages import generate_pages
from sparktiles.streaming.jobs import (
    streaming_lang_totals,
    streaming_page_stats,
    streaming_retile,
)


@pytest.fixture(scope="module")
def page_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    generate_pages(spark, 500).write.mode("overwrite").parquet(str(d / "p"))
    return str(d / "p")


def test_streaming_page_stats(spark, page_dir):
    agg = streaming_page_stats(spark, page_dir, window="24 hours")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("pstats").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM pstats")
    total = out.agg(F.sum("n_pages")).first()[0]
    assert total == 500
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert "en" in langs and len(langs) >= 4


def test_streaming_retile(spark, page_dir, tmp_path):
    store = str(tmp_path / "stream_store")
    q = streaming_retile(spark, page_dir, store, maxzoom=6).start()
    q.awaitTermination(180)
    out = spark.read.parquet(f"{store}/expired_tiles")
    # every mention landed in exactly one z6 tile group
    n = out.agg(F.sum("n_features")).first()[0]
    from sparktiles.sources.geoparse import build_features
    exp = build_features(spark.read.parquet(page_dir)).count()
    assert n == exp
    assert out.where(F.col("z") != 6).count() == 0


def test_streaming_stateful_lang_totals(spark, page_dir):
    q = (streaming_lang_totals(spark, page_dir)
         .writeStream.outputMode("update").format("memory")
         .queryName("ltotals").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT lang, MAX(total_pages) AS total FROM ltotals GROUP BY lang")
    total = out.agg(F.sum("total")).first()[0]
    assert total == 500
