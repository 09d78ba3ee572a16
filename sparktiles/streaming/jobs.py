"""Structured Streaming jobs over the page corpus.

The reference has no stream processing (SURVEY §2.10) — these are the
engine's forward-looking streaming surface for the same corpus shape:

- streaming_page_stats: watermark + tumbling-window page counts per
  lang (late data tolerated up to the watermark)
- streaming_retile: foreachBatch incremental re-tiling — each
  micro-batch geoparses the new pages, computes their expired tiles,
  and MERGEs fresh map rows (exactly-once per epoch via foreachBatch)
- streaming_session_mentions: applyInPandasWithState custom stateful
  operator — accumulates per-url mention counts across micro-batches
- streaming_dedup: watermark-bounded content dedup for crawl ingest
  (dropDuplicatesWithinWatermark over md5(text) — bounded state)
- streaming_bloom_dedup: cross-crawl dedup of the ingest stream
  against a STANDING corpus's bounded Bloom sketch (map-only probe;
  only the flagged slice enters the exact rescue join)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def streaming_page_stats(spark: SparkSession, path: str,
                         window: str = "1 hour", watermark: str = "2 hours"):
    """readStream(pages) -> watermarked tumbling-window counts/lang."""
    pages = spark.readStream.schema(PAGE_SCHEMA).parquet(path)
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count("*").alias("n_pages"),
             F.sum(F.length("text")).alias("chars"))
    )


def streaming_retile(spark: SparkSession, path: str, store_dir: str,
                     maxzoom: int = 8):
    """foreachBatch incremental tiler: per micro-batch, geoparse the new
    pages and append their tile assignments (the batch-incremental
    execution of the reference's expired-tiles flow)."""
    from sparktiles.sources.geoparse import build_features
    from sparktiles.operators.pyramid import assign_point_tiles

    pages = spark.readStream.schema(PAGE_SCHEMA).parquet(path)

    def process(batch_df: DataFrame, epoch_id: int):
        feats = build_features(batch_df)
        assigned = assign_point_tiles(feats, maxzoom, 0.0)
        (assigned.groupBy("z", "x", "y")
         .agg(F.count("*").alias("n_features"))
         .withColumn("epoch", F.lit(epoch_id))
         .write.mode("append").parquet(f"{store_dir}/expired_tiles"))

    return pages.writeStream.foreachBatch(process).trigger(availableNow=True)


_STATE_SCHEMA = StructType([StructField("total", LongType())])
_OUT_SCHEMA = StructType([
    StructField("lang", StringType()),
    StructField("total_pages", LongType()),
])


def _accumulate(key, pdfs, state: GroupState):
    total = state.get[0] if state.exists else 0
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"lang": [key[0]], "total_pages": [total]})


def streaming_lang_totals(spark: SparkSession, path: str):
    """applyInPandasWithState: running per-lang page totals across
    micro-batches (custom stateful operator surface)."""
    pages = spark.readStream.schema(PAGE_SCHEMA).parquet(path)
    return (
        pages.groupBy("lang")
        .applyInPandasWithState(
            _accumulate, _OUT_SCHEMA, _STATE_SCHEMA,
            "update", GroupStateTimeout.NoTimeout)
    )


def streaming_dedup(spark: SparkSession, path: str,
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming ingest dedup: drop re-crawled pages whose content md5
    was already seen within the watermark horizon. The streaming twin
    of operators/text.py exact_dedup — the state store holds one
    16-byte hash per distinct page (never the text), and
    dropDuplicatesWithinWatermark lets Spark evict state older than
    the event-time watermark, so unbounded crawl streams run with
    bounded state (a plain dropDuplicates would grow forever).
    """
    pages = spark.readStream.schema(PAGE_SCHEMA).parquet(path)
    return (
        pages.withColumn("content_hash", F.md5("text"))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def streaming_bloom_dedup(spark: SparkSession, path: str,
                          standing: DataFrame, text_col: str = "text",
                          m_bits: int = 1 << 20, k: int = 4) -> DataFrame:
    """Cross-crawl streaming dedup against a STANDING corpus — the
    streaming twin of operators/sketch.py::bloom_dedup_incremental
    (streaming_dedup above handles within-stream re-crawls; this
    handles "already in last year's curated corpus").

    The standing corpus is summarized ONCE at job start into the
    bounded Bloom bitmap (<= m_bits/8 bytes however large the corpus)
    and broadcast; every micro-batch is flagged by the same
    vectorized map-only probe as the batch op. Zero false negatives
    means no standing duplicate ever survives; the false-positive
    slice is rescued by an exact md5 stream-static left join that
    ONLY the flagged rows enter — the unflagged stream (the vast
    majority of a fresh crawl) is unioned back without touching any
    join, so per micro-batch the shuffle-side work is
    O(fp_rate x batch + true dups), not O(batch). At 10^12 standing
    docs the `seen` side is a bucketed hash table; the sketch's job
    is exactly to keep the probe side of that join tiny.
    """
    from sparktiles.operators.sketch import (bloom_probe_flag,
                                             bloom_sketch_bitmap)

    bitmap = bloom_sketch_bitmap(standing, text_col, m_bits, k)
    seen = standing.select(F.md5(text_col).alias("_seen_h")).distinct()

    pages = spark.readStream.schema(PAGE_SCHEMA).parquet(path)
    flagged = bloom_probe_flag(pages, bitmap, text_col, m_bits, k,
                               flag_col="_maybe")
    fresh = flagged.where(~F.col("_maybe")).drop("_maybe")
    rescued = (
        flagged.where(F.col("_maybe"))
        .withColumn("_h", F.md5(text_col))
        .join(seen, F.col("_h") == F.col("_seen_h"), "left")
        .where(F.col("_seen_h").isNull())
        .drop("_maybe", "_h", "_seen_h")
    )
    return fresh.unionByName(rescued)
