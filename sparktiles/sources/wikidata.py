"""Synthetic wd_names lookup source (S11 / import-wikidata analog).

The reference harvests wikidata ids from hstore tables (DISTINCT union
filtered by /^Q[1-9][0-9]{0,18}$/, bin/import-wikidata:242-257), fetches
labels from WDQS in 5000-id batches (utils.py:216-227 batching), and
stores wd_names(id varchar PK, labels hstore). No external data is
allowed here, so the "service" is a deterministic label generator; the
id-harvest, batching shape, and cache-miss (left_anti) logic are real.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

WD_ID_RE = "^Q[1-9][0-9]{0,18}$"


def harvest_wikidata_ids(tagged_tables: list[DataFrame], tags_col: str = "tags") -> DataFrame:
    """DISTINCT union of tags->'wikidata' across feature tables,
    validity-filtered (A12/O2)."""
    ids = [
        t.select(F.element_at(F.col(tags_col), "wikidata").alias("id"))
        .where(F.col("id").isNotNull())
        for t in tagged_tables
    ]
    return reduce(DataFrame.unionByName, ids).where(F.col("id").rlike(WD_ID_RE)).distinct()


def uncached_ids(ids: DataFrame, cache: DataFrame) -> DataFrame:
    """Only fetch ids not already cached (O8: set-difference,
    import-wikidata:99) — left_anti join."""
    return ids.join(cache.select(F.col("id")), "id", "left_anti")


def batch_ids(ids: DataFrame, batch_size: int = 5000,
              shards: int = 64, approx_n: int | None = None) -> DataFrame:
    """Group ids into fetch batches of at most `batch_size` (the WDQS
    5000-id POST batching, import-wikidata:151): batch_no + packed id
    array. Sharded numbering — ids hash into `shards` independent
    shards, each shard windows locally (no global single-task sort);
    batch_no = shard * 2^32 + local batch. Deterministic, every batch
    <= batch_size, parallelism = `shards` regardless of id count.

    Shard count adapts to the id count so a small id set (e.g. 1000
    ids) yields ONE full batch, not `shards` tiny trailing batches
    (each shard emits a partial tail — request count matters against
    the 5000-id POST contract). Pass `approx_n` when the caller already
    knows it; otherwise a bounded limit+count probe (scans at most
    shards*batch_size+1 rows) right-sizes the shard count."""
    if approx_n is None:
        approx_n = ids.limit(shards * batch_size + 1).count()
    if approx_n <= shards * batch_size:
        shards = max(1, -(-approx_n // batch_size))
    shard = F.pmod(F.xxhash64("id"), F.lit(shards))
    w = Window.partitionBy("_shard").orderBy("id")
    local = F.floor((F.row_number().over(w) - 1) / batch_size)
    return (
        ids.withColumn("_shard", shard)
        .withColumn("batch_no", F.col("_shard") * F.lit(1 << 32) + local)
        .groupBy("batch_no")
        .agg(F.collect_list("id").alias("ids"), F.count("*").alias("n"))
    )


def synthetic_labels(spark: SparkSession, ids: DataFrame,
                     languages: list[str] = ("en", "de", "cs")) -> DataFrame:
    """Deterministic stand-in for the WDQS response: labels map keyed
    name:<lang>. Exact wd_names schema (sql/zzz_language.sql:122-125)."""
    pairs = []
    for lang in languages:
        pairs += [F.lit(f"name:{lang}"),
                  F.concat(F.lit(f"{lang.upper()} label "), F.col("id"))]
    return ids.select("id", F.create_map(*pairs).alias("labels"))
