"""Bounded-sketch membership — Bloom-filter incremental dedup.

The cross-crawl dedup pattern (Dolma's Bloom-filter dedup, Soldaini et
al. 2024; also the classic Bloom 1970 shape): a STANDING corpus that
has already been curated is summarized once into a fixed-size bit
sketch, and every NEW crawl batch is checked against that sketch
map-side — no join against the standing corpus's 10^12 rows, ever.
The sketch admits false positives at a chosen rate and ZERO false
negatives, so an exact content-hash rescue join over only the flagged
docs (sparse by construction) removes the FPs.

Reference parity: the reference repo has no counterpart (its dedup is
per-tile SQL DISTINCT); this is part of the training-data curation
family layered on the same engine, the incremental twin of
``operators/text.py::exact_dedup`` in the way
``streaming/incremental.py`` is the incremental twin of the full tile
build.

Scale shape (100 TB standing / fresh crawl batches):

* Sketch build: ONE map-side pass over the standing corpus computing
  k portable bit positions per doc, then a distinct on position —
  bounded by ``m_bits`` rows (2^27 bits = 16 MiB as a bitmap) no
  matter the corpus size. This is the IVF-centroid / LM-vocab
  "bounded collect" pattern: the only thing that crosses to the
  driver is the sketch itself.
* Probe: the packed bitmap is broadcast (torrent broadcast at cluster
  scale) and the batch is flagged by a vectorized Arrow UDF — map
  ONLY, zero exchanges on the batch side, cost ∝ batch bytes.
* Rescue: exact md5 semi-join of flagged docs (target FP rate × batch
  + true dups) against the standing hash table — the Bloom filter's
  job is exactly to shrink this join's probe side by orders of
  magnitude.

Portability: positions use the repo's md5-integer idiom —
``conv(substr(md5(i || text), 1, 15), 16, 10) % m_bits`` — the low 60
bits of a seeded md5, non-negative, so DuckDB reproduces every
position (and therefore every flag) exactly:
``('0x' || substr(md5(i || text), 1, 15))::BIGINT % m_bits``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves stringified hints here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 4


def bloom_positions(col: Column, m_bits: int = DEFAULT_M_BITS,
                    k: int = DEFAULT_K) -> Column:
    """k portable bit positions for a value as an array<long> column.

    Same seeding idiom as ``minhash_signatures`` (hash_i = md5(i||s)):
    independent hash functions by prefixing the decimal seed.
    """
    return F.array(*[
        F.conv(F.substring(F.md5(F.concat(F.lit(str(i)), col)), 1, 15),
               16, 10).cast("long") % m_bits
        for i in range(k)
    ])


def bloom_bit_table(df: DataFrame, text_col: str = "text",
                    m_bits: int = DEFAULT_M_BITS,
                    k: int = DEFAULT_K) -> DataFrame:
    """The standing corpus's sketch as a DataFrame of DISTINCT set bit
    positions — ≤ m_bits rows regardless of corpus size. The distinct
    is the build's only exchange, map-side-combined by Spark, and its
    output is the bounded object everything downstream consumes."""
    return (
        df.select(F.explode(
            bloom_positions(F.col(text_col), m_bits, k)).alias("pos"))
        .distinct()
    )


def bloom_sketch_bitmap(df: DataFrame, text_col: str = "text",
                        m_bits: int = DEFAULT_M_BITS,
                        k: int = DEFAULT_K) -> np.ndarray:
    """Materialize the sketch as a packed uint8 bitmap (m_bits/8
    bytes). Bounded collect: ≤ m_bits longs cross to the driver once
    (Arrow path — position tables in the millions land in seconds);
    the bitmap is what gets broadcast. At cluster scale the same
    bound holds per the sketch property; a mapPartitions bitmap-OR
    reduce is the constant-memory alternative if even the position
    table is unwelcome on the driver."""
    pos = (bloom_bit_table(df, text_col, m_bits, k)
           .toPandas()["pos"].to_numpy(dtype=np.int64))
    bm = np.zeros(m_bits >> 3, dtype=np.uint8)
    np.bitwise_or.at(bm, pos >> 3, np.left_shift(
        np.uint8(1), (pos & 7).astype(np.uint8)))
    return bm


def bloom_probe_flag(batch: DataFrame, bitmap: np.ndarray,
                     text_col: str = "text",
                     m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                     flag_col: str = "maybe_dup") -> DataFrame:
    """Append `flag_col`: true iff ALL k of the doc's positions are set
    in `bitmap`. Map-only — the positions are JVM column math and the
    bit lookup is one vectorized Arrow batch op; nothing shuffles."""
    spark = batch.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def probe(pos_lists: pd.Series) -> pd.Series:
        if len(pos_lists) == 0:
            return pd.Series([], dtype=bool)
        bm = bc.value
        flat = np.concatenate(pos_lists.to_numpy())  # (n*k,) int64
        hit = (bm[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1
        return pd.Series(hit.reshape(-1, k).all(axis=1))

    return batch.withColumn(
        flag_col, probe(bloom_positions(F.col(text_col), m_bits, k)))


def bloom_dedup_incremental(standing: DataFrame, batch: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            m_bits: int = DEFAULT_M_BITS,
                            k: int = DEFAULT_K,
                            verify: bool = True) -> DataFrame:
    """Incremental exact-dedup of a fresh batch against a standing
    corpus: (id_col, maybe_dup, is_dup) per batch doc.

    maybe_dup — the doc's k sketch positions are all set (Bloom hit:
    every true dup is flagged, FP rate ≈ fill_ratio^k).
    is_dup — maybe_dup AND the content hash really exists in standing
    (the rescue join runs over flagged docs only). With verify=False,
    is_dup is null and no standing-side join runs at all.
    """
    bitmap = bloom_sketch_bitmap(standing, text_col, m_bits, k)
    flagged = bloom_probe_flag(batch, bitmap, text_col, m_bits, k)
    out = flagged.select(id_col, text_col, "maybe_dup")
    if not verify:
        return out.select(id_col, "maybe_dup",
                          F.lit(None).cast("boolean").alias("is_dup"))
    hashes = standing.select(F.md5(F.col(text_col)).alias("_h")).distinct()
    hits = (
        out.where(F.col("maybe_dup"))
        .select(id_col, F.md5(F.col(text_col)).alias("_h"))
        .join(hashes, "_h", "left_semi")
        .select(F.col(id_col), F.lit(True).alias("_hit"))
    )
    return (
        out.join(hits, id_col, "left")
        .select(id_col, "maybe_dup",
                F.coalesce(F.col("_hit"), F.lit(False)).alias("is_dup"))
    )
