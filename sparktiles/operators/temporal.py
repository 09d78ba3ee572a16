"""Temporal joins over event streams.

asof_join — the kdb/TimescaleDB/pandas merge_asof operator Spark has
no built-in for: for every probe row, the most recent build row with
build.ts <= probe.ts on the same key. The Spark-first shape is the
union trick, not a range join: tag both sides, union on an aligned
schema, and take last(value, ignorenulls) over a (key) window ordered
by (ts, side) with build rows sorting BEFORE probe rows at equal
timestamps (at-or-before semantics). That is ONE shuffle on the key
and a partition-local sort — a range join would rewrite into an
O(n*m) interval product or force a broadcast; the window form scales
with per-key event counts and is exactly how production Spark
pipelines implement as-of.

The cross-engine oracle (queries.py asof_join_events) checks this
window construction against DuckDB's NATIVE `ASOF LEFT JOIN` operator
— two genuinely independent implementations of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(probes: DataFrame, builds: DataFrame, on: str = "user_id",
              ts_col: str = "ts", value_cols: tuple = ("value",),
              dedup_builds: bool = True) -> DataFrame:
    """Backward (at-or-before) as-of join.

    Returns every probe row's columns plus `asof_ts` and one
    `asof_<c>` per value column (null when no build row precedes).

    dedup_builds=True collapses build rows sharing (key, ts) to their
    MAX per value column first — without it, equal-timestamp build
    duplicates would make "the" most recent row nondeterministic (the
    same reason the oracle pre-aggregates its build side)."""
    if dedup_builds:
        builds = builds.groupBy(on, ts_col).agg(
            *[F.max(c).alias(c) for c in value_cols])

    probe_cols = probes.columns
    b = builds.select(
        F.col(on), F.col(ts_col).alias("_ts"), F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_bv_{c}") for c in value_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(f"_p_{c}")
          for c in probe_cols if c != on])
    p = probes.select(
        F.col(on), F.col(ts_col).alias("_ts"), F.lit(1).alias("_side"),
        *[F.lit(None).cast(builds.schema[c].dataType).alias(f"_bv_{c}")
          for c in value_cols],
        *[F.col(c).alias(f"_p_{c}") for c in probe_cols if c != on])
    u = b.unionByName(p)

    w = (Window.partitionBy(on).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn(
        "asof_ts",
        F.last(F.when(F.col("_side") == 0, F.col("_ts")),
               ignorenulls=True).over(w))
    for c in value_cols:
        matched = matched.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(f"_bv_{c}")),
                   ignorenulls=True).over(w))
    return (matched.where(F.col("_side") == 1)
            .select(on,
                    *[F.col(f"_p_{c}").alias(c)
                      for c in probe_cols if c != on],
                    "asof_ts",
                    *[F.col(f"asof_{c}") for c in value_cols]))
