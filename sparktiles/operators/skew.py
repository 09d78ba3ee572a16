"""Skew utilities: salted two-phase aggregation + hot-key detection.

SURVEY §4: 'salted-key repartition for hot cells — AQE skew-join
handles the join side, salting handles the groupBy side'. Use for
aggregations over cell/tile keys where a handful of keys (coastal or
urban cells, the synthetic hot city) hold orders of magnitude more rows
than the median.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 32,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups by (keys + salt) — the hot
    key's rows spread over `salt_buckets` reducers — phase 2 merges the
    partials by the real keys (tiny). aggs: output_col -> one of
    'count'|'sum:col'|'min:col'|'max:col'.

    The salt derives from a high-cardinality column when given (stable),
    else from a per-row hash of the whole key tuple + monotonic id.
    """
    salt = (
        F.pmod(F.xxhash64(salt_col), F.lit(salt_buckets))
        if salt_col
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial_aggs = []
    final_aggs = []
    for out, spec in aggs.items():
        if spec == "count":
            partial_aggs.append(F.count("*").alias(f"_p_{out}"))
            final_aggs.append(F.sum(f"_p_{out}").alias(out))
        else:
            op, col = spec.split(":", 1)
            partial_aggs.append(getattr(F, op)(col).alias(f"_p_{out}"))
            merge = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            final_aggs.append(merge(f"_p_{out}").alias(out))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def hot_keys(df: DataFrame, keys: list[str], threshold_ratio: float = 100.0,
             sample_fraction: float | None = None) -> DataFrame:
    """Keys whose row count exceeds threshold_ratio x the median key
    count (diagnostic feeding salting decisions / density caps).
    Optionally computed on a sample for very large inputs."""
    base = df.sample(sample_fraction) if sample_fraction else df
    counts = base.groupBy(*keys).agg(F.count("*").alias("cnt"))
    med = counts.agg(F.expr("percentile_approx(cnt, 0.5)").alias("m")).first()["m"]
    return counts.where(F.col("cnt") >= F.lit(float(med) * threshold_ratio))
