"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: sf0.001 documents -> synthetic page corpus ->
                 geoparse -> z0-z4 tile pyramid -> per-zoom tile stats.
queries()      — one callable per implemented operator (SURVEY.md §2),
                 defined in sparktiles/queries.py.
oracle_sql()   — matching DuckDB SQL (ANSI) per query; entries without
                 SQL get the driver's weaker rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build a z0-z4 tile pyramid from pages derived from the
    sf0.001 documents table; return per-zoom tile statistics."""
    import tempfile

    from sparktiles.sources.geoparse import build_features
    from sparktiles.plans.config import FieldDef, LayerDef, TilesetDef
    from sparktiles.plans.pipeline import BuildConfig, TileBuild, make_point_layer_frames

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # deterministic page corpus from documents: embed one place mention
    # per ~200 chars of text, derived from doc_id (no external data)
    pid = (F.col("doc_id") * 7 + 1) % 10000
    lon = ((pid * 37).cast("double") % 344) - 172.0 + 0.1234567
    lat = ((pid * 13).cast("double") % 136) - 68.0 + 0.0891011
    mention = F.format_string("Name_%d (%.5f; %.5f)", pid, lat, lon)
    pages = docs.select(
        F.format_string("https://example.org/doc/%d", F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.concat(F.col("text"), F.lit(" "), mention), "utf-8").alias("html"),
        F.concat(F.col("text"), F.lit(" "), mention).alias("text"),
        F.col("lang"),
    )
    feats = build_features(pages)
    tileset = TilesetDef(
        name="flagship",
        layers=[LayerDef(id="place", fields=[FieldDef("name")], buffer_size=8)],
        minzoom=0, maxzoom=4,
    )
    frames = make_point_layer_frames(feats, tileset)
    store = tempfile.mkdtemp(prefix="sparktiles_entry_")
    build = TileBuild(spark, frames, BuildConfig(
        store_dir=store, minzoom=0, maxzoom=4, mid_zoom=2))
    build.build_fast()
    tm = build.read_tile_map()
    imgs = build.read_tile_images()
    return (
        tm.join(imgs, "tile_id")
        .groupBy("zoom_level")
        .agg(
            F.count("*").alias("n_tiles"),
            F.countDistinct("tile_id").alias("n_unique"),
            F.sum(F.length("tile_data")).alias("bytes"),
        )
        .orderBy("zoom_level")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparktiles.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sparktiles.queries import ORACLES

    return dict(ORACLES)
