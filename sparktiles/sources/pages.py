"""Deterministic synthetic web-page corpus (input_hint schema).

Generates an Iceberg-shaped table of Common-Crawl-style pages
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
entirely with Catalyst column expressions over spark.range — fully
distributed, no Python RNG, byte-identical for a given (n_pages, seed).
That determinism IS the per-row invariant the engine must preserve:
sha256(text) per url is checked end-to-end in tests (input_hint:
"byte-identical extracted text per url").

Corpus shape (FIXTURES.md §1 generator notes):
- ~5% of pages mention no place at all
- long-tail multi-mention pages (1..12 mentions) for skew
- a "hot city" (place_id 0) absorbs ~20%% of all mentions so one
  z-cell is hot — exercises salting / AQE skew handling
- place mentions are embedded in the text as `Name_<pid> (lat; lon)`
  with 5-decimal coordinates, which geoparse.extract_features parses
  back out; place coordinates are arithmetic functions of place_id
  (deterministic, irrational-ish offsets keep them off tile borders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_PLACES = 10_000
LANGS = ["en", "de", "cs", "fr", "es", "ru", "ja", "zh"]


def place_lon_expr(pid):
    """Deterministic place longitude in (-180, 180); irrational-ish
    fraction keeps points off tile boundaries at every zoom."""
    p = pid.cast("double")
    return ((p * 37.0 + p * p * 0.001) % 352.0) - 176.0 + 0.1234567


def place_lat_expr(pid):
    """Deterministic place latitude in (-72, 72) (inside web-mercator)."""
    p = pid.cast("double")
    return ((p * 13.0 + p * p * 0.0007) % 142.0) - 71.0 + 0.0891011


def generate_pages(
    spark: SparkSession, n_pages: int, seed: int = 42,
    n_places: int | None = None,
) -> DataFrame:
    """Build the pages corpus: url, warc_ts, html, text, lang.

    n_places defaults to max(10_000, n_pages // 10) so place diversity
    grows with corpus size (a fixed place pool would make every tile a
    hot key at large n_pages, which is not how a web corpus behaves —
    the deliberate hot city remains place_id 0 at ~20%% of mentions).
    """
    n_places = n_places or max(N_PLACES, n_pages // 10)
    df = spark.range(n_pages).withColumnRenamed("id", "page_id")
    pid_base = (F.col("page_id") * F.lit(2654435761) + F.lit(seed)) % F.lit(2**31)

    # mention count: 0 for ~5%, else 1..3 typical, long tail to 12
    m = (
        F.when(F.col("page_id") % 20 == 0, F.lit(0))
        .when(F.col("page_id") % 31 == 0, F.lit(12))
        .when(F.col("page_id") % 7 == 0, F.lit(4))
        .otherwise((pid_base % 3 + 1).cast("int"))
    )

    # mention i of page -> place id; ~20% of mentions hit hot place 0
    def place_id(i):
        h = (pid_base + i * F.lit(977)) % F.lit(n_places * 5)
        return F.when(h % 5 == 0, F.lit(0)).otherwise((h % F.lit(n_places)).cast("long"))

    def mention_str(i):
        pid = place_id(i)
        lon = place_lon_expr(pid)
        lat = place_lat_expr(pid)
        return F.format_string(
            "Name_%d (%.5f; %.5f)", pid, lat, lon
        )

    filler = F.format_string(
        "page %d talks about the web and cites source %d. ",
        F.col("page_id"), pid_base % 1000,
    )
    mentions = F.transform(
        F.sequence(F.lit(0), m - 1), lambda i: mention_str(i)
    )
    text = F.when(m == 0, filler).otherwise(
        F.concat(filler, F.array_join(mentions, " near "), F.lit(" ."))
    )

    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (pid_base % len(LANGS) + 1).cast("int")
    )
    return df.select(
        F.format_string("https://example.org/%d/%d", F.lit(seed), F.col("page_id")).alias("url"),
        (F.lit(1577836800) + F.col("page_id") % 31536000).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.format_string("<html><body>%s</body></html>", text), "utf-8"
        ).alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
