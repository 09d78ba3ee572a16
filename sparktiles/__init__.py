"""sparktiles — a PySpark-native spatial-join + vector-tiling engine.

From-scratch re-expression of the query semantics and data-processing
capabilities of openmaptiles/openmaptiles-tools (reference snapshot at
/root/reference, 2025-10-17) on Spark DataFrames:

- schema-driven layer pipelines (tileset -> layers -> fields)
- tile-pyramid generation z0-z14 with empty-tile imputation and
  content-hash dedup (mbtiles `map`/`images` normalization)
- zoom-dependent clipping / simplification / buffer semantics
- per-layer MVT (Mapbox Vector Tile) assembly via Arrow-batched
  grouped pandas UDFs
- cell-indexed spatial joins (point-in-polygon, tile assignment, kNN)
- web-page geoparse front-end over an Iceberg/parquet corpus of
  (url, warc_ts, html, text, lang) rows

Everything is DataFrame-first: Catalyst handles pruning/pushdown/AQE;
custom code is confined to vectorized pandas/Arrow kernels (geometry,
MVT protobuf) and explicit plan shapes (cell equi-join, impute loop).
"""

__version__ = "0.1.0"

from sparktiles.session import get_spark  # noqa: F401
