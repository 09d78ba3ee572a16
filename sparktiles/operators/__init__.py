"""Spark operators: cell-indexed spatial joins, MVT layer/tile
aggregation, tile-pyramid builders (impute/multiplier/copier), stats,
dedup/ANN/text-pipeline operators."""
