"""Incremental / streaming ingestion (SURVEY §2.10).

The reference's incremental model is diff batches (imposm applies OSM
changefiles, emits expired-tile lists at z14, tile_multiplier expands,
generate-tiles list-scheme regenerates — bin/import-diff:16-23 +
bin/tile_multiplier:24-54). Spark mapping: batch jobs over new source
snapshots (or Structured Streaming with Trigger.AvailableNow), tile
invalidation identical to T5, MERGE-style upsert into the tile store.
"""
