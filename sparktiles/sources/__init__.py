"""Sources & sinks: synthetic Common-Crawl-style page corpus
(deterministic, generated with column math — no driver-side data),
parquet table IO with snapshot manifests (Iceberg stand-in in this
sandbox), mbtiles-normalized tile store."""
