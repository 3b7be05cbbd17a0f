"""Sources/sinks: parquet stage tables (Iceberg-ready layout) + testdata loaders."""
