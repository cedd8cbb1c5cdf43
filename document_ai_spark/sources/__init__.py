"""Sources: deterministic synthetic corpus + parquet table readers."""
