"""Sources/sinks: corpus readers, embedding-store parquet I/O, OpenIE cache."""
