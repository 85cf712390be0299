"""Source connectors: parquet table scan, binary-file directory scan."""
