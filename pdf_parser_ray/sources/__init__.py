"""Sources: parquet readers + deterministic synthetic page tables."""
