"""Sources: deterministic synthetic image+caption table, polygon layers,
and loaders for the driver's TPC-H-ish parquet tables."""
