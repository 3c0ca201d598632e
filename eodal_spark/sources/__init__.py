"""Source adapters: synthetic pages generator, TPC-H-ish parquet loaders,
and the parquet-backed snapshot catalog (Iceberg-shaped)."""
