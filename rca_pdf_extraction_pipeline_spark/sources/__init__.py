"""Sources: deterministic fixture generation, table loaders, and the
plan-B Iceberg-style table abstraction (parquet + snapshot manifest)."""
