"""Sink layer: REST upsert/delete with retry + error accumulation, file
sinks (JSON/CSV/parquet), and the run report."""
