"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of Ed-Fi-Exchange-OSS/Ed-Fi-X-TPDM-Data-Ingestion-POC.

The reference (surveyed in /root/repo/SURVEY.md) is a single-threaded Java
batch ETL job: JDBC scan -> column-map rename -> cast -> descriptor
enrichment -> nested document assembly -> REST upsert/delete reconciliation.
This engine re-expresses that surface — plus a full relational/streaming/
LLM-data-pipeline operator set — as idiomatic PySpark DataFrame programs
planned by Catalyst, designed for 100 TB scale (broadcast dims, AQE,
partitioned sources, no driver-side collects in the engine path).

Layout:
  session      SparkSession factory + engine config
  tables       test-table catalog (parquet at /root/testdata/<sf>/)
  operators/   semantic library: rename, cast, enrich, nest, reconcile,
               dedup (exact/minhash/simhash/jaccard), similarity, text
  sources/     JDBC (partitioned), REST paginated reader (OAuth), files
  sinks/       REST upsert/delete sink w/ retry, file sinks, run report
  streaming/   Structured Streaming windows, dedup, replay helpers
  queries/     the declared query surface (SURVEY.md §2.3 Q01–Q53),
               each paired with a DuckDB oracle SQL form
"""

__version__ = "0.1.0"
