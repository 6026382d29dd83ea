"""File sinks: JSON / CSV / partitioned parquet writers.

Reference parity (SURVEY.md R23-R25):
  * per-entity JSON dump behind `output.data.to.dir`
    (/root/reference/banner-connector/src/main/java/org/edfi/sis/service/
    SisConnectorService.java:163-182 — one file per document, driver-side);
  * legacy CSV export (commented-out `process()`, :756-795).

Spark-first: executors write in parallel; a run-date partition column
replaces the reference's <date>/<time> directory convention so downstream
reads prune by partition. At 100 TB, partitioned parquet with a sane file
size is the difference between a usable lake and a million tiny files —
writers take a target partition count and repartition before the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_json_docs(
    df: DataFrame,
    path: str,
    *,
    run_date_col: str = "run_date",
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """JSON documents partitioned by run date (R24 semantics, set-level)."""
    out = df
    if run_date_col not in df.columns:
        out = out.withColumn(run_date_col, F.current_date().cast("string"))
    if num_files:
        out = out.repartition(num_files)
    out.write.mode(mode).partitionBy(run_date_col).json(path)


def write_csv(
    df: DataFrame, path: str, *, quote_all: bool = True, mode: str = "overwrite"
) -> None:
    """RFC4180-ish CSV export (R25; the reference's CSVFormat quoted all)."""
    df.write.mode(mode).option("header", True).option("quoteAll", quote_all).csv(path)


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str] | None = None,
    target_files_per_partition: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet lake writer. `target_files_per_partition`
    repartitions by the partition columns first so each output partition
    lands in a bounded number of files (small-files control at scale)."""
    out = df
    if partition_cols and target_files_per_partition:
        out = out.repartition(target_files_per_partition, *partition_cols)
    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_xml(
    df: DataFrame,
    path: str,
    *,
    row_tag: str = "row",
    root_tag: str = "rows",
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """XML export via Spark 4's built-in xml data source — the
    interchange format half the SIS/ERP world the reference integrates
    with still speaks (the reference's own Ed-Fi payloads are JSON, but
    Banner-era extract feeds are XML; this closes the format without a
    third-party package). Executors write in parallel, one <root_tag>
    document per output file, so `num_files` is the same small-files
    lever as the other writers."""
    out = df.repartition(num_files) if num_files else df
    (
        out.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def read_xml(
    spark,
    path: str,
    *,
    row_tag: str = "row",
    schema=None,
) -> DataFrame:
    """XML ingest (built-in source, schema inference unless a schema is
    pinned). Pin the schema in production: inference reads the data
    twice, and at 100 TB the second pass is the whole job."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
