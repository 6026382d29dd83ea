"""Storage layout for scale: bucketed tables (co-located joins) and
partitioned directories (static + dynamic partition pruning).

The reference has no storage layout at all — it materializes every query
into driver memory (Dao.java:42-74). At 100 TB the layout IS the
optimization:

  * bucketing pre-shuffles a table ONCE at write time; every later join or
    aggregation on the bucket key runs shuffle-free (each task reads one
    bucket from each side). A daily 100 TB fact joined nightly against a
    bucketed snapshot amortizes its shuffle across every downstream run;
  * directory partitioning turns predicates on the partition column into
    file listing (static pruning), and — via dynamic partition pruning —
    turns a selective dim-side filter into fact-side pruning at runtime.

Both are declarative writer options; Catalyst and the scan planner do the
rest. tests/test_layout.py pins the resulting plan shapes (zero Exchange
for bucketed joins, PartitionFilters / dynamicpruning for pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write df as a bucketed (optionally bucket-sorted) parquet table.

    Joins/aggregations keyed on bucket_cols between tables bucketed with
    the SAME num_buckets skip their Exchange entirely; sort_cols
    additionally lets SortMergeJoin skip its per-task Sort. num_buckets
    should be sized like shuffle partitions at the target scale (e.g.
    4096 for a 100 TB fact), NOT to the test corpus.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write df as a directory-partitioned parquet dataset.

    Partition columns should be low-cardinality and predicate-bearing
    (run date, region, event type): each distinct value is a directory, so
    a filter on it prunes whole directories before any IO. High-cardinality
    keys belong in bucketing, not partitioning (a 10M-directory dataset
    breaks every file listing).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog-table scan: picks up bucketing metadata (the bucketed-join
    fast path only applies to catalog tables, not bare parquet paths)."""
    return spark.table(table)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    target_file_bytes: int = 128 << 20,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a fragmented parquet dataset into
    ceil(total_bytes / target_file_bytes) files; returns the file count.

    Streaming sinks and incremental loads accumulate kilobyte files whose
    per-file open/footer cost eventually dominates scans (a 100 TB table
    in 1 MB files is 100M opens). Sizing uses the Hadoop FileSystem API so
    the same code compacts local, HDFS, or object-store paths. `coalesce`
    (not repartition) merges partitions without a shuffle — compaction is
    IO-bound; adding an exchange would double the data movement.
    """
    import math

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = path.getFileSystem(hconf)
    it = fs.listFiles(path, True)
    total = 0
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            total += status.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(in_path)
    df.coalesce(n_files).write.mode(mode).parquet(out_path)
    return n_files


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    num_files: int = 8,
    bits: int = 4,
) -> None:
    """Z-order (Morton-curve) clustered parquet write: multi-column
    data-skipping layout.

    Directory partitioning prunes on ONE column; sorting prunes on one
    column's row-group min/max. Z-ordering interleaves the bit patterns of
    several columns' rank bins so that a range-partitioned write on the
    z-value yields files whose min/max envelopes are narrow on EVERY
    clustered column — point/range predicates on any of them skip most
    files via plain parquet statistics (the same layout trick Delta/
    Iceberg OPTIMIZE ZORDER applies).

    Scale shape: per column one approxQuantile sketch (driver gets only
    2^bits cut points); the bin mapping and bit interleave are pure JVM
    expressions; the only data movement is the single repartitionByRange
    on the z-value that any clustered rewrite needs.
    """
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("cols must be non-empty")
    nbins = 1 << bits
    probs = [i / nbins for i in range(1, nbins)]
    work = df
    bin_cols = []
    for j, c in enumerate(cols):
        cuts = df.approxQuantile(c, probs, 0.001)
        # equi-depth bin id via when-chain over the (2^bits - 1) cut points
        expr = F.lit(0)
        for cut in cuts:
            expr = expr + F.when(F.col(c) > F.lit(cut), 1).otherwise(0)
        bname = f"__bin_{j}"
        work = work.withColumn(bname, expr.cast("long"))
        bin_cols.append(bname)
    k = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, bname in enumerate(bin_cols):
            bit = F.shiftright(F.col(bname), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * k + j)
    (
        work.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *bin_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
