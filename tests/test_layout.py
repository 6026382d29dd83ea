"""Storage-layout plan tests: bucketed co-located joins and partition
pruning (sinks/layout.py). These pin the layout-level scale levers that
don't show up in per-query plans: a bucketed join must run with ZERO
exchanges, a partition filter must prune directories before IO, and a
selective dim filter must prune fact partitions at runtime (DPP)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.plans import audit, plan_string
from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.layout import (
    read_table,
    write_bucketed,
    write_partitioned,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table


@pytest.fixture()
def no_broadcast(spark):
    """Force non-broadcast joins so the shuffle-elimination is attributable
    to bucketing, not to the tiny test corpus fitting a broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path, no_broadcast):
    """customer ⋈ orders on custkey, both bucketed by the key with the same
    bucket count: the join plan has NO Exchange — each task reads bucket i
    of both tables. At 100 TB this is the nightly-join fast path: the
    shuffle is paid once at write time, amortized over every later join."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(
        c, "bkt_customer", bucket_cols=["c_custkey"], num_buckets=4,
        sort_cols=["c_custkey"], path=str(tmp_path / "bkt_customer"),
    )
    write_bucketed(
        o, "bkt_orders", bucket_cols=["o_custkey"], num_buckets=4,
        sort_cols=["o_custkey"], path=str(tmp_path / "bkt_orders"),
    )
    try:
        joined = read_table(spark, "bkt_customer").join(
            read_table(spark, "bkt_orders"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        facts = audit(joined)
        assert facts.joins >= 1
        assert facts.exchanges == 0, plan_string(joined)
        # same rows as the unbucketed join
        plain = c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_customer")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_agg_is_shuffle_free(spark, sf_dir, tmp_path):
    """groupBy on the bucket key needs no exchange either — partial and
    final aggregation collapse into one stage per bucket."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(
        o, "bkt_orders_agg", bucket_cols=["o_custkey"], num_buckets=4,
        path=str(tmp_path / "bkt_orders_agg"),
    )
    try:
        agg = (
            read_table(spark, "bkt_orders_agg")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("s"))
        )
        assert audit(agg).exchanges == 0, plan_string(agg)
        assert agg.count() == o.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders_agg")


def test_static_partition_pruning(spark, sf_dir, tmp_path):
    """A filter on the partition column becomes directory pruning: the scan
    reports a PartitionFilters entry and reads only matching files."""
    e = table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(e, path, partition_cols=["event_type"])
    one_type = e.select("event_type").first()[0]
    back = spark.read.parquet(path).filter(F.col("event_type") == one_type)
    text = plan_string(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", text)
    assert m and "event_type" in m.group(1), text
    expected = e.filter(F.col("event_type") == one_type).count()
    assert back.count() == expected


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: a selective filter on the dim side prunes fact partitions at
    runtime — the fact scan carries a dynamicpruning subquery on the
    partition column instead of reading every partition."""
    o = table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_prio")
    write_partitioned(o, path, partition_cols=["o_orderpriority"])
    fact = spark.read.parquet(path)
    dim = (
        o.select("o_orderpriority").distinct()
        .withColumn("hot", F.col("o_orderpriority").startswith("1"))
    )
    joined = fact.join(dim, "o_orderpriority").filter(F.col("hot"))
    text = plan_string(joined)
    assert re.search(r"dynamicpruning", text, re.IGNORECASE), text
    expected = o.filter(F.col("o_orderpriority").startswith("1")).count()
    assert joined.count() == expected


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """64 tiny files -> the computed file count, content preserved, and the
    rewrite plan is shuffle-free (coalesce, no Exchange)."""
    import glob

    from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.layout import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    spark.range(0, 10_000).selectExpr("id", "id * 2 AS v").repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/part-*.parquet")) == 64

    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    files = glob.glob(dst + "/part-*.parquet")
    assert len(files) == n == 1  # tiny table -> one file

    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b
