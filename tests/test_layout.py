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


def test_zorder_write_narrows_file_envelopes(spark, sf_dir, tmp_path):
    """Z-ordering on (user_id, value) must give parquet files whose
    min/max envelopes are narrow on BOTH columns — i.e. a point predicate
    on either column, using only file-level statistics, touches a small
    fraction of files. A single-column sort gets one column narrow and
    leaves the other full-range; z-order gets both."""
    import glob

    import pyarrow.parquet as pq

    from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.layout import zorder_write
    from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table

    events = table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def envelope_hit_fraction(path: str, col: str, probes: list[float]) -> float:
        spans = []
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            spans.append((lo, hi))
        hits = [sum(1 for lo, hi in spans if lo <= p <= hi) / len(spans) for p in probes]
        return sum(hits) / len(hits)

    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "sorted_one_col")
    zorder_write(events, zpath, ["user_id", "value"], num_files=8, bits=4)
    (
        events.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    stats = events.agg(
        F.expr("percentile(user_id, array(0.1,0.3,0.5,0.7,0.9))").alias("u"),
        F.expr("percentile(value, array(0.1,0.3,0.5,0.7,0.9))").alias("v"),
    ).collect()[0]
    u_probes, v_probes = list(stats.u), list(stats.v)

    # one-column sort: user_id pruned hard, value unprunable (every file
    # spans the full value range)
    assert envelope_hit_fraction(spath, "user_id", u_probes) <= 0.5
    assert envelope_hit_fraction(spath, "value", v_probes) >= 0.9
    # z-order: BOTH columns prunable from file stats
    zu = envelope_hit_fraction(zpath, "user_id", u_probes)
    zv = envelope_hit_fraction(zpath, "value", v_probes)
    assert zu <= 0.7, zu
    assert zv <= 0.7, zv
    # and no rows lost
    assert spark.read.parquet(zpath).count() == events.count()
