"""Trigger-mode equivalence (round-2 verdict ask #5): the same streaming
plan replayed under Trigger.ProcessingTime (production continuous trigger)
and Trigger.AvailableNow (bounded backfill) must produce identical results
— per-micro-batch state evolution is trigger-independent when both walk
the same file list with maxFilesPerTrigger=1.

The reference has no streaming (SURVEY.md §2.3); these pin the engine's
Spark-native extension semantics for q44 (tumbling window) and q48
(stateful cross-batch dedup).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.streaming.replay import (
    events_replay_dir,
    read_replay_stream,
    run_to_memory,
    run_to_memory_processing_time,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_processing_time_equals_available_now_tumbling(spark, sf_dir):
    """q44 shape: windowed count over a 3-micro-batch replay (state carries
    across triggers) — complete-mode result identical under both triggers."""
    replay = events_replay_dir(spark, sf_dir, layout="thirds")

    def agg():
        ev = read_replay_stream(spark, replay)
        return (
            ev.groupBy(F.window("ts", "5 minutes"), "event_type")
            .count()
            .select(
                F.unix_timestamp("window.start").alias("w_start"),
                "event_type",
                F.col("count").alias("n"),
            )
        )

    now = run_to_memory(agg(), output_mode="complete")
    pt = run_to_memory_processing_time(agg(), output_mode="complete")
    assert _rows(pt) == _rows(now)
    assert now.count() > 0


def test_processing_time_equals_available_now_dedup(spark, sf_dir):
    """q48 shape: dropDuplicates state must suppress the second delivery of
    the whole table whether batches arrive on a clock or on AvailableNow."""
    replay = events_replay_dir(spark, sf_dir, layout="dup")

    def dedup():
        return read_replay_stream(spark, replay).dropDuplicates(["event_id"])

    now = run_to_memory(dedup(), output_mode="append")
    pt = run_to_memory_processing_time(dedup(), output_mode="append")
    n_now, n_pt = now.count(), pt.count()
    assert n_now == n_pt and n_now > 0
    a = now.agg(F.sum("event_id").alias("s"), F.count(F.lit(1)).alias("n")).first()
    b = pt.agg(F.sum("event_id").alias("s"), F.count(F.lit(1)).alias("n")).first()
    assert tuple(a) == tuple(b)
