"""build_report must aggregate counts AND the error sample in one action.

The outcome DataFrame is side-effecting (every partition execution replays
the sink's HTTP calls — ADVICE round 1: the error-path second collect
re-POSTed and re-DELETEd everything), so the error path is pinned here with
an execution counter: one build_report call = exactly one execution of the
sink lineage.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.report import build_report


def _outcomes_with_side_effect(spark, marker_dir: str):
    """Outcome-schema DataFrame whose materialization appends one marker
    file per execution (stand-in for 'every run re-fires HTTP calls')."""
    base = spark.range(10).select(
        F.when(F.col("id") < 7, F.lit("upsert")).otherwise(F.lit("delete")).alias("op"),
        F.col("id").cast("string").alias("key"),
        (F.col("id") % 3 != 0).alias("ok"),
        F.when(F.col("id") % 3 == 0, F.lit(500)).alias("status"),
        F.when(F.col("id") % 3 == 0, F.lit("boom")).alias("error"),
    )

    def mark(iterator):
        import uuid

        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w") as f:
            f.write("x")
        yield from iterator

    return base.repartition(1).mapInPandas(mark, base.schema)


def test_error_path_counts_and_sample_one_execution(spark):
    marker_dir = tempfile.mkdtemp(prefix="report-exec-")
    report = build_report(_outcomes_with_side_effect(spark, marker_dir))

    # ids 0,3,6,9 are errors (ok=false); 0,3,6 are upserts, 9 is a delete
    assert report.error_count == 4
    assert report.upsert_count == 4  # ids 1,2,4,5 ok upserts
    assert report.delete_count == 2  # ids 7,8 ok deletes
    assert len(report.errors) == 4
    assert all("HTTP 500 boom" in e for e in report.errors)

    # the crux: counts + error sample came from ONE execution of the sink
    assert len(os.listdir(marker_dir)) == 1


def test_error_sample_bounded(spark):
    marker_dir = tempfile.mkdtemp(prefix="report-bound-")
    report = build_report(
        _outcomes_with_side_effect(spark, marker_dir), max_errors=2
    )
    assert report.error_count == 4
    assert len(report.errors) == 2
