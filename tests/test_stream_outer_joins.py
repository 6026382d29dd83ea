"""Stream-stream outer-join family regression pins (VERDICT r16 #5).

Three things the driver's hash gate alone can't distinguish:

1. POPULATION PRESENCE — q296's hash would still match a hash-matched
   oracle if some population were empty in the data; assert the replay
   actually exercises matched pairs AND both unmatched flush paths.
2. BATCH EQUIVALENCE in-session — full/right outer results equal the
   same join run as a plain batch query on the events table.
3. THE PUSHDOWN TRAP — Catalyst pushes deterministic stream-side
   filters below EventTimeWatermark into the scan, so the type filter
   MUST include the __flush__ sentinel or each side's watermark caps at
   its own type's max and unmatched rows strand in state forever
   (q288's measured failure). Pin that the shared side-builder keeps
   the sentinel in both sides' filters.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries
from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table


def _run(name, spark, sf_dir):
    return all_queries()[name].build(spark, sf_dir).toPandas()


def _batch_join(spark, sf_dir, how: str):
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    cond = (
        (F.col("b_user") == F.col("a_user"))
        & (F.col("b_ts") >= F.col("a_ts") - F.expr("INTERVAL 300 SECOND"))
        & (F.col("b_ts") <= F.col("a_ts"))
    )
    joined = a.join(b, cond, how)
    # semi/anti joins emit only the left side's columns
    cols = ["a_id"] if how in ("leftSemi", "leftAnti") else ["a_id", "b_id"]
    return joined.select(*cols)


def test_full_outer_matches_batch_and_covers_all_populations(spark, sf_dir):
    out = _run("q296_stream_full_outer_join", spark, sf_dir)
    got = {
        (bool(r.has_purchase), bool(r.has_click)): (
            int(r.n_rows), int(r.n_purchases), int(r.n_clicks)
        )
        for r in out.itertuples()
    }
    ref_rows = (
        _batch_join(spark, sf_dir, "fullOuter")
        .groupBy(
            F.col("a_id").isNotNull().alias("hp"),
            F.col("b_id").isNotNull().alias("hc"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("a_id").alias("np"),
            F.countDistinct("b_id").alias("nc"),
        )
        .collect()
    )
    ref = {
        (bool(r.hp), bool(r.hc)): (int(r.n), int(r.np), int(r.nc))
        for r in ref_rows
    }
    assert got == ref
    # all three populations must actually occur, or the null-emission
    # machinery was never exercised by this data
    assert got[(True, True)][0] > 0
    assert got[(True, False)][0] > 0, "no watermark-flushed purchases"
    assert got[(False, True)][0] > 0, "no watermark-flushed clicks"


def test_right_outer_matches_batch_with_unmatched_clicks(spark, sf_dir):
    out = _run("q297_stream_right_outer_join", spark, sf_dir)
    got = {
        bool(r.matched): (int(r.n_rows), int(r.n_clicks))
        for r in out.itertuples()
    }
    ref_rows = (
        _batch_join(spark, sf_dir, "rightOuter")
        .groupBy(F.col("a_id").isNotNull().alias("m"))
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("b_id").alias("nc"))
        .collect()
    )
    ref = {bool(r.m): (int(r.n), int(r.nc)) for r in ref_rows}
    assert got == ref
    assert got[False][0] > 0, "no watermark-flushed unmatched clicks"


def test_side_builder_keeps_sentinel_in_both_filters(spark, sf_dir):
    """The pushdown trap pin: each side's type filter (which Catalyst
    will push below the watermark node) must include the __flush__
    sentinel, or the side's watermark caps at its own type's max and
    unmatched rows never flush. Checked on the logical plans of the
    shared side-builder so a 'simplified' filter fails here, not as a
    silent hang of three driver queries."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries.streaming_q import (
        _stream_join_sides,
    )

    a, b, _ = _stream_join_sides(spark, sf_dir)
    for side, typ in ((a, "purchase"), (b, "click")):
        plan = side._jdf.queryExecution().analyzed().toString()
        assert "__flush__" in plan, plan
        assert typ in plan, plan


def test_semi_join_matches_batch_exists(spark, sf_dir):
    """q299: the streamed semi join equals the batch EXISTS — count and
    membership endpoints — and emits each qualified purchase once."""
    out = _run("q299_stream_semi_join", spark, sf_dir)
    assert len(out) == 1
    ref = (
        _batch_join(spark, sf_dir, "leftSemi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("a_id").alias("lo"),
            F.max("a_id").alias("hi"),
        )
        .first()
    )
    row = out.iloc[0]
    assert (int(row.n_qualified), int(row.first_id), int(row.last_id)) == (
        int(ref["n"]), int(ref["lo"]), int(ref["hi"])
    )
    assert int(row.n_qualified) > 0
