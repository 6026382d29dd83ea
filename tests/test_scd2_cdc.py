"""Incremental SCD2 CDC-apply (operators/scd.py apply_scd2_batch /
Scd2Store): the incremental merge of an ordered change feed must be
row-identical to rebuilding with merge_scd2 on the full feed — including
ts ties that straddle a micro-batch boundary (tiebreak order), keys with
no base row (inserts), and base keys the feed never touches.
"""

from __future__ import annotations

import datetime

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.scd import (
    Scd2Store,
    apply_scd2_batch,
    merge_scd2,
)


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    base = spark.createDataFrame(
        [(1, "a0"), (2, "b0"), (3, "c0")], "key bigint, val string"
    )
    # key 1: changes in batches 1 and 2, with a ts TIE across the boundary
    # (seq is the tiebreak); key 2: never changes; key 4: feed-only insert
    feed = [
        (1, _ts(1), "a1", 10),
        (4, _ts(2), "d1", 11),
        (1, _ts(5), "a2", 12),  # tie with next row, earlier seq
        (1, _ts(5), "a3", 13),  # tie, later seq -> later version
        (4, _ts(6), "d2", 14),
        (1, _ts(9), "a4", 15),
    ]
    changes = spark.createDataFrame(
        feed, "key bigint, ts timestamp, val string, seq bigint"
    )
    return base, changes, feed


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )


def test_incremental_equals_rebuild_with_boundary_tie(spark):
    base, changes, feed = _frames(spark)
    expected = merge_scd2(
        base, changes, keys=["key"], ts_col="ts", attr_cols=["val"],
        tiebreak=["seq"],
    )

    # split between the two tied rows: (ts=5, seq=12) | (ts=5, seq=13)
    batches = [feed[:3], feed[3:5], feed[5:]]
    store = Scd2Store(
        base, keys=["key"], attr_cols=["val"], ts_col="ts", tiebreak=["seq"]
    )
    for rows in batches:
        store.apply(
            spark.createDataFrame(
                rows, "key bigint, ts timestamp, val string, seq bigint"
            )
        )
    got = store.history()
    assert got.columns == expected.columns
    assert _sorted_rows(got) == _sorted_rows(expected)


def test_apply_semantics_single_batch(spark):
    base, changes, _ = _frames(spark)
    store = Scd2Store(
        base, keys=["key"], attr_cols=["val"], ts_col="ts", tiebreak=["seq"]
    )
    store.apply(changes)
    h = {(r.key, r.val): r for r in store.history().collect()}
    # untouched base key stays open
    assert h[(2, "b0")].is_current == 1 and h[(2, "b0")].valid_to is None
    # touched base key closed at its first change
    assert h[(1, "a0")].is_current == 0 and h[(1, "a0")].valid_to == _ts(1)
    # feed-only key: versions exist, last one open
    assert h[(4, "d2")].is_current == 1
    assert h[(4, "d1")].valid_to == _ts(6)
    # tied versions ordered by the tiebreak
    assert h[(1, "a2")].valid_to == _ts(5)  # closed by its tie sibling
    assert h[(1, "a3")].valid_to == _ts(9)


def test_empty_batch_is_identity(spark):
    base, changes, _ = _frames(spark)
    store = Scd2Store(
        base, keys=["key"], attr_cols=["val"], ts_col="ts", tiebreak=["seq"]
    )
    before = _sorted_rows(store.history())
    empty = changes.limit(0)
    after = _sorted_rows(
        apply_scd2_batch(
            store.history(), empty, ["key"], "ts", ["val"], ["seq"]
        )
    )
    assert before == after


def test_scd2_intervals_are_tz_free(spark):
    """r15 hostile-TZ sweep regression: merge_scd2's interval endpoints
    must be TIMESTAMP_NTZ — a TZ-ful TimestampType round-trips the
    1900 base epoch through the session zone's HISTORICAL rules (e.g.
    Asia/Kathmandu 1900 = LMT +5:41:16) and shifts endpoints by
    seconds relative to any naive-timestamp engine. Pin the type and
    the exact base-epoch wall clock."""
    import datetime

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.scd import (
        asof_snapshot,
        merge_scd2,
    )

    base = spark.createDataFrame([(1, 10.0)], "key bigint, val double")
    ch = spark.createDataFrame(
        [(1, 11.0, datetime.datetime(2024, 1, 2, 3, 4, 5), 1)],
        "key bigint, val double, ts timestamp_ntz, event_id bigint",
    )
    hist = merge_scd2(
        base, ch, keys=["key"], ts_col="ts", attr_cols=["val"],
        tiebreak=["event_id"],
    )
    types = dict(hist.dtypes)
    assert types["valid_from"] == "timestamp_ntz", types
    assert types["valid_to"] == "timestamp_ntz", types
    rows = {(r.val): r for r in hist.collect()}
    assert rows[10.0].valid_from == datetime.datetime(1900, 1, 1)
    assert rows[10.0].valid_to == datetime.datetime(2024, 1, 2, 3, 4, 5)
    snap = asof_snapshot(hist, "2024-01-01 00:00:00").collect()
    assert len(snap) == 1 and snap[0].val == 10.0
