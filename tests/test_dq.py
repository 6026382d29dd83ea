"""Data-quality rule engine (operators/dq.py) and SCD2 as-of snapshot
(operators/scd.py::asof_snapshot) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.dq import Rule, check_rules
from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.scd import (
    asof_snapshot,
    merge_scd2,
)


@pytest.fixture()
def child(spark):
    return spark.createDataFrame(
        [
            (1, 10, 5.0),
            (2, 10, -1.0),
            (3, 99, 2.0),  # 99 has no parent
            (4, None, 3.0),  # null key: skipped by FK, caught by not-null
            (4, 10, 0.0),  # duplicate id 4; amount 0 violates > 0
        ],
        "id long, pkey long, amount double",
    )


@pytest.fixture()
def parent(spark):
    return spark.createDataFrame([(10,), (20,)], "k long")


def _by_rule(df):
    return {r["rule"]: r.asDict() for r in df.collect()}


def test_row_unique_and_fk_rules(spark, child, parent):
    got = _by_rule(
        check_rules(
            child,
            [
                Rule("amount_positive", violation=F.col("amount") <= 0),
                Rule("pkey_not_null", violation=F.col("pkey").isNull()),
                Rule("id_unique", unique_col="id"),
                Rule("pkey_fk", fk=(parent, "pkey", "k")),
            ],
        )
    )
    assert got["amount_positive"] == {
        "rule": "amount_positive", "n_checked": 5, "n_violations": 2, "ok": 0,
    }
    assert got["pkey_not_null"]["n_violations"] == 1
    assert got["id_unique"]["n_violations"] == 1  # id 4 twice
    # FK checks only non-null keys: 4 checked, one orphan (99)
    assert got["pkey_fk"] == {
        "rule": "pkey_fk", "n_checked": 4, "n_violations": 1, "ok": 0,
    }


def test_all_green_and_empty_table(spark, parent):
    clean = spark.createDataFrame([(1, 10), (2, 20)], "id long, pkey long")
    got = _by_rule(
        check_rules(
            clean,
            [
                Rule("id_unique", unique_col="id"),
                Rule("pkey_fk", fk=(parent, "pkey", "k")),
            ],
        )
    )
    assert all(v["ok"] == 1 and v["n_violations"] == 0 for v in got.values())

    empty = clean.filter(F.lit(False))
    got = _by_rule(
        check_rules(empty, [Rule("id_pos", violation=F.col("id") < 0)])
    )
    # sum() over empty is NULL -> normalized to 0 violations, ok
    assert got["id_pos"] == {
        "rule": "id_pos", "n_checked": 0, "n_violations": 0, "ok": 1,
    }


def test_bad_rule_sets_raise(spark, child, parent):
    with pytest.raises(ValueError, match="non-empty"):
        check_rules(child, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_rules(
            child,
            [Rule("r", unique_col="id"), Rule("r", unique_col="pkey")],
        )
    with pytest.raises(ValueError, match="payload"):
        check_rules(child, [Rule("r")])


def test_asof_snapshot_picks_one_version_per_key(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    changes = spark.createDataFrame(
        [
            (1, "2024-01-10 00:00:00", "a2"),
            (1, "2024-01-20 00:00:00", "a3"),
            (3, "2024-01-12 00:00:00", "c1"),  # insert-only key
        ],
        "k long, ts string, v string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    hist = merge_scd2(base, changes, keys=["k"], ts_col="ts", attr_cols=["v"])

    mid = {r["k"]: r["v"] for r in asof_snapshot(hist, "2024-01-15 00:00:00").collect()}
    assert mid == {1: "a2", 2: "b", 3: "c1"}

    early = {r["k"]: r["v"] for r in asof_snapshot(hist, "2024-01-01 00:00:00").collect()}
    assert early == {1: "a", 2: "b"}  # key 3 not yet inserted

    late = {r["k"]: r["v"] for r in asof_snapshot(hist, "2024-02-01 00:00:00").collect()}
    assert late == {1: "a3", 2: "b", 3: "c1"}

    # exactly one row per key at any instant
    cnt = asof_snapshot(hist, "2024-01-12 00:00:00").groupBy("k").count()
    assert cnt.filter(F.col("count") > 1).count() == 0
