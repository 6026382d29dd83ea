"""Mergeable quantile summary tests (operators/quantiles.py): the
provable rank-error bound, merge laws, and the exact prune+refine
order statistic — plus input validation edges."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.quantiles import (
    exact_quantiles_via_summary,
    quantile_summary,
    summary_merge,
    summary_quantile,
    summary_rank_bounds,
)


def _df(spark, values, parts=4):
    return (
        spark.createDataFrame([(float(v),) for v in values], "v double")
        .repartition(parts)
    )


def test_summary_accounting_and_rank_bounds(spark):
    # deterministic but unsorted input; exact ranks known in the driver
    vals = [((i * 37) % 1000) * 0.5 for i in range(1000)]
    df = _df(spark, vals)
    s = quantile_summary(df, "v", eps=0.05)
    assert s["n"] == 1000
    assert sum(w for _, w in s["points"]) == 1000
    svals = sorted(vals)
    for probe in [svals[0], svals[123], svals[500], svals[876], svals[-1]]:
        lo, hi = summary_rank_bounds(s, probe)
        true = sum(1 for x in vals if x <= probe)
        assert lo <= true <= hi


def test_summary_quantile_corrected_bound(spark):
    vals = [float((i * 7919) % 5000) for i in range(5000)]
    df = _df(spark, vals, parts=8)
    s = quantile_summary(df, "v", eps=0.02)
    svals = sorted(vals)
    max_w = max(w for _, w in s["points"])
    for phi in (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
        v = summary_quantile(s, phi)
        target = max(1, math.ceil(phi * len(vals)))
        true = sum(1 for x in vals if x <= v)
        # corrected bound: overshoot by up to the crossing point's weight
        assert target <= true <= target - 1 + s["slack"] + max_w


def test_merge_is_append_and_associative(spark):
    a = quantile_summary(_df(spark, range(0, 300)), "v", eps=0.1)
    b = quantile_summary(_df(spark, range(300, 500)), "v", eps=0.1)
    c = quantile_summary(_df(spark, range(500, 900)), "v", eps=0.1)
    m1 = summary_merge(summary_merge(a, b), c)
    m2 = summary_merge(a, summary_merge(b, c))
    assert m1 == m2
    assert m1["n"] == 900
    assert m1["slack"] == a["slack"] + b["slack"] + c["slack"]
    # merged summary still brackets exact ranks of the union
    for probe in (0.0, 123.0, 449.0, 899.0):
        lo, hi = summary_rank_bounds(m1, probe)
        assert lo <= probe + 1 <= hi  # values are 0..899, rank(v) = v+1


def test_exact_quantiles_via_summary_matches_sort(spark):
    vals = [((i * 613) % 2000) * 0.25 for i in range(2000)]
    df = _df(spark, vals, parts=8)
    got = exact_quantiles_via_summary(df, "v", [0.0, 0.3, 0.5, 0.9, 1.0], eps=0.05)
    svals = sorted(vals)
    for phi, x in got.items():
        target = max(1, math.ceil(phi * len(vals)))
        assert x == svals[target - 1]


def test_exact_quantiles_ties_and_nulls(spark):
    # heavy ties + nulls: nulls excluded, ties resolved by value semantics
    rows = [(1.0,)] * 50 + [(2.0,)] * 30 + [(None,)] * 10 + [(3.0,)] * 20
    df = spark.createDataFrame(rows, "v double").repartition(3)
    got = exact_quantiles_via_summary(df, "v", [0.5, 0.8, 0.81, 1.0], eps=0.1)
    assert got[0.5] == 1.0  # rank 50 of 100 non-null
    assert got[0.8] == 2.0  # rank 80
    assert got[0.81] == 3.0  # rank 81
    assert got[1.0] == 3.0


def test_grouped_summary_per_group_laws(spark):
    """One-pass grouped build: every group's summary independently
    satisfies accounting + rank-bound laws."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.quantiles import (
        quantile_summary_by,
    )

    rows = [(str(i % 3), float((i * 97) % 500)) for i in range(1500)]
    df = spark.createDataFrame(rows, "g string, v double").repartition(4)
    by = quantile_summary_by(df, "v", "g", eps=0.05)
    assert set(by) == {"0", "1", "2"}
    for g, s in by.items():
        vals = sorted(v for gg, v in rows if gg == g)
        assert s["n"] == len(vals)
        for probe in (vals[0], vals[len(vals) // 2], vals[-1]):
            lo, hi = summary_rank_bounds(s, probe)
            true = sum(1 for x in vals if x <= probe)
            assert lo <= true <= hi


def test_validation_errors(spark):
    df = _df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="eps"):
        quantile_summary(df, "v", eps=0.0)
    with pytest.raises(ValueError, match="empty"):
        summary_quantile({"points": [], "n": 0, "slack": 0}, 0.5)
    with pytest.raises(ValueError, match="phi"):
        summary_quantile({"points": [(1.0, 1)], "n": 1, "slack": 1}, 1.5)
    with pytest.raises(ValueError, match="phi"):
        exact_quantiles_via_summary(df, "v", [-0.1])
    empty = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError, match="no non-null"):
        exact_quantiles_via_summary(empty, "v", [0.5])


def test_exact_refine_fetch_is_bounded(spark):
    """The refine TakeOrdered fetches <= slack + max(w) rows — the
    driver-bounded contract that makes the prune+refine shape safe."""
    vals = [float(i) for i in range(5000)]
    df = _df(spark, vals, parts=8)
    s = quantile_summary(df, "v", eps=0.02)
    max_w = max(w for _, w in s["points"])
    # replicate the operator's prune walk for phi=0.9
    target = max(1, math.ceil(0.9 * s["n"]))
    t, acc = None, 0
    for v, w in s["points"]:
        acc += w
        if acc + s["slack"] < target:
            t = v
        else:
            break
    below = sum(1 for x in vals if x <= t) if t is not None else 0
    k = target - below
    assert 1 <= k <= s["slack"] + max_w
