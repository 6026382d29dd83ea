"""Typed column profiling tests (operators/profile.py).

The oracle-checked q49e/q49h pin cross-engine parity on real tables; these
pin the per-type semantics on adversarial data: NULLs, blank strings,
type dispatch, the approx toggle, and top-k determinism under count ties.
"""

from __future__ import annotations

import datetime

import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.profile import (
    profile_columns,
    profile_columns_typed,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "alpha", 10.0, datetime.date(2020, 1, 1)),
        (2, "beta", 20.0, datetime.date(2020, 6, 15)),
        (3, "", None, datetime.date(2021, 3, 3)),
        (4, "   ", 40.0, None),
        (5, None, 50.0, datetime.date(2020, 1, 1)),
        (6, "beta", 60.0, datetime.date(2020, 1, 1)),
    ]
    return spark.createDataFrame(
        rows, "id bigint, name string, score double, d date"
    )


def _by_col(df):
    return {r["col"]: r.asDict() for r in df.collect()}


def test_string_column_stats(messy):
    p = _by_col(profile_columns_typed(messy, ["name"], top_k=2))["name"]
    assert p["n_rows"] == 6 and p["n_nonnull"] == 5
    assert p["ndv"] == 4  # 'alpha', 'beta', '', '   '
    assert p["null_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert p["blank_frac"] == pytest.approx(2 / 5, abs=1e-6)  # '' and '   '
    assert p["min_s"] == "" and p["max_s"] == "beta"
    assert p["min_num"] is None and p["p50"] is None
    # beta twice, then ties at 1 broken by value ascending ('' first)
    assert p["top_values"] == "beta:2|:1"


def test_temporal_and_integral_columns(messy):
    out = _by_col(profile_columns_typed(messy, ["d", "id"], top_k=3))
    d, i = out["d"], out["id"]
    assert d["min_s"] == "2020-01-01" and d["max_s"] == "2021-03-03"
    assert d["blank_frac"] is None and d["p50"] is None
    assert d["top_values"].startswith("2020-01-01:3")
    assert i["min_s"] == "1" and i["max_s"] == "6"
    assert i["min_num"] == 1.0 and i["max_num"] == 6.0
    assert i["p50"] == 3.5  # even count: interpolated median
    # all unique: ties broken by string value ascending
    assert i["top_values"] == "1:1|2:1|3:1"


def test_floating_column_has_no_string_stats(messy):
    p = _by_col(profile_columns_typed(messy, ["score"]))["score"]
    assert p["min_s"] is None and p["top_values"] is None
    assert p["min_num"] == 10.0 and p["max_num"] == 60.0
    assert p["n_nonnull"] == 5 and p["p50"] == 40.0


def test_approx_mode_within_tolerance(messy):
    exact = _by_col(profile_columns_typed(messy, ["id", "name"]))
    apx = _by_col(profile_columns_typed(messy, ["id", "name"], approx=True))
    for c in ("id", "name"):
        assert abs(apx[c]["ndv"] - exact[c]["ndv"]) <= max(
            1, 0.05 * exact[c]["ndv"]
        )
    # percentile_approx returns an ACTUAL value (no interpolation), so the
    # even-count median can differ by up to one inter-value gap
    assert abs(apx["id"]["p50"] - exact["id"]["p50"]) <= 1.0


def test_numeric_profile_approx_mode(messy):
    exact = {r["col"]: r.asDict() for r in profile_columns(messy, ["id"]).collect()}
    apx = {
        r["col"]: r.asDict()
        for r in profile_columns(messy, ["id"], approx=True).collect()
    }
    assert abs(apx["id"]["ndv"] - exact["id"]["ndv"]) <= max(
        1, 0.05 * exact["id"]["ndv"]
    )
    assert apx["id"]["min_v"] == exact["id"]["min_v"]
    assert apx["id"]["max_v"] == exact["id"]["max_v"]
    assert abs(apx["id"]["p50"] - exact["id"]["p50"]) <= 1.0


def test_unsupported_type_and_empty_cols_raise(messy):
    arr = messy.selectExpr("array(id) AS a")
    with pytest.raises(ValueError, match="unsupported"):
        profile_columns_typed(arr, ["a"])
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns_typed(messy, [])
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(messy, [])


def test_top_k_zero_gives_null_column(messy):
    p = _by_col(profile_columns_typed(messy, ["name"], top_k=0))["name"]
    assert p["top_values"] is None
    assert p["ndv"] == 4  # scalar stats still present
