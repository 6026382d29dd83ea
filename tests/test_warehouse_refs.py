"""Third-engine differential tests for the round-13/14 warehouse idioms
(queries/relational.py q219-q232 block): independent pandas reference
implementations straight off the parquet fixtures, so a shared SQL
misconception between the Spark plan and its DuckDB twin (both written
by the same author) cannot certify itself — the same rationale as
test_stats_queries.py for the statistics family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries

_SPECS = all_queries()


def _run(name: str, spark, sf_dir: str) -> pd.DataFrame:
    return _SPECS[name].build(spark, sf_dir).toPandas()


def _t(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def test_trailing_window_spend_matches_range_frame(spark, sf_dir):
    o = _t(sf_dir, "orders").copy()
    o["day"] = (
        o["o_orderdate"] - pd.Timestamp("1970-01-01")
    ) // pd.Timedelta(days=1)
    out = _run("qz230_trailing_window_spend", spark, sf_dir).set_index(
        "orderkey"
    )
    assert len(out) == len(o)
    # spot-check 50 orders incl. same-day peers (RANGE frame semantics:
    # every same-customer order within [day-29, day] counts, including
    # same-day rows "after" the current one)
    sample = o.sample(50, random_state=7) if len(o) > 50 else o
    for _, r in sample.iterrows():
        w = o[
            (o["o_custkey"] == r["o_custkey"])
            & (o["day"] >= r["day"] - 29)
            & (o["day"] <= r["day"])
        ]
        row = out.loc[r["o_orderkey"]]
        assert row["n_30d"] == len(w)
        assert abs(row["spend_30d"] - round(w["o_totalprice"].sum(), 2)) < 1e-6


def test_relational_division_covers_all_regions(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    c = _t(sf_dir, "customer")
    n = _t(sf_dir, "nation")
    r = _t(sf_dir, "region")
    j = (
        li[
            (li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-02-01"))
        ]
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(r, left_on="n_regionkey", right_on="r_regionkey")
    )
    cov = j.groupby("l_suppkey")["r_regionkey"].nunique()
    expected = set(cov[cov == r["r_regionkey"].nunique()].index)

    out = _run("qz231_relational_division", spark, sf_dir)
    assert set(out["suppkey"]) == expected


def test_universal_priority_quantifier(spark, sf_dir):
    o = _t(sf_dir, "orders")
    hi = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    g = o.groupby("o_custkey").agg(
        n=("o_orderkey", "size"), spend=("o_totalprice", "sum")
    )
    nhi = o[hi].groupby("o_custkey").size().reindex(g.index, fill_value=0)
    expected = g[(g["n"] >= 2) & (g["n"] == nhi)]

    out = _run("qz232_universal_priority", spark, sf_dir).set_index("custkey")
    assert set(out.index) == set(expected.index)
    for ck, row in out.iterrows():
        assert row["n_orders"] == expected.loc[ck, "n"]
        assert abs(row["spend"] - round(expected.loc[ck, "spend"], 2)) < 1e-6


def test_min_cost_supplier_keeps_ties(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    s = _t(sf_dir, "supplier")
    n = _t(sf_dir, "nation")
    r = _t(sf_dir, "region")
    p = _t(sf_dir, "part")
    eu = s.merge(n, left_on="s_nationkey", right_on="n_nationkey").merge(
        r[r["r_name"] == "EUROPE"],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )
    pp = p[(p["p_size"].between(10, 15)) & (p["p_type"] == "PROMO")]
    j = li.merge(eu[["s_suppkey"]], left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(pp[["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
    j["uc"] = j["l_extendedprice"] / j["l_quantity"]
    ec = (
        j.groupby(["l_partkey", "l_suppkey"])["uc"]
        .min()
        .round(6)
        .reset_index()
    )
    best = ec.groupby("l_partkey")["uc"].transform("min")
    winners = ec[ec["uc"] == best]

    out = _run("qz220_min_cost_supplier", spark, sf_dir)
    got = set(zip(out["partkey"], out["suppkey"]))
    ref = set(zip(winners["l_partkey"], winners["l_suppkey"]))
    assert got == ref
    uc = out.set_index(["partkey", "suppkey"])["unit_cost"]
    wref = winners.set_index(["l_partkey", "l_suppkey"])["uc"]
    for key, v in uc.items():
        assert abs(v - wref.loc[key]) < 1e-6


def test_large_volume_orders_top20(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    c = _t(sf_dir, "customer")
    sq = li.groupby("l_orderkey")["l_quantity"].sum()
    big = sq[sq > 150]
    j = (
        big.rename("sq")
        .reset_index()
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
    )
    j["tp"] = j["o_totalprice"].round(2)
    ref = j.sort_values(
        ["tp", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(20)

    out = _run("qz227_large_volume_orders", spark, sf_dir)
    assert list(out["orderkey"]) == list(ref["o_orderkey"])
    assert np.allclose(out["totalprice"], ref["tp"], atol=0.011)
    assert list(out["total_qty"]) == [int(x) for x in ref["sq"]]


def test_waiting_suppliers_sole_late_multi_supplier(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    s = _t(sf_dir, "supplier")
    j = li.merge(
        o[o["o_orderstatus"] == "F"][["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    j["late"] = (
        j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=60)
    ).astype(int)
    ns = j.groupby("l_orderkey")["l_suppkey"].nunique()
    nl = (
        j[j["late"] == 1].groupby("l_orderkey")["l_suppkey"].nunique()
    ).reindex(ns.index, fill_value=0)
    ok_orders = ns.index[(ns > 1) & (nl == 1)]
    hits = j[(j["late"] == 1) & j["l_orderkey"].isin(ok_orders)]
    counts = (
        hits.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .groupby("s_name")
        .size()
        .rename("numwait")
        .reset_index()
        .sort_values(
            ["numwait", "s_name"], ascending=[False, True], kind="mergesort"
        )
        .head(25)
    )

    out = _run("qz229_waiting_suppliers", spark, sf_dir)
    assert list(out["name"]) == list(counts["s_name"])
    assert list(out["numwait"]) == list(counts["numwait"])


def test_market_share_conditional_ratio(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    c = _t(sf_dir, "customer")
    n = _t(sf_dir, "nation")
    r = _t(sf_dir, "region")
    s = _t(sf_dir, "supplier")
    p = _t(sf_dir, "part")
    j = (
        li.merge(
            o[
                (o["o_orderdate"] >= pd.Timestamp("1996-01-01"))
                & (o["o_orderdate"] < pd.Timestamp("1998-01-01"))
            ],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(
            n.add_prefix("cn_"),
            left_on="c_nationkey",
            right_on="cn_n_nationkey",
        )
        .merge(
            r[r["r_name"] == "AMERICA"],
            left_on="cn_n_regionkey",
            right_on="r_regionkey",
        )
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(
            n.add_prefix("sn_"),
            left_on="s_nationkey",
            right_on="sn_n_nationkey",
        )
        .merge(
            p[p["p_type"] == "ECONOMY"],
            left_on="l_partkey",
            right_on="p_partkey",
        )
    )
    j["vol"] = j["l_extendedprice"] * (1 - j["l_discount"])
    j["yr"] = j["o_orderdate"].dt.year

    out = _run("qz221_market_share", spark, sf_dir).set_index("yr")
    for yr, grp in j.groupby("yr"):
        nat = grp.loc[grp["sn_n_name"] == "NATION_3", "vol"].sum()
        row = out.loc[yr]
        assert row["n_lines"] == len(grp)
        assert abs(row["share"] - round(nat / grp["vol"].sum(), 4)) < 1e-6


def test_important_parts_group_share_threshold(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    s = _t(sf_dir, "supplier")
    n = _t(sf_dir, "nation")
    j = li.merge(s, left_on="l_suppkey", right_on="s_suppkey").merge(
        n[n["n_name"] == "NATION_7"],
        left_on="s_nationkey",
        right_on="n_nationkey",
    )
    v = j.groupby("l_partkey")["l_quantity"].sum()
    ref = v[v > v.sum() * 0.002]

    out = _run("qz223_important_parts", spark, sf_dir).set_index("partkey")
    assert set(out.index) == set(ref.index)
    for pk, row in out.iterrows():
        assert row["vol"] == int(ref.loc[pk])


def test_small_qty_revenue_correlated_avg(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    p = _t(sf_dir, "part")
    pa = li.groupby("l_partkey")["l_quantity"].agg(["count", "sum"])
    j = li.merge(
        p[p["p_brand"] == "Brand#3"][["p_partkey"]],
        left_on="l_partkey",
        right_on="p_partkey",
    ).merge(pa, left_on="l_partkey", right_index=True)
    # l_quantity < 0.2 * avg == qty * 5 * cnt < sum (integer-safe form)
    hits = j[j["l_quantity"] * 5.0 * j["count"] < j["sum"]]

    out = _run("qz226_small_qty_revenue", spark, sf_dir).iloc[0]
    assert out["n_lines"] == len(hits)
    assert (
        abs(out["avg_weekly"] - round(hits["l_extendedprice"].sum() / 7.0, 2))
        < 1e-6
    )


def test_promo_suppliers_semi_join_chain(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    p = _t(sf_dir, "part")
    s = _t(sf_dir, "supplier")
    n = _t(sf_dir, "nation")
    r = _t(sf_dir, "region")
    red = li[
        (li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))
    ].merge(
        p[p["p_name"].str.startswith("red")][["p_partkey"]],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    q = red.groupby("l_suppkey")["l_quantity"].sum()
    qualified = set(q[q > 40].index)
    eu = s.merge(n, left_on="s_nationkey", right_on="n_nationkey").merge(
        r[r["r_name"] == "EUROPE"],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )
    expected = sorted(set(eu["s_suppkey"]) & qualified)

    out = _run("qz228_promo_suppliers", spark, sf_dir)
    assert list(out["suppkey"]) == expected


def test_forecast_revenue_band_filter(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    hits = li[
        (li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    ]
    out = _run("qz219_forecast_revenue", spark, sf_dir).iloc[0]
    assert out["n_lines"] == len(hits)
    assert (
        abs(
            out["revenue_delta"]
            - round((hits["l_extendedprice"] * hits["l_discount"]).sum(), 2)
        )
        < 1e-6
    )


def test_product_profit_nation_year(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    p = _t(sf_dir, "part")
    s = _t(sf_dir, "supplier")
    n = _t(sf_dir, "nation")
    o = _t(sf_dir, "orders")
    j = (
        li.merge(
            p[p["p_name"].str.contains("red")][
                ["p_partkey", "p_retailprice"]
            ],
            left_on="l_partkey",
            right_on="p_partkey",
        )
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(n, left_on="s_nationkey", right_on="n_nationkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
    )
    j["profit"] = j["l_extendedprice"] * (1 - j["l_discount"]) - j[
        "p_retailprice"
    ] * 0.1 * j["l_quantity"]
    j["yr"] = j["o_orderdate"].dt.year
    ref = j.groupby(["n_name", "yr"])["profit"].sum().round(2)

    out = _run("qz222_product_profit", spark, sf_dir)
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        assert abs(row["profit"] - ref.loc[(row["nation"], row["yr"])]) < 1e-6


def test_priority_lines_two_way_counts(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    j = li[
        (li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))
    ].merge(o, left_on="l_orderkey", right_on="o_orderkey")
    hi = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    out = _run("qz224_priority_lines", spark, sf_dir).set_index("rflag")
    for rf, grp in j.groupby("l_returnflag"):
        h = int(hi[grp.index].sum())
        assert out.loc[rf, "high_lines"] == h
        assert out.loc[rf, "low_lines"] == len(grp) - h


def test_supplier_variety_distinct_under_anti_join(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    p = _t(sf_dir, "part")
    s = _t(sf_dir, "supplier")
    bad = set(s.loc[s["s_acctbal"] < 0, "s_suppkey"])
    pp = p[
        (~p["p_brand"].isin(["Brand#1", "Brand#2"]))
        & (p["p_size"].isin([1, 4, 9, 16, 25, 36, 49]))
    ]
    j = li[~li["l_suppkey"].isin(bad)].merge(
        pp[["p_partkey", "p_brand", "p_size"]],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    ref = j.groupby(["p_brand", "p_size"])["l_suppkey"].nunique()

    out = _run("qz225_supplier_variety", spark, sf_dir)
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        assert row["supplier_cnt"] == ref.loc[(row["brand"], row["size"])]


def test_promo_revenue_share_gated(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    p = _t(sf_dir, "part")
    j = li[
        (li["l_shipdate"] >= pd.Timestamp("1997-03-01"))
        & (li["l_shipdate"] < pd.Timestamp("1997-04-01"))
    ].merge(p[["p_partkey", "p_type"]], left_on="l_partkey",
            right_on="p_partkey")
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    promo = rev[j["p_type"].str.startswith("PROMO")].sum()

    out = _run("qz211_promo_revenue_share", spark, sf_dir).iloc[0]
    assert out["n_items"] == len(j)
    assert abs(out["promo_pct"] - round(100.0 * promo / rev.sum(), 4)) < 1e-6


def test_disjunctive_revenue_gated(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    p = _t(sf_dir, "part")
    j = li.merge(
        p[["p_partkey", "p_brand", "p_size"]],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    m = (
        (
            (j["p_brand"] == "Brand#1")
            & j["p_size"].between(1, 10)
            & j["l_quantity"].between(1, 20)
        )
        | (
            (j["p_brand"] == "Brand#2")
            & j["p_size"].between(5, 20)
            & j["l_quantity"].between(10, 40)
        )
        | (
            (j["p_brand"] == "Brand#3")
            & j["p_size"].between(10, 40)
            & j["l_quantity"].between(20, 50)
        )
    )
    hits = j[m]
    out = _run("qz213_disjunctive_revenue", spark, sf_dir).iloc[0]
    assert out["n_items"] == len(hits)
    assert (
        abs(
            out["revenue"]
            - round(
                (hits["l_extendedprice"] * (1 - hits["l_discount"])).sum(), 2
            )
        )
        < 1e-6
    )


def test_top_supplier_with_ties(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    s = _t(sf_dir, "supplier")
    w = li[
        (li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1997-04-01"))
    ]
    rev = (
        (w["l_extendedprice"] * (1 - w["l_discount"]))
        .groupby(w["l_suppkey"])
        .sum()
        .round(2)
    )
    winners = sorted(rev[rev == rev.max()].index)

    out = _run("qz215_top_supplier", spark, sf_dir)
    assert list(out["suppkey"]) == winners
    assert np.allclose(out["total"], rev.max(), atol=0.011)
    assert set(out["name"]) == set(
        s.set_index("s_suppkey").loc[winners, "s_name"]
    )


def test_returned_items_top20(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    c = _t(sf_dir, "customer")
    n = _t(sf_dir, "nation")
    j = (
        li[li["l_returnflag"] == "R"]
        .merge(
            o[
                (o["o_orderdate"] >= pd.Timestamp("1997-01-01"))
                & (o["o_orderdate"] < pd.Timestamp("1997-04-01"))
            ],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    )
    j["rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    g = (
        j.groupby(["c_custkey", "c_name", "c_acctbal", "n_name"])["rev"]
        .sum()
        .round(2)
        .reset_index()
        .sort_values(
            ["rev", "c_custkey"], ascending=[False, True], kind="mergesort"
        )
        .head(20)
    )
    out = _run("qz210_returned_items", spark, sf_dir)
    assert list(out["custkey"]) == list(g["c_custkey"])
    assert np.allclose(out["revenue"], g["rev"], atol=0.011)


def test_order_count_histogram_zero_preserving(spark, sf_dir):
    o = _t(sf_dir, "orders")
    c = _t(sf_dir, "customer")
    counted = (
        o[o["o_orderpriority"] != "1-URGENT"].groupby("o_custkey").size()
    )
    per_cust = counted.reindex(c["c_custkey"], fill_value=0)
    ref = per_cust.value_counts()  # n_orders -> n_customers

    out = _run("qz216_order_count_histogram", spark, sf_dir).set_index(
        "n_orders"
    )
    assert len(out) == len(ref)
    for k, v in ref.items():
        assert out.loc[k, "n_customers"] == v
    # the zero bucket must exist iff some customer has no counted orders
    assert (0 in out.index) == bool((per_cust == 0).any())


def test_dormant_rich_customers(spark, sf_dir):
    o = _t(sf_dir, "orders")
    c = _t(sf_dir, "customer")
    t = c.loc[c["c_acctbal"] > 0, "c_acctbal"].mean()
    urgent = set(o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"])
    d = c[(c["c_acctbal"] > t) & (~c["c_custkey"].isin(urgent))]
    ref = d.groupby("c_mktsegment")["c_acctbal"].agg(["size", "sum"])

    out = _run("qz217_dormant_rich_customers", spark, sf_dir).set_index(
        "segment"
    )
    assert set(out.index) == set(ref.index)
    for seg, row in out.iterrows():
        assert row["n_custs"] == ref.loc[seg, "size"]
        assert abs(row["balance"] - round(ref.loc[seg, "sum"], 2)) < 1e-6


def test_ship_priority_top10(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    c = _t(sf_dir, "customer")
    j = (
        li[li["l_shipdate"] > pd.Timestamp("1999-01-01")]
        .merge(
            o[o["o_orderdate"] < pd.Timestamp("1999-01-01")],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        .merge(
            c[c["c_mktsegment"] == "BUILDING"],
            left_on="o_custkey",
            right_on="c_custkey",
        )
    )
    j["rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    g = (
        j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])["rev"]
        .sum()
        .round(2)
        .reset_index()
        .sort_values(
            ["rev", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(10)
    )
    out = _run("qz208_ship_priority", spark, sf_dir)
    assert list(out["o_key"]) == list(g["l_orderkey"])
    assert np.allclose(out["revenue"], g["rev"], atol=0.011)


def test_local_supplier_volume_same_nation(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    c = _t(sf_dir, "customer")
    s = _t(sf_dir, "supplier")
    n = _t(sf_dir, "nation")
    r = _t(sf_dir, "region")
    asia = n.merge(
        r[r["r_name"] == "ASIA"], left_on="n_regionkey",
        right_on="r_regionkey",
    )
    j = (
        li.merge(
            o[
                (o["o_orderdate"] >= pd.Timestamp("1996-01-01"))
                & (o["o_orderdate"] < pd.Timestamp("1997-01-01"))
            ],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(asia, left_on="s_nationkey", right_on="n_nationkey")
    )
    # the distinguishing Q5 edge: customer and supplier in the SAME nation
    j = j[j["c_nationkey"] == j["s_nationkey"]]
    ref = (
        (j["l_extendedprice"] * (1 - j["l_discount"]))
        .groupby(j["n_name"])
        .sum()
        .round(2)
    )
    out = _run("qz209_local_supplier_volume", spark, sf_dir).set_index(
        "nation"
    )
    assert set(out.index) == set(ref.index)
    for nat, row in out.iterrows():
        assert abs(row["revenue"] - ref.loc[nat]) < 1e-6


def test_late_order_priority_exists_once_per_order(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    w = o[
        (o["o_orderdate"] >= pd.Timestamp("1997-01-01"))
        & (o["o_orderdate"] < pd.Timestamp("1997-04-01"))
    ]
    j = li.merge(
        w[["o_orderkey", "o_orderdate", "o_orderpriority"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    late_orders = set(
        j.loc[
            j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=60),
            "o_orderkey",
        ]
    )
    # EXISTS semantics: each order counts ONCE no matter how many late lines
    ref = (
        w[w["o_orderkey"].isin(late_orders)]
        .groupby("o_orderpriority")
        .size()
    )
    out = _run("qz212_late_order_priority", spark, sf_dir).set_index(
        "priority"
    )
    assert len(out) == len(ref)
    for pr, v in ref.items():
        assert out.loc[pr, "n_orders"] == v


def test_two_nation_volume_symmetric_pairs(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders")
    c = _t(sf_dir, "customer")
    s = _t(sf_dir, "supplier")
    n = _t(sf_dir, "nation")
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(
            n.add_prefix("cn_"), left_on="c_nationkey",
            right_on="cn_n_nationkey",
        )
        .merge(
            n.add_prefix("sn_"), left_on="s_nationkey",
            right_on="sn_n_nationkey",
        )
    )
    m = (
        (j["cn_n_name"] == "NATION_2") & (j["sn_n_name"] == "NATION_7")
    ) | ((j["cn_n_name"] == "NATION_7") & (j["sn_n_name"] == "NATION_2"))
    j = j[m]
    j["rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    j["yr"] = j["l_shipdate"].dt.year
    # compare the engine's ROUND(2) against the UNROUNDED pandas sum
    # with half-cent tolerance: a float sum landing exactly on a .xx5
    # boundary rounds half-even in numpy but half-up in both SQL
    # engines (observed at sf0.01: 765619.145 -> .14 vs .15)
    ref = j.groupby(["cn_n_name", "sn_n_name", "yr"])["rev"].sum()
    out = _run("qz214_two_nation_volume", spark, sf_dir)
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        assert (
            abs(
                row["revenue"]
                - ref.loc[
                    (row["cust_nation"], row["supp_nation"],
                     row["ship_year"])
                ]
            )
            <= 0.0051
        )


# ---------------------------------------------------------------------------
# round-15 warehouse idioms (q267-q272)
# ---------------------------------------------------------------------------


def test_brand_basket_lift_matches_pandas(spark, sf_dir):
    li, p = _t(sf_dir, "lineitem"), _t(sf_dir, "part")
    ob = (
        li.merge(p, left_on="l_partkey", right_on="p_partkey")[
            ["l_orderkey", "p_brand"]
        ]
        .drop_duplicates()
        .rename(columns={"l_orderkey": "ok", "p_brand": "brand"})
    )
    n_orders = ob["ok"].nunique()
    na = ob.groupby("brand").size()
    pairs = ob.merge(ob, on="ok")
    pairs = pairs[pairs["brand_y"] > pairs["brand_x"]]
    nab = pairs.groupby(["brand_x", "brand_y"]).size()
    nab = nab[nab >= 20]
    lift = (nab * n_orders / (na.loc[nab.index.get_level_values(0)].values
                              * na.loc[nab.index.get_level_values(1)].values))
    ref = (
        pd.DataFrame({"support": nab, "lift": lift})
        .reset_index()
        .sort_values(["lift", "brand_x", "brand_y"],
                     ascending=[False, True, True])
        .head(15)
    )
    out = _run("q267_brand_basket_lift", spark, sf_dir)
    assert len(out) == len(ref)
    for (_, g), (_, r) in zip(ref.iterrows(), out.iterrows()):
        assert (g["brand_x"], g["brand_y"]) == (r["brand_a"], r["brand_b"])
        assert r["support"] == g["support"]
        assert abs(r["lift"] - g["lift"]) < 1e-5


def test_yoy_growth_matches_pandas(spark, sf_dir):
    li, o = _t(sf_dir, "lineitem"), _t(sf_dir, "orders")
    c, n = _t(sf_dir, "customer"), _t(sf_dir, "nation")
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    )
    # half-UP rounding to match both engines' ROUND (pandas .round is
    # banker's half-even and drifts a cent on exact .5 boundaries)
    j["cents"] = np.floor(
        j["l_extendedprice"] * (1 - j["l_discount"]) * 100.0 + 0.5
    ).astype("int64")
    j["yr"] = j["o_orderdate"].dt.year
    r = j.groupby(["n_name", "yr"])["cents"].sum()
    out = _run("q268_yoy_nation_growth", spark, sf_dir).set_index(
        ["nation", "year"]
    )
    checked = 0
    for (nat, yr), cents in r.items():
        if (nat, yr - 1) in r.index and r[(nat, yr - 1)] > 0:
            row = out.loc[(nat, yr)]
            assert abs(row["revenue"] - round(cents / 100.0, 2)) < 1e-6
            assert (
                abs(row["yoy"] - (cents - r[(nat, yr - 1)]) / r[(nat, yr - 1)])
                < 1e-6
            )
            checked += 1
    assert checked == len(out)


def test_order_day_streaks_match_islands_reference(spark, sf_dir):
    o = _t(sf_dir, "orders").copy()
    o["day"] = (
        o["o_orderdate"] - pd.Timestamp("1970-01-01")
    ) // pd.Timedelta(days=1)
    from collections import Counter

    hist: Counter = Counter()
    for _, days in o.groupby("o_custkey")["day"]:
        d = np.sort(days.unique())
        runs = np.split(d, np.where(np.diff(d) != 1)[0] + 1)
        hist.update(len(r) for r in runs)
    out = _run("qz269_order_day_streaks", spark, sf_dir).set_index(
        "streak_len"
    )
    assert len(out) == len(hist)
    for ln, k in hist.items():
        assert out.loc[ln, "n_streaks"] == k


def test_top_order_share_matches_pandas(spark, sf_dir):
    o, c = _t(sf_dir, "orders").copy(), _t(sf_dir, "customer")
    o["cents"] = np.floor(o["o_totalprice"] * 100.0 + 0.5).astype("int64")
    g = o.groupby("o_custkey")["cents"].agg(["max", "sum", "count"])
    g["share"] = g["max"] / g["sum"]
    j = g.merge(c, left_index=True, right_on="c_custkey")
    out = _run("qz270_top_order_share", spark, sf_dir).set_index("segment")
    for seg, grp in j.groupby("c_mktsegment"):
        row = out.loc[seg]
        assert row["n_customers"] == len(grp)
        assert abs(row["avg_top_share"] - grp["share"].mean()) < 1e-6
        multi = grp[grp["count"] >= 2]
        assert (
            abs(row["avg_top_share_multi"] - multi["share"].mean()) < 1e-6
        )


def test_sla_attainment_matches_pandas(spark, sf_dir):
    li, o = _t(sf_dir, "lineitem"), _t(sf_dir, "orders")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    days = (
        (j["l_shipdate"] - j["o_orderdate"])
        // pd.Timedelta(microseconds=1)
    ) // 86_400_000_000
    out = _run("qz271_sla_attainment", spark, sf_dir).set_index("priority")
    for pr, d in days.groupby(j["o_orderpriority"]):
        row = out.loc[pr]
        assert row["n_lines"] == len(d)
        for h, col in ((30, "within_30d"), (60, "within_60d"),
                       (90, "within_90d")):
            assert abs(row[col] - (d <= h).mean()) < 1e-6


def test_brand_median_discount_matches_order_stats(spark, sf_dir):
    li, p = _t(sf_dir, "lineitem"), _t(sf_dir, "part")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    pct = np.floor(j["l_discount"] * 100.0 + 0.5).astype(int)
    out = _run("qz272_brand_median_discount", spark, sf_dir).set_index(
        "brand"
    )
    for br, v in pct.groupby(j["p_brand"]):
        s = np.sort(v.to_numpy())
        row = out.loc[br]
        assert row["n_lines"] == len(s)
        assert row["median_disc_pct"] == s[(len(s) + 1) // 2 - 1]


def test_customer_theil_matches_inequality_reference(spark, sf_dir):
    o = _t(sf_dir, "orders")
    cents = np.floor(o["o_totalprice"] * 100.0 + 0.5).astype("int64")
    x = cents.groupby(o["o_custkey"]).sum().to_numpy(dtype=float)
    n, X = len(x), x.sum()
    theil = float(((x / X) * np.log(n * x / X)).sum())
    out = _run("qz275_customer_theil", spark, sf_dir).iloc[0]
    assert out["n_customers"] == n
    assert (
        abs(out["mean_spend"] - np.floor(X / n + 0.5) / 100.0) < 0.011
    )
    assert abs(out["theil"] - theil) < 1e-6


def test_cohort_ltv_matches_pandas(spark, sf_dir):
    o = _t(sf_dir, "orders").copy()
    o["m"] = (
        o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month - 1
    )
    o["cents"] = np.floor(o["o_totalprice"] * 100.0 + 0.5).astype(
        "int64"
    )
    cm = o.groupby("o_custkey")["m"].min().rename("cm")
    j = o.merge(cm, left_on="o_custkey", right_index=True)
    j["off"] = j["m"] - j["cm"]
    j = j[j["off"] <= 5]
    r = j.groupby(["cm", "off"])["cents"].sum().sort_index()
    cum = r.groupby(level=0).cumsum()
    size = cm.groupby(cm).size()
    out = _run("qz276_cohort_ltv", spark, sf_dir).set_index(
        ["cohort_month", "month_offset"]
    )
    assert len(out) == len(cum)
    for (cmv, off), c in cum.items():
        row = out.loc[(cmv, off)]
        assert row["cohort_size"] == size[cmv]
        # half-up at 2dp (engine ROUND semantics; python round() is
        # banker's and drifts a cent on exact half-cent boundaries)
        assert (
            abs(row["ltv_per_customer"] - c / 100.0 / size[cmv]) < 0.006
        )


def test_discount_quantity_corr_matches_pearson(spark, sf_dir):
    li, p = _t(sf_dir, "lineitem"), _t(sf_dir, "part")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    dc = np.floor(j["l_discount"] * 100.0 + 0.5)
    q = j["l_quantity"]
    out = _run("qz277_discount_quantity_corr", spark, sf_dir).set_index(
        "brand"
    )
    for br, idx in j.groupby("p_brand").groups.items():
        r_ref = np.corrcoef(dc[idx], q[idx])[0, 1]
        row = out.loc[br]
        assert row["n_lines"] == len(idx)
        assert abs(row["r"] - r_ref) < 1e-6
