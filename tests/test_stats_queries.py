"""Third-engine differential tests for the round-11 statistics family
(queries/stats_q.py): independent numpy reference implementations of
each statistic, computed straight from the parquet fixtures, compared
against the Spark query outputs. The DuckDB oracles already pin
cross-SQL-engine agreement; these pin the MATH — a shared SQL
misconception (wrong midrank algebra, off-by-one median rank, a Gini
formula that assumes unit weights) would pass the oracle twin and fail
here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries

_SPECS = all_queries()


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _run(name: str, spark, sf_dir: str) -> pd.DataFrame:
    return _SPECS[name].build(spark, sf_dir).toPandas()


def test_auc_matches_midrank_reference(spark, sf_dir):
    ev = _events(sf_dir)
    y = (ev["event_type"] == "purchase").to_numpy()
    v = ev["value"].to_numpy()
    # independent method: scipy-style midranks via argsort, not grouped
    # counts — ranks of sorted order with ties averaged
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v), dtype=float)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j + 2) / 2.0  # 1-based midrank
        i = j + 1
    n_pos, n_neg = int(y.sum()), int((~y).sum())
    auc_ref = (ranks[y].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)

    out = _run("q165_exact_auc", spark, sf_dir).iloc[0]
    assert out["n_pos"] == n_pos and out["n_neg"] == n_neg
    assert abs(out["auc"] - auc_ref) < 1e-6


def test_ks_and_w1_match_cdf_reference(spark, sf_dir):
    d = _docs(sf_dir)
    a = np.sort(d.loc[d["source"] == "src0", "n_chars"].to_numpy())
    b = np.sort(d.loc[d["source"] == "src1", "n_chars"].to_numpy())
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, xs, side="right") / len(a)
    fb = np.searchsorted(b, xs, side="right") / len(b)
    d_ref = float(np.max(np.abs(fa - fb)))
    w1_ref = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(xs)))

    ks = _run("q166_ks_drift", spark, sf_dir).iloc[0]
    assert ks["n1"] == len(a) and ks["n2"] == len(b)
    assert abs(ks["d"] - d_ref) < 1e-6
    crit = 1.3581 * np.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert ks["reject"] == int(round(d_ref, 6) > round(crit, 6))

    w1 = _run("q171_wasserstein_drift", spark, sf_dir).iloc[0]
    assert abs(w1["w1"] - w1_ref) < 1e-6


def test_gini_matches_sorted_reference(spark, sf_dir):
    d = _docs(sf_dir)
    out = _run("q167_token_gini", spark, sf_dir).set_index("source")
    for source, grp in d.groupby("source"):
        toks = [
            t
            for text in grp["text"]
            for t in str(text).split(" ")
            if t != ""
        ]
        w = np.sort(pd.Series(toks).value_counts().to_numpy())
        n = len(w)
        # canonical sorted-array Gini
        g_ref = (2 * np.sum(np.arange(1, n + 1) * w) - (n + 1) * w.sum()) / (
            n * w.sum()
        )
        row = out.loc[source]
        assert row["n_types"] == n
        assert row["n_tokens"] == w.sum()
        assert abs(row["gini"] - g_ref) < 1e-6


def test_mmd_matches_centroid_reference(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mus = {
        lbl: np.round(
            np.mean(np.stack(grp["embedding"].to_numpy()), axis=0) * 1e6
        ).astype("int64")
        for lbl, grp in emb.groupby("label")
    }
    out = _run("q168_label_mmd", spark, sf_dir)
    assert len(out) == len(mus) * (len(mus) - 1) // 2
    for _, r in out.iterrows():
        gap = mus[r["label_a"]] - mus[r["label_b"]]
        ref = float(np.sum(gap * gap)) / 1e12
        assert abs(r["mmd2"] - ref) < 1e-6


def _daily(sf_dir: str) -> pd.DataFrame:
    ev = _events(sf_dir)
    epoch = pd.Timestamp("2024-01-01 00:00:00")
    day = ((ev["ts"] - epoch).dt.total_seconds() * 1e6 // 86_400_000_000)
    return (
        ev.assign(day=day.astype("int64"))
        .groupby(["event_type", "day"])
        .size()
        .rename("c")
        .reset_index()
    )


def test_theil_sen_matches_pairwise_reference(spark, sf_dir):
    daily = _daily(sf_dir)
    out = _run("q172_theil_sen_trend", spark, sf_dir).set_index(
        "event_type"
    )
    for et, grp in daily.groupby("event_type"):
        g = grp.sort_values("day")
        days = g["day"].to_numpy()
        c = g["c"].to_numpy(dtype=float)
        ii, jj = np.triu_indices(len(days), k=1)
        slopes = np.sort((c[jj] - c[ii]) / (days[jj] - days[ii]))
        med = slopes[(len(slopes) + 1) // 2 - 1]  # lower median
        row = out.loc[et]
        assert row["n_pairs"] == len(slopes)
        assert abs(row["slope"] - med) < 1e-6


def test_autocorr_matches_pearson_reference(spark, sf_dir):
    daily = _daily(sf_dir)
    out = _run("q173_daily_autocorr", spark, sf_dir).set_index(
        "event_type"
    )
    for et, grp in daily.groupby("event_type"):
        g = grp.sort_values("day")
        days = g["day"].to_numpy()
        c = g["c"].to_numpy(dtype=float)
        keep = np.diff(days) == 1
        x, y = c[:-1][keep], c[1:][keep]
        row = out.loc[et]
        assert row["n_pairs"] == keep.sum()
        if np.var(x) > 0 and np.var(y) > 0:
            ref = np.corrcoef(x, y)[0, 1]
            assert abs(row["r1"] - ref) < 1e-6
        else:
            assert row["r1"] == 0.0


def test_cusum_matches_scan_reference(spark, sf_dir):
    daily = _daily(sf_dir)
    out = _run("q174_cusum_changepoint", spark, sf_dir).set_index(
        "event_type"
    )
    for et, grp in daily.groupby("event_type"):
        g = grp.sort_values("day")
        c = g["c"].to_numpy(dtype="int64")
        n, tot = len(c), int(c.sum())
        cum = np.cumsum(c)
        dnum = np.abs(n * cum - np.arange(1, n + 1) * tot)
        k = int(np.argmax(dnum))  # numpy argmax = first max = earliest day
        row = out.loc[et]
        assert row["n_days"] == n
        assert row["cp_day"] == g["day"].to_numpy()[k]
        assert abs(row["stat"] - dnum.max() / (n * tot)) < 1e-6


def test_weekday_chi2_matches_reference(spark, sf_dir):
    daily = _daily(sf_dir)
    out = _run("q175_weekday_uniformity", spark, sf_dir).set_index(
        "event_type"
    )
    for et, grp in daily.groupby("event_type"):
        obs = (
            grp.assign(wd=grp["day"] % 7).groupby("wd")["c"].sum().to_numpy()
        )
        tot = obs.sum()
        exp = tot / 7.0
        # textbook form, fractions and all — independent of the
        # cleared-fraction algebra the query uses
        chi2_ref = float(np.sum((obs - exp) ** 2 / exp))
        row = out.loc[et]
        assert row["n_events"] == tot
        assert abs(row["chi2"] - chi2_ref) < 1e-4


def test_datasheet_internal_consistency(spark, sf_dir):
    d = _docs(sf_dir)
    out = _run("q169_corpus_datasheet", spark, sf_dir).set_index("source")
    by = d.groupby("source")
    for source, grp in by:
        row = out.loc[source]
        assert row["n_docs"] == len(grp)
        toks = grp["text"].map(
            lambda t: len([x for x in str(t).split(" ") if x != ""])
        )
        assert row["n_tokens"] == toks.sum()
        lens = np.sort(grp["n_chars"].to_numpy())
        assert row["med_chars"] == lens[(len(lens) + 1) // 2 - 1]
    # duplicate counts sum to the number of docs whose md5 repeats
    import hashlib

    h = d["text"].map(lambda t: hashlib.md5(str(t).encode()).hexdigest())
    dup_total = int(h.map(h.value_counts()).gt(1).sum())
    assert out["dup_docs"].sum() == dup_total


def test_sketch_ks_law_flag_is_green(spark, sf_dir):
    out = _run("q170_sketch_ks_ok", spark, sf_dir).iloc[0]
    assert out["ok"] == 1
    # and the exact D agrees with a direct two-sample computation
    ev = _events(sf_dir)
    a = np.sort(
        ev.loc[ev["event_type"] == "view", "value"].to_numpy()
    )
    b = np.sort(
        ev.loc[ev["event_type"] == "purchase", "value"].to_numpy()
    )
    xs = np.unique(np.concatenate([a, b]))
    d_ref = np.max(
        np.abs(
            np.searchsorted(a, xs, side="right") / len(a)
            - np.searchsorted(b, xs, side="right") / len(b)
        )
    )
    assert abs(out["d_exact"] - d_ref) < 1e-6


def test_ks_matrix_matches_pairwise_reference(spark, sf_dir):
    d = _docs(sf_dir)
    out = _run("q176_ks_matrix", spark, sf_dir).set_index(
        ["source_a", "source_b"]
    )
    sources = sorted(d["source"].unique())
    assert len(out) == len(sources) * (len(sources) - 1) // 2
    import itertools

    # spot-check 10 pairs (full 190 would re-derive the same code path)
    for sa, sb in itertools.islice(
        itertools.combinations(sources, 2), 0, 50, 5
    ):
        a = np.sort(d.loc[d["source"] == sa, "n_chars"].to_numpy())
        b = np.sort(d.loc[d["source"] == sb, "n_chars"].to_numpy())
        xs = np.unique(np.concatenate([a, b]))
        d_ref = float(
            np.max(
                np.abs(
                    np.searchsorted(a, xs, side="right") / len(a)
                    - np.searchsorted(b, xs, side="right") / len(b)
                )
            )
        )
        assert abs(out.loc[(sa, sb)]["d"] - d_ref) < 1e-6


def test_psi_matches_binned_reference(spark, sf_dir):
    d = _docs(sf_dir)
    out = _run("q177_psi_drift", spark, sf_dir).set_index("source")
    ref = np.sort(d.loc[d["source"] == "src0", "n_chars"].to_numpy())
    n = len(ref)
    edges = [
        ref[max(1, int(np.ceil(i / 10 * n))) - 1] for i in range(1, 10)
    ]
    for source, grp in d.groupby("source"):
        if source == "src0":
            assert source not in out.index
            continue
        lens = grp["n_chars"].to_numpy()
        b = np.sum(np.asarray(edges)[None, :] <= lens[:, None], axis=1)
        cnt = np.bincount(b, minlength=10)[:10]
        rb = np.sum(
            np.asarray(edges)[None, :] <= ref[:, None], axis=1
        )
        rcnt = np.bincount(rb, minlength=10)[:10]
        pb = (cnt + 0.5) / (len(lens) + 5.0)
        pa = (rcnt + 0.5) / (n + 5.0)
        psi_ref = float(np.sum((pb - pa) * np.log(pb / pa)))
        assert abs(out.loc[source]["psi"] - psi_ref) < 1e-6
