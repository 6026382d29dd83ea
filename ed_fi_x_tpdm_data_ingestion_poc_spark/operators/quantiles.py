"""Mergeable distributed quantile summary with a PROVABLE rank-error
bound — the percentile/median layer of a stats stage (length filters,
winsorization thresholds, latency dashboards) when an exact global sort
is off the table.

Design (the Manku–Rajagopalan–Lindsay collapse, kept deterministic):

  * each Arrow batch sorts ITS OWN values and keeps every s-th order
    statistic (s = max(1, floor(n_b * eps)), always including the batch
    max), recording each kept value's EXACT local rank as a weight gap —
    a batch of n_b rows compresses to ~1/eps (value, gap) pairs with
    zero rank uncertainty AT the kept points and at most s between them;
  * summaries concatenate (merge = list append + sort at query time):
    the estimated global rank of v is the sum over batches of the exact
    local rank of the largest kept value <= v, so the absolute rank
    error is bounded by sum_b(s_b) <= n_batches + eps * N — the summary
    CARRIES its own bound (`slack`), no distributional assumption;
  * queries walk the cumulative weights: quantile(phi) returns the
    smallest kept value whose merged cumulative weight reaches
    ceil(phi * N).

Everything upstream of the driver is one map-only pass (numpy sort per
Arrow batch); the driver holds n_batches/eps rows, never the corpus.
Spark's own approx_percentile gives no merge handle and its
Greenwald-Khanna state is opaque; this summary is a first-class
DataFrame + dict artifact that shards can build independently and a
coordinator can union — the same contract as sketches.py (HLL/KMV/CMS).

No reference analog (the Java connector aggregates nothing); part of
the brief-mandated large-scale pipeline surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = "value double, w long, slack long"


def quantile_summary(df: DataFrame, col: str, eps: float = 0.01) -> dict:
    """One distributed pass -> {"points": [(value, weight)...] sorted,
    "n": total rows, "slack": worst-case absolute rank error}. Nulls are
    excluded (SQL aggregate convention). Deterministic: batch content is
    sorted before selection and the merged list is value-sorted with
    stable tie order."""
    if not (0 < eps < 1):
        raise ValueError(f"eps must be in (0,1), got {eps}")

    def gen(it):
        import pandas as pd

        for pdf in it:
            v = pdf[col].to_numpy(dtype="float64")
            v = np.sort(v[~np.isnan(v)])
            n = len(v)
            if not n:
                continue
            s = max(1, int(n * eps))
            idx = np.arange(s - 1, n, s)
            if idx[-1] != n - 1:
                idx = np.append(idx, n - 1)
            ranks = idx + 1
            w = np.diff(np.concatenate(([0], ranks)))
            slack = np.zeros(len(idx), dtype="int64")
            slack[0] = s
            yield pd.DataFrame(
                {"value": v[idx], "w": w, "slack": slack}
            )

    rows = (
        df.select(F.col(col).alias(col))
        .where(F.col(col).isNotNull())
        .mapInPandas(gen, _SCHEMA)
        .collect()
    )
    pts = sorted((r.value, r.w) for r in rows)
    return {
        "points": pts,
        "n": int(sum(w for _, w in pts)),
        "slack": int(sum(r.slack for r in rows)),
    }


def summary_merge(a: dict, b: dict) -> dict:
    """Union two summaries built over DISJOINT row sets: ranks add, so
    bounds add — merge is list concatenation, exact and associative
    (the property GK/approx_percentile state does not expose)."""
    pts = sorted(a["points"] + b["points"])
    return {
        "points": pts,
        "n": a["n"] + b["n"],
        "slack": a["slack"] + b["slack"],
    }


def summary_quantile(summary: dict, phi: float) -> float:
    """Smallest kept value whose cumulative merged weight reaches
    ceil(phi * n): |true_rank(result) - phi*n| <= slack."""
    if not summary["points"]:
        raise ValueError("empty summary")
    if not (0 <= phi <= 1):
        raise ValueError(f"phi must be in [0,1], got {phi}")
    target = max(1, int(np.ceil(phi * summary["n"])))
    acc = 0
    for value, w in summary["points"]:
        acc += w
        if acc >= target:
            return float(value)
    return float(summary["points"][-1][0])


def summary_rank_bounds(summary: dict, value: float) -> tuple[int, int]:
    """[lo, hi] bracket on the true rank of `value` (rows <= value):
    lo = sum of weights of kept points <= value (every one of those
    rows is truly <= value), hi = lo + slack."""
    lo = sum(w for v, w in summary["points"] if v <= value)
    return lo, min(lo + summary["slack"], summary["n"])
