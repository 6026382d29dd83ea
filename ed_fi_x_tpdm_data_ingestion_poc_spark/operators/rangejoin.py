"""Binned interval (range) join.

A time-range join `r.ts BETWEEN l.ts + lower AND l.ts + upper` has no
equality key, so Catalyst's only direct physical strategies are
BroadcastNestedLoopJoin / CartesianProduct — O(|L|x|R|) and a non-starter
at 100 TB. The classic scale-out plan (used by Spark's own streaming
stream-stream range joins and DuckDB's IEJoin literature as the baseline
it improves on) is *binning*: quantize time into buckets at least as wide
as the join range, equi-join on the bucket id (left rows are exploded to
the <=2 candidate buckets their range can reach), then apply the exact
range predicate as a post-join filter. The join becomes a plain shuffle
hash/sort-merge join keyed on (extra keys..., bucket): linear shuffle,
bounded fan-out, AQE-skew-splittable.

No analog in the reference (banner-connector joins are all id-equality;
see SisConnectorService.java) — this is part of the beyond-reference
training-pipeline surface (event co-occurrence, log sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin__"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    on: list[str] | None = None,
    bucket_s: int | None = None,
) -> DataFrame:
    """Join rows where right[right_ts] is in [left[left_ts] + lower_s,
    left[left_ts] + upper_s] (seconds, inclusive both ends), plus optional
    equality keys `on` (matched by identical column names on both sides).

    Column names must be disjoint apart from `on` — prefix them first for a
    self-join. `bucket_s` defaults to the range width; it must be >= the
    width so every left row explodes to at most 2 candidate buckets.
    """
    if upper_s < lower_s:
        raise ValueError(f"empty range: lower_s={lower_s} > upper_s={upper_s}")
    on = list(on or [])
    width = max(upper_s - lower_s, 1)
    if bucket_s is None:
        bucket_s = width
    if bucket_s < width:
        raise ValueError(f"bucket_s={bucket_s} < range width {width}")
    overlap = set(left.columns) & set(right.columns) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")

    # Bucket ids from SECOND-truncated epochs: truncation only widens the
    # candidate set (never drops a true match); the exact predicate below
    # keeps full timestamp precision.
    lsec = F.unix_timestamp(F.col(left_ts))
    rsec = F.unix_timestamp(F.col(right_ts))
    lo_bin = F.floor((lsec + F.lit(lower_s)) / F.lit(bucket_s))
    hi_bin = F.floor((lsec + F.lit(upper_s)) / F.lit(bucket_s))
    lb = left.withColumn(_BIN, F.explode(F.sequence(lo_bin, hi_bin)))
    rb = right.withColumn(_BIN, F.floor(rsec / F.lit(bucket_s)))

    joined = lb.join(rb, on=on + [_BIN])
    lo_iv = F.expr(f"INTERVAL {lower_s} SECOND")
    hi_iv = F.expr(f"INTERVAL {upper_s} SECOND")
    exact = (F.col(right_ts) >= F.col(left_ts) + lo_iv) & (
        F.col(right_ts) <= F.col(left_ts) + hi_iv
    )
    return joined.filter(exact).drop(_BIN)
