"""Column profiling (ANALYZE-style statistics).

An ingestion engine needs table profiling for optimizer statistics, data-
quality monitoring, and schema drift detection; the reference has nothing
(it never inspects the data it moves). One aggregation pass computes
count / non-null / exact NDV / min / max / exact median for every
requested column, then a `stack` unpivot reshapes the single wide row to
one row per column — a scan-once plan whose shuffle carries one row.

Exact count_distinct inside one agg plans a single Expand over the column
set (the canonical one-pass multi-distinct plan); at extreme scale swap
in approx_count_distinct / approx_percentile (declared surface q20/q69)
— the statistics consumer rarely needs exactness.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_METRICS = ("n_rows", "n_nonnull", "ndv", "min_v", "max_v", "p50")


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile numeric columns: one row per column with
    (col, n_rows, n_nonnull, ndv, min_v, max_v, p50); min/max/p50 as
    ROUND(..., 4) doubles so results are engine-portable."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.count(c).alias(f"{c}__n_nonnull"),
            F.count_distinct(c).alias(f"{c}__ndv"),
            F.round(F.min(c).cast("double"), 4).alias(f"{c}__min_v"),
            F.round(F.max(c).cast("double"), 4).alias(f"{c}__max_v"),
            F.round(F.percentile(c, F.lit(0.5)), 4).alias(f"{c}__p50"),
        ]
    # localCheckpoint is a deliberate plan barrier: stacking directly over
    # the Aggregate makes Catalyst re-optimize the (multi-distinct Expand +
    # TypedImperative percentile) subtree under the Generate — measured
    # 2-6s of pure PLANNING per fresh build (execution is 0.05s). The
    # barrier materializes the one-row wide result (that job IS the
    # profile's scan) and the unpivot plans over a trivial local relation.
    wide = df.agg(*aggs).localCheckpoint(eager=True)
    parts = ", ".join(
        "'{c}', {fields}".format(
            c=c, fields=", ".join(f"`{c}__{m}`" for m in _METRICS)
        )
        for c in cols
    )
    out_cols = ", ".join(_METRICS)
    return wide.selectExpr(
        f"stack({len(cols)}, {parts}) AS (col, {out_cols})"
    )
