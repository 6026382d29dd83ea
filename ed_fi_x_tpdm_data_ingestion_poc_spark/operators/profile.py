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
from pyspark.sql import types as T

_METRICS = ("n_rows", "n_nonnull", "ndv", "min_v", "max_v", "p50")

# typed-profile metric schema: one row per column, typed NULLs where a
# metric does not apply to the column's type
_TYPED_METRICS = (
    ("n_rows", "bigint"),
    ("n_nonnull", "bigint"),
    ("ndv", "bigint"),
    ("null_frac", "double"),
    ("blank_frac", "double"),  # strings only: '' / whitespace-only share
    ("min_s", "string"),  # exact string repr: string/temporal/integral
    ("max_s", "string"),
    ("min_num", "double"),  # rounded doubles: integral/floating/decimal
    ("max_num", "double"),
    ("p50", "double"),
)


def profile_columns(
    df: DataFrame, cols: Sequence[str], *, approx: bool = False
) -> DataFrame:
    """Profile numeric columns: one row per column with
    (col, n_rows, n_nonnull, ndv, min_v, max_v, p50); min/max/p50 as
    ROUND(..., 4) doubles so results are engine-portable.

    approx=True swaps exact NDV/median for approx_count_distinct /
    percentile_approx — the 100 TB stats pass (multi-column exact
    count_distinct plans an Expand that duplicates scan rows per
    distinct column; sketches keep one pass with bounded memory)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        ndv = F.approx_count_distinct(c) if approx else F.count_distinct(c)
        p50 = (
            F.percentile_approx(c, 0.5, 10_000)
            if approx
            else F.percentile(c, F.lit(0.5))
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.count(c).alias(f"{c}__n_nonnull"),
            ndv.alias(f"{c}__ndv"),
            F.round(F.min(c).cast("double"), 4).alias(f"{c}__min_v"),
            F.round(F.max(c).cast("double"), 4).alias(f"{c}__max_v"),
            F.round(p50.cast("double"), 4).alias(f"{c}__p50"),
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


def _type_class(dt: T.DataType) -> str:
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "temporal"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integral"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "floating"
    return "other"


def profile_columns_typed(
    df: DataFrame,
    cols: Sequence[str],
    *,
    top_k: int = 3,
    approx: bool = False,
) -> DataFrame:
    """Typed column profile: one row per column with type-appropriate
    statistics (the double-cast `profile_columns` skips every non-numeric
    column — useless on reference-shaped data, which is mostly VARCHAR;
    see Dao.java:57-69).

    Per column: n_rows / n_nonnull / ndv / null_frac, plus
      * strings:   blank_frac ('' or whitespace-only share of non-nulls),
                   exact string min/max, top-k frequent values
      * temporal:  string min/max (CAST, engine-portable), top-k
      * integral:  both string and rounded-double min/max, exact p50, top-k
      * floating:  rounded-double min/max, exact p50 (top-k/min_s null —
                   float-to-string formatting is not engine-portable)
    Inapplicable metrics are typed NULLs, so the row schema is uniform.

    `top_values` is "val:count|val:count|..." ordered by (count DESC,
    val ASC) — fully deterministic, hash-comparable across engines.

    Plan: ONE scan-once aggregate for the scalars (stack-unpivoted behind
    the same localCheckpoint planning barrier as `profile_columns`), plus
    one unpivot -> groupBy -> rank pass for top-k (shuffle keyed on
    (col, val): n_cols x ndv rows after partial agg, never corpus-sized),
    broadcast-joined back on col.

    `approx=True` swaps exact NDV/median for approx_count_distinct /
    percentile_approx — the 100 TB stats pass (a multi-column exact
    count_distinct plans an Expand that doubles scan rows per column;
    sketches keep it one pass with bounded memory).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    classes = {c: _type_class(df.schema[c].dataType) for c in cols}
    bad = [c for c, k in classes.items() if k == "other"]
    if bad:
        raise ValueError(f"unsupported column types for profiling: {bad}")

    def _null(t: str):
        return F.lit(None).cast(t)

    aggs = []
    for c in cols:
        k = classes[c]
        ndv = (
            F.approx_count_distinct(c)
            if approx
            else F.count_distinct(c)
        )
        p50 = (
            F.percentile_approx(c, 0.5, 10_000)
            if approx
            else F.percentile(c, F.lit(0.5))
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.count(c).alias(f"{c}__n_nonnull"),
            ndv.alias(f"{c}__ndv"),
            F.round(
                F.lit(1.0) - F.count(c) / F.count(F.lit(1)), 6
            ).alias(f"{c}__null_frac"),
            (
                F.round(
                    F.sum((F.trim(c) == "").cast("int")) / F.count(c), 6
                )
                if k == "string"
                else _null("double")
            ).alias(f"{c}__blank_frac"),
            (
                F.min(c).cast("string")
                if k in ("string", "temporal", "integral")
                else _null("string")
            ).alias(f"{c}__min_s"),
            (
                F.max(c).cast("string")
                if k in ("string", "temporal", "integral")
                else _null("string")
            ).alias(f"{c}__max_s"),
            (
                F.round(F.min(c).cast("double"), 4)
                if k in ("integral", "floating")
                else _null("double")
            ).alias(f"{c}__min_num"),
            (
                F.round(F.max(c).cast("double"), 4)
                if k in ("integral", "floating")
                else _null("double")
            ).alias(f"{c}__max_num"),
            (
                F.round(p50.cast("double"), 4)
                if k in ("integral", "floating")
                else _null("double")
            ).alias(f"{c}__p50"),
        ]
    # Same deliberate plan barrier as profile_columns: re-optimizing the
    # multi-distinct Expand + percentile subtree under the Generate costs
    # seconds of planning; the barrier job IS the profile's scan.
    wide = df.agg(*aggs).localCheckpoint(eager=True)
    names = [m for m, _t in _TYPED_METRICS]
    parts = ", ".join(
        "'{c}', {fields}".format(
            c=c, fields=", ".join(f"`{c}__{m}`" for m in names)
        )
        for c in cols
    )
    scalars = wide.selectExpr(
        f"stack({len(cols)}, {parts}) AS (col, {', '.join(names)})"
    )

    topable = [c for c in cols if classes[c] != "floating"]
    if top_k <= 0 or not topable:
        return scalars.withColumn("top_values", F.lit(None).cast("string"))

    from pyspark.sql.window import Window

    vparts = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in topable
    )
    long = df.selectExpr(
        f"stack({len(topable)}, {vparts}) AS (col, val)"
    ).where(F.col("val").isNotNull())
    counts = long.groupBy("col", "val").agg(F.count(F.lit(1)).alias("cnt"))
    rk = F.row_number().over(
        Window.partitionBy("col").orderBy(F.desc("cnt"), F.asc("val"))
    )
    top = (
        counts.withColumn("rk", rk)
        .filter(F.col("rk") <= top_k)
        .groupBy("col")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "rk",
                                F.concat_ws(":", "val", "cnt").alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
                "|",
            ).alias("top_values")
        )
    )
    return scalars.join(F.broadcast(top), "col", "left")
