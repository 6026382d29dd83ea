"""Nested document assembly — the heart of the reference's ETL.

The reference builds deeply nested JSON documents row by row:
  * flat row -> struct + single-element arrays of structs
    (createTeacherCandidate / createTeacherCandidateAddress,
    /root/reference/banner-connector/src/main/java/org/edfi/sis/service/
    SisConnectorService.java:410-434, 436-461),
  * addresses deduped by (street, city, state, zip) with their date periods
    merged, exact duplicate periods dropped (addTeacherAddress,
    SisConnectorService.java:392-408; equality defined in
    ed-fi-api/.../resource/TpdmTeacherCandidateAddress.java:364-386),
  * children attached to the parent document (:148-150).

Spark-first: one groupBy per nesting level with collect_list(struct(...)),
arrays always array_sort-ed because collect_list order is shuffle-dependent
(SURVEY.md §4 custom item 3). No per-row code, no driver loops — the same
plan nests 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nest_children(
    parent: DataFrame,
    child: DataFrame,
    *,
    on: str | Sequence[str],
    child_struct_cols: Sequence[str],
    array_col: str,
    how: str = "left",
) -> DataFrame:
    """Attach child rows to each parent as a sorted array<struct> column
    (ref R14: candidate.setAddresses(...)). Parents with no children get an
    empty array, matching the reference's `new ArrayList<>()` default."""
    keys = [on] if isinstance(on, str) else list(on)
    grouped = child.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c) for c in child_struct_cols]))
        ).alias(array_col)
    )
    joined = parent.join(grouped, on=keys, how=how)
    empty = F.array().cast(joined.schema[array_col].dataType)
    return joined.withColumn(array_col, F.coalesce(F.col(array_col), empty))


def dedupe_merge_periods(
    df: DataFrame,
    *,
    keys: Sequence[str],
    identity_cols: Sequence[str],
    period_cols: Sequence[str] = ("beginDate", "endDate"),
    periods_col: str = "periods",
) -> DataFrame:
    """Group rows identical on `identity_cols` (per parent key), merging
    their distinct periods into one sorted array — the reference's address
    dedup + period merge (SisConnectorService.java:392-408): same address
    seen again => append its period unless an equal period exists.

    collect_set drops exact duplicate periods (the :398-402 equality check);
    array_sort pins a deterministic order.
    """
    period_struct = F.struct(*[F.col(c) for c in period_cols])
    return (
        df.groupBy(*keys, *identity_cols)
        .agg(F.array_sort(F.collect_set(period_struct)).alias(periods_col))
    )


def build_struct(df: DataFrame, mapping: dict[str, Column | str], out_col: str) -> DataFrame:
    """Assemble a struct column from a {field: column} mapping (ref R11)."""
    fields = [
        (F.col(c) if isinstance(c, str) else c).alias(name)
        for name, c in mapping.items()
    ]
    return df.withColumn(out_col, F.struct(*fields))
