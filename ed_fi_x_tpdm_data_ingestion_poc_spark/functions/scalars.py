"""Scalar column-expression library — the engine's reusable functions,
all built-in `pyspark.sql.functions` compositions (JVM-side, codegen'd;
no Python in any of them).

Covers the scalar semantics the reference implements in Java:
  * descriptor_uri  — namespace#code with bare-code fallback (R10,
    SisConnectorService.java:510-516) as a pure expression (map-side,
    for when the vocabulary is a literal map rather than a DataFrame);
  * iso_date / iso_timestamp — Gson adapter output shapes (R23,
    ed-fi-api/src/main/java/org/edfi/api/JSON.java:213-237);
  * null_if_sentinel — "[null]" scrub (Dao.java:65);
  * equality_filter — the REST query surface (R17): conjunction of
    equality params compiled to one predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.casts import NULL_SENTINEL


def descriptor_uri(code: Column | str, namespace_by_code: dict[str, str]) -> Column:
    """namespace#code when the code is in the (small, literal) vocabulary,
    bare code otherwise. For DataFrame-shaped vocabularies use
    operators.enrich.enrich_descriptor_uri (broadcast join) instead."""
    c = F.col(code) if isinstance(code, str) else code
    if not namespace_by_code:
        return c
    pairs = [x for kv in namespace_by_code.items() for x in kv]
    m = F.create_map(*[F.lit(x) for x in pairs])
    return F.coalesce(F.concat(m[c], F.lit("#"), c), c)


def iso_date(col: Column | str) -> Column:
    """yyyy-MM-dd (LocalDate Gson adapter shape)."""
    return F.date_format(col, "yyyy-MM-dd")


def iso_timestamp(col: Column | str) -> Column:
    """RFC3339-style yyyy-MM-dd'T'HH:mm:ss.SSSXXX (ApiClient date format)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")


def null_if_sentinel(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == NULL_SENTINEL, F.lit(None)).otherwise(c)


def equality_filter(df: DataFrame, params: dict[str, object]) -> DataFrame:
    """The reference's entire REST query language (R17): an AND of equality
    predicates over scalar fields (TeacherCandidatesApi.java:187-255),
    compiled to one Catalyst filter. None values mean IS NULL (the REST
    layer omits them; we expose the stronger form)."""
    out = df
    for name, value in params.items():
        out = out.filter(
            F.col(name).isNull() if value is None else (F.col(name) == F.lit(value))
        )
    return out


def paginate(df: DataFrame, order_by: list[str], *, offset: int = 0, limit: int = 100) -> DataFrame:
    """offset/limit pagination over a total order (R16/R17 pagination
    params) without collecting: row_number over the explicit sort.

    Faithful to the reference's offset/limit REST semantics, but the
    un-partitioned window funnels the whole input through ONE task — fine
    for page-sized sources, wrong at corpus scale. The scale-safe
    counterpart is paginate_keyset below: O(page) work per request and no
    global sort, at the cost of a cursor instead of a random-access offset."""
    from pyspark.sql.window import Window

    w = Window.orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )


def paginate_keyset(
    df: DataFrame,
    order_by: list[str],
    *,
    after: tuple | None = None,
    limit: int = 100,
) -> DataFrame:
    """Keyset (cursor) pagination: rows strictly after the `after` key tuple
    in the lexicographic order of `order_by`, first `limit` of them.

    Scale shape: the predicate pushes to the scan (no global row_number, no
    single-reducer sort of everything before the page); sortWithinPartitions
    + the limit leave only per-partition page-sized sorts followed by
    Spark's take-ordered merge. `order_by` must be a total order (include a
    unique tiebreaker column last) or pages can skip/repeat ties. The last
    row of each page is the next call's `after`."""
    if after is not None:
        if len(after) != len(order_by):
            raise ValueError("after tuple must match order_by arity")
        # (a,b) > (x,y) lexicographically: a > x OR (a = x AND b > y) ...
        pred = F.lit(False)
        eq_prefix = F.lit(True)
        for col_name, val in zip(order_by, after):
            c = F.col(col_name)
            pred = pred | (eq_prefix & (c > F.lit(val)))
            eq_prefix = eq_prefix & (c == F.lit(val))
        df = df.filter(pred)
    return df.orderBy(*order_by).limit(limit)
