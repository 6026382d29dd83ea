"""Typed casts for the stringly-typed ingestion path.

The reference materializes every JDBC cell as a string and re-parses at
document-build time: `LocalDate.parse(...)` (crashes on malformed input,
/root/reference/banner-connector/src/main/java/org/edfi/sis/service/
SisConnectorService.java:419, 455-456) and `Boolean.valueOf(...)` (silently
false, :450), with SQL NULL encoded as the sentinel string "[null]"
(dao/Dao.java:61-67) that leaks into both.

Engine semantics: native NULL in, NULL out — never a sentinel; `strict=True`
(default) fails fast on unparseable non-null values instead of crashing
mid-run or silently coercing; `strict=False` gives try_cast (NULL on bad
input) for reference-tolerant loads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "[null]"  # Dao.java:65 — scrubbed, never produced


def scrub_sentinel(col: Column) -> Column:
    """Map the reference's "[null]" sentinel string to a real NULL."""
    return F.when(col == NULL_SENTINEL, F.lit(None)).otherwise(col)


def cast_columns(
    df: DataFrame,
    types: dict[str, str],
    *,
    strict: bool = True,
    date_format: str | None = None,
    scrub: bool = True,
) -> DataFrame:
    """Cast named columns to target SQL types ({col: "date"|"boolean"|...}).

    strict=True: ANSI-style — a non-null value that fails to parse raises at
    execution (raise_error guard) rather than poisoning the run with nulls.
    strict=False: try_cast semantics (bad value -> NULL).
    """
    out_cols: list[Column] = []
    for name in df.columns:
        if name not in types:
            out_cols.append(F.col(name))
            continue
        target = types[name]
        src = F.col(name)
        if scrub and dict(df.dtypes).get(name) == "string":
            src = scrub_sentinel(src)
        if target == "date" and date_format:
            casted = F.try_to_timestamp(src, F.lit(date_format)).cast("date")
        else:
            casted = src.try_cast(target)
        if strict:
            casted = F.when(
                src.isNotNull() & casted.isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(f"cast_columns: column {name!r} value '"),
                        src.cast("string"),
                        F.lit(f"' is not a valid {target}"),
                    )
                ).cast(target),
            ).otherwise(casted)
        out_cols.append(casted.alias(name))
    return df.select(*out_cols)
