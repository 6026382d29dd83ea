"""As-of join: for each left row, the latest right row at or before its
timestamp, per key.

Spark has no ASOF JOIN; the naive encoding (equi-join + inequality +
row_number) materializes every (event x earlier-order) pair before
filtering — quadratic per hot key. This implementation uses the
union-and-carry pattern: tag both sides, union, sort each key's timeline
once, and carry the most recent right payload forward with
last(ignorenulls) over an unbounded-preceding window. One shuffle + one
sort, output size = |left|, regardless of how many right rows precede
each left row.

Determinism: at equal timestamps the right row sorts first (<= semantics —
a right row stamped at the exact left instant matches), and ties among
right rows resolve by the tiebreak columns, so the carried payload is
unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _null_struct(df: DataFrame, cols: list[str]):
    """A genuinely NULL struct literal typed like df's columns. NOT
    struct(NULL, NULL,...) — a struct of null fields is itself non-null,
    which would defeat last(..., ignorenulls=True) in the carry window."""
    types = dict(df.dtypes)
    ddl = "struct<" + ",".join(f"{c}:{types[c]}" for c in cols) + ">"
    return F.lit(None).cast(ddl)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Left as-of-backward join: every left row plus `payload` columns from
    the latest right row with right_time <= left_time on the same key
    (NULLs when nothing precedes). `tiebreak` orders right rows sharing a
    timestamp (default: payload columns) so the carried row is unique."""
    tiebreak = tiebreak or payload
    lcols = list(left.columns)
    rtypes = dict(right.dtypes)

    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        _null_struct(right, payload).alias("__r"),
        *[
            F.lit(None).cast(rtypes[c]).alias(f"__tb_{i}")
            for i, c in enumerate(tiebreak)
        ],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        _null_struct(left, lcols).alias("__l"),
        F.struct(*payload).alias("__r"),
        *[F.col(c).alias(f"__tb_{i}") for i, c in enumerate(tiebreak)],
    )
    tb_cols = [f"__tb_{i}" for i in range(len(tiebreak))]
    u = l.unionByName(r)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", *tb_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__carried", F.last("__r", ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__carried.{c}").alias(c) for c in payload],
    )
