"""Scale-technique queries: skew-mitigation operators whose results must
be indistinguishable from their naive forms (SURVEY.md §4 100 TB posture:
"skewed keys -> salting or AQE skew-join")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from . import query


@query(
    "qz62_salted_join_agg",
    oracle="""
    SELECT e.user_id, c.c_mktsegment AS seg, COUNT(*) AS n,
           ROUND(SUM(e.value), 2) AS sv
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id, c.c_mktsegment
    """,
    tags=("scale", "skew"),
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    """Salted join + two-phase aggregation over the hot-key fact table:
    events.user_id is low-cardinality (every key is hot), the worst case
    for a shuffled join/agg. The salted plan must produce EXACTLY the
    naive join+group result (hash-checked vs DuckDB's plain SQL)."""
    from ..operators.skew import salted_join

    e = table(spark, sf, "events").select("user_id", "value")
    c = table(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(e, c, ["user_id"], salt=8)
    return (
        joined.groupBy("user_id", F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
    )


@query(
    "qz63_salted_two_phase_agg",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
    """,
    tags=("scale", "skew"),
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase (salted) count on the hot key: partial on (key, salt),
    merge on key — exact, and the hot key spreads over 8 reducers."""
    from ..operators.skew import salted_count

    e = table(spark, sf, "events")
    return salted_count(e, ["user_id", "event_type"], salt=8)


@query(
    "qz64_asof_join",
    oracle="""
    WITH j AS (
      SELECT e.event_id, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS od,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                 ORDER BY CAST(o.o_orderdate AS DATE) DESC,
                          o.o_orderkey DESC) AS rn
      FROM events e
      LEFT JOIN orders o ON e.user_id = o.o_custkey
            AND CAST(o.o_orderdate AS DATE) <= CAST(e.ts AS DATE)
    )
    SELECT event_id, o_orderkey AS asof_order, od AS asof_date
    FROM j WHERE rn = 1
    """,
    tags=("scale", "join"),
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (latest order at or before each event, per user) via the
    union-and-carry pattern — one shuffle + one sort, |left| output rows —
    instead of the quadratic equi+inequality join + row_number encoding the
    oracle uses (operators/asof.py). Ties (same date) resolve to the max
    order key on both sides."""
    from ..operators.asof import asof_join

    e = table(spark, sf, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    out = asof_join(
        e,
        o.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_orderdate"],
        tiebreak=["o_orderkey"],
    )
    return out.select(
        "event_id",
        F.col("o_orderkey").alias("asof_order"),
        F.col("o_orderdate").cast("date").alias("asof_date"),
    )
