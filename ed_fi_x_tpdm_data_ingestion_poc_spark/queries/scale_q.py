"""Scale-technique queries: skew-mitigation operators whose results must
be indistinguishable from their naive forms (SURVEY.md §4 100 TB posture:
"skewed keys -> salting or AQE skew-join")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from . import query


@query(
    "q62_salted_join_agg",
    oracle="""
    SELECT e.user_id, c.c_mktsegment AS seg, COUNT(*) AS n,
           ROUND(SUM(e.value), 2) AS sv
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id, c.c_mktsegment
    ORDER BY e.user_id, seg
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
        .orderBy("user_id", "seg")
    )


@query(
    "q63_salted_two_phase_agg",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type
    """,
    tags=("scale", "skew"),
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase (salted) count on the hot key: partial on (key, salt),
    merge on key — exact, and the hot key spreads over 8 reducers."""
    from ..operators.skew import salted_count

    e = table(spark, sf, "events")
    return salted_count(e, ["user_id", "event_type"], salt=8).orderBy(
        "user_id", "event_type"
    )
