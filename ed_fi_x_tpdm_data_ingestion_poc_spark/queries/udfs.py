"""UDF / UDAF / UDTF surface (SURVEY.md §2.3 Q41–Q43).

The engine treats Python UDFs as the slow path (SURVEY.md §4): built-ins
first, Arrow-batched pandas UDFs when Python is genuinely needed. These
queries prove the three UDF shapes work and hash-match a pure-SQL oracle.

UDFs are constructed lazily (inside the query builders) because
`pandas_udf` return-type resolution needs a live SparkSession.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..tables import table
from . import query


def _squared_udf():
    @pandas_udf("double")
    def squared(v: pd.Series) -> pd.Series:
        """Vectorized scalar pandas UDF (Arrow-batched; no per-row Python)."""
        return v * v

    return squared


def _weighted_mean_udf():
    @pandas_udf("double")
    def weighted_mean(price: pd.Series, weight: pd.Series) -> float:
        """Grouped-aggregate pandas UDF: weighted mean."""
        den = weight.sum()
        return float((price * weight).sum() / den) if den else float("nan")

    return weighted_mean


@query(
    "qz41_pandas_udf",
    oracle="""
    SELECT event_id, ROUND(value * value, 6) AS v2
    FROM events WHERE value IS NOT NULL
    """,
    tags=("udf",),
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar pandas UDF vs native arithmetic oracle."""
    squared = _squared_udf()
    e = table(spark, sf, "events")
    return (
        e.filter(F.col("value").isNotNull())
        .select("event_id", F.round(squared("value"), 6).alias("v2"))
    )


@query(
    "qz42_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_discount) / SUM(l_discount), 4) AS wm
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf",),
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-agg pandas UDAF (discount-weighted mean price) vs SQL oracle."""
    weighted_mean = _weighted_mean_udf()
    li = table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(weighted_mean("l_extendedprice", "l_discount"), 4).alias("wm"))
    )


@query(
    "qz43_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents ORDER BY doc_id, word LIMIT 2000
    """,
    tags=("udf", "udtf"),
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    """UDTF-shape row expansion: explode tokenized text (LATERAL VIEW)."""
    d = table(spark, sf, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .orderBy("doc_id", "word")
        .limit(2000)
    )
