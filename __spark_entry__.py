"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (pricing-summary hash aggregate, Q18 shape)
                 on /root/testdata/sf0.001.
queries()     -> every declared operator query from SURVEY.md §2.3, keyed by
                 qNN_name; each callable takes (spark, sf_dir).
oracle_sql()  -> DuckDB-dialect twin SQL for each hash-checkable query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries

    return all_queries()["qz18_hash_agg"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries

    return {name: spec.build for name, spec in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys get rows-only checks."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in sorted(all_queries().items())
        if spec.oracle is not None
    }
