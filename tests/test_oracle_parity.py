"""Oracle-differential tests (SURVEY.md §5 item 1): every declared query
runs on Spark and, when it declares an oracle, must match DuckDB on row
count, column names, and order-insensitive value hash at sf0.001.
This mirrors the driver's t2 gate locally (tools/oracle_check.py is the
standalone runner; sf0.01 is checked there before commits).
"""

from __future__ import annotations

import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries
from tools.oracle_check import duck_result, frame_digest

_SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(name: str, spark, sf_dir: str) -> None:
    spec = _SPECS[name]
    df = spec.build(spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]
    got = frame_digest(list(df.columns), rows)
    if spec.oracle is None:
        assert got[0] >= 0  # rows-only check (non-SQL-expressible op)
        return
    want = duck_result(spec.oracle, sf_dir)
    assert got == want, f"{name}: spark {got} != duckdb {want}"
