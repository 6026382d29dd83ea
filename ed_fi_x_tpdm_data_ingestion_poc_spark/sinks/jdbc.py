"""Dialect-aware JDBC sink — the write half of sources/jdbc.py.

The reference's only sink is REST (SisConnectorService.java posts each
assembled document), so this is engine EXTENSION, not parity: an
analytics engine that reads warehouse tables over JDBC (qz02) also needs
to publish result tables back. Same treatment as the read path: embedded
Derby exercises a real end-to-end round-trip (q298), the
Oracle/MySQL/Postgres dialects the reference ships drivers for
(banner-connector/pom.xml:76-93) are covered by construction-level
assertions in tests/test_jdbc_dialects.py since those servers don't run
here — identifier quoting and type DDL come from Spark's JVM
JdbcDialects registry keyed on the URL, for writes exactly as for reads.

Scale design (100 TB result tables are small; 100 GB ones are not):
  * each task opens ONE connection and writes its partition with
    addBatch/executeBatch inserts of `batch_size` rows — the JVM path,
    no Python in the loop;
  * `max_connections` caps writer parallelism via coalesce (an RDBMS
    melts long before a 1000-executor cluster does; the cap is the
    engine-side admission control the DBA would otherwise bolt on);
  * overwrite defaults to TRUNCATE rather than DROP+CREATE so the
    remote table keeps its DDL, grants, and indexes (truncate=False
    opts back into Spark's recreate semantics);
  * writes are per-task atomic batches, NOT two-phase; a retried task
    can double-insert into a keyless table. For exactly-once publish,
    write to a staging table and swap/merge server-side — the same
    reconcile-then-commit idiom as the REST snapshot sink (R21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.jdbc import JdbcSource


def write_table(
    df: DataFrame,
    src: JdbcSource,
    dbtable: str,
    *,
    mode: str = "append",
    batch_size: int = 10_000,
    max_connections: int | None = None,
    truncate: bool = True,
    create_table_column_types: str | None = None,
    isolation_level: str = "READ_UNCOMMITTED",
) -> None:
    """Write df to a remote table through the URL's JDBC dialect.

    mode: 'append' | 'overwrite' | 'ignore' | 'error' (Spark semantics).
    batch_size: rows per executeBatch round-trip.
    max_connections: cap on simultaneous writer connections (coalesce —
        no shuffle); None writes with df's current parallelism.
    truncate: on overwrite, TRUNCATE and refill instead of DROP+CREATE.
    create_table_column_types: dialect DDL overrides for created
        columns, e.g. "name VARCHAR(128), score DECIMAL(10,2)".
    isolation_level: NONE/READ_UNCOMMITTED/READ_COMMITTED/... —
        READ_UNCOMMITTED keeps bulk loads off the row-lock path where
        the dialect supports it.
    """
    if max_connections is not None and max_connections > 0:
        df = df.coalesce(max_connections)
    writer = df.write.format("jdbc")
    for k, v in writer_options(
        src,
        dbtable,
        batch_size=batch_size,
        truncate=truncate,
        create_table_column_types=create_table_column_types,
        isolation_level=isolation_level,
    ).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def writer_options(
    src: JdbcSource,
    dbtable: str,
    *,
    batch_size: int = 10_000,
    truncate: bool = True,
    create_table_column_types: str | None = None,
    isolation_level: str = "READ_UNCOMMITTED",
) -> dict[str, str]:
    """The exact option map write_table hands to the JDBC writer —
    split out so the dialect tests can pin the assembly (driver,
    truncate, type DDL, batching) without a live server per dialect."""
    opts = {
        "url": src.url,
        "dbtable": dbtable,
        "batchsize": str(batch_size),
        "isolationLevel": isolation_level,
        "truncate": "true" if truncate else "false",
    }
    if src.user:
        opts["user"] = src.user
        opts["password"] = src.password
    if src.driver:
        opts["driver"] = src.driver
    if create_table_column_types:
        opts["createTableColumnTypes"] = create_table_column_types
    opts.update(src.options)
    return opts
