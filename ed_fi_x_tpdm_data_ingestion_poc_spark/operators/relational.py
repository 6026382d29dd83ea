"""Relational helper operators: last-row-wins, top-k per group, snapshot
reconciliation — the reference's imperative loops as distributed transforms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column | str]
) -> DataFrame:
    """Keep one row per key: the last under `order` — the reference's
    last-row-wins reduce (SisConnectorService.java:277-292 overwrites the
    document on every detail row; the final row survives).

    Window + row_number keeps ALL columns of the winning row (max_by would
    need one agg per column); AQE handles skewed keys.
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(o).desc() if isinstance(o, str) else o.desc() for o in order]  # type: ignore[union-attr]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ranking window; Spark pushes a per-partition
    group limit below the shuffle (WindowGroupLimit) so only k rows per key
    per input partition shuffle."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def reconcile_snapshot(
    source: DataFrame, remote: DataFrame, key: str | Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """Full-snapshot reconciliation (ref R18/R21): returns (upserts, deletes).

    upserts = every source row (the ODS upserts on natural key);
    deletes  = remote rows whose key is absent from source — the reference
    computes this by mutating a driver HashMap during the upsert loop
    (SisConnectorService.java:153, 463-470); here it is one left_anti join.
    """
    keys = [key] if isinstance(key, str) else list(key)
    deletes = remote.join(source.select(*keys).distinct(), on=keys, how="left_anti")
    return source, deletes
