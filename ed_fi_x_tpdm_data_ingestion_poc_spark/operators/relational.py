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


FUNNEL_INF = 4_000_000_000_000_000_000  # bigint "step not reached" sentinel


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: Column,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Per-user ordered funnel: the first time each of `steps` completes
    IN ORDER (step i only counts after step i-1's earliest qualifying
    time). Returns one row per user with a struct column ``f`` of
    ``t1..tn`` (bigint times from `ts_col`; FUNNEL_INF = not reached).

    ONE shuffle: each user's (ts, type) events collect into a sorted
    array and a JVM ``aggregate`` fold runs the n-state machine over it.
    Processing events in ascending time, each state's earliest
    qualifying time only ever decreases, so when event u is examined the
    running t_{i-1} is the FINAL t_{i-1} whenever it is < u — which
    makes the fold's result equal the first-qualifying-event semantics
    (the 3-join form an oracle recomputes). Per-user state is n longs;
    per-user event lists are bounded by the q132 session skew argument.
    The join alternative costs n shuffled aggregations + n joins."""
    inf = F.lit(FUNNEL_INF)
    zero = F.struct(
        *[inf.alias(f"t{i + 1}") for i in range(len(steps))]
    )

    def step(a, x):
        fields = []
        for i, s in enumerate(steps):
            prev_ok = F.lit(True) if i == 0 else a[f"t{i}"] < x["us"]
            fields.append(
                F.when(
                    (x["tp"] == F.lit(s))
                    & prev_ok
                    & (x["us"] < a[f"t{i + 1}"]),
                    x["us"],
                )
                .otherwise(a[f"t{i + 1}"])
                .alias(f"t{i + 1}")
            )
        return F.struct(*fields)

    folded = F.aggregate(
        F.sort_array(
            F.collect_list(
                F.struct(ts_col.alias("us"), F.col(type_col).alias("tp"))
            )
        ),
        zero,
        step,
    )
    return df.groupBy(user_col).agg(folded.alias("f"))
