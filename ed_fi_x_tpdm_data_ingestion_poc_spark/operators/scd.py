"""Slowly-changing-dimension (SCD) history merge.

The reference's delivery path is SCD1: every change overwrites the target
document by natural key (SisConnectorService.java upsert loop; engine twin
`relational.latest_per_key`). The table-side complement an analytics store
needs is SCD2: keep every version with a validity interval instead of
overwriting. Given a base snapshot and a timestamped change feed, emit the
full history — base attributes valid until the first change, each change
valid until the next one, the last version open-ended (`is_current`).

Spark-first shape: the change feed needs one shuffle (window over key) and
the base one join on key — no iteration, no driver state. At 100 TB both
sides hash-partition on the key; skewed keys are AQE-splittable because
everything is plain window + join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Open-ended lower bound for base-snapshot versions: predates any change ts.
# All interval endpoints are TIMESTAMP_NTZ (calendar-pure wall clocks,
# the repo's TZ-free convention): a TZ-ful TimestampType here round-trips
# through the session zone's HISTORICAL rules, and pre-1920 LMT offsets
# (e.g. Asia/Kathmandu 1900 = +5:41:16) shift the 1900 base epoch by
# seconds between engines — caught by the r15 hostile-TZ full sweep.
BASE_EPOCH = "1900-01-01 00:00:00"


def merge_scd2(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Build SCD2 history from a base snapshot and a change feed.

    base:    one row per key with `attr_cols` (snapshot state).
    changes: (keys..., ts_col, attr_cols...) — each row a full-row update;
             `tiebreak` columns make the version order total when ts ties.
    Returns (keys..., attr_cols..., valid_from, valid_to, is_current):
      * base row: valid_from = 1900-01-01, valid_to = first change ts
        (NULL + is_current=1 when the key never changed),
      * change row: valid_from = its ts, valid_to = next change ts,
      * is_current = 1 on the open-ended last version.
    Keys appearing only in the change feed still produce history (inserts).
    """
    keys = list(keys)
    attrs = list(attr_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)

    versions = changes.select(
        *keys,
        *attrs,
        F.col(ts_col).cast("timestamp_ntz").alias("valid_from"),
        F.lead(F.col(ts_col).cast("timestamp_ntz")).over(w).alias("valid_to"),
    )

    first_change = changes.groupBy(*keys).agg(
        F.min(F.col(ts_col).cast("timestamp_ntz")).alias("valid_to")
    )
    base_rows = base.select(*keys, *attrs).join(
        first_change, on=keys, how="left"
    ).select(
        *keys,
        *attrs,
        F.lit(BASE_EPOCH).cast("timestamp_ntz").alias("valid_from"),
        F.col("valid_to"),
    )

    hist = base_rows.unionByName(versions)
    return hist.withColumn(
        "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0)
    )


def apply_scd2_batch(
    history: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One incremental CDC-apply step: merge a change-feed micro-batch into
    an existing SCD2 history (columns keys + attrs + valid_from/valid_to/
    is_current, e.g. from `merge_scd2` or a prior apply).

    Closes each touched key's open version at the batch's first change ts
    and appends the batch's own versions (lead() within the batch). With a
    per-key monotonic feed — every batch row >= the key's open valid_from
    under (ts, tiebreak) order, the CDC contract — the incremental result
    is row-identical to rebuilding with `merge_scd2` on the full feed
    (pinned by tests and the q49i/q49b shared oracle). Late rows need the
    batch rebuild.

    Cost shape: one window shuffle over the BATCH (not the history) plus a
    broadcast of the batch's key set onto the history — the history table
    itself never reshuffles. The full-history rewrite per batch is the
    plain-parquet stand-in for a lakehouse MERGE; at 100 TB the same plan
    writes only the partitions whose keys appear in the batch.
    """
    keys = list(keys)
    attrs = list(attr_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)

    newv = batch.select(
        *keys,
        *attrs,
        F.col(ts_col).cast("timestamp_ntz").alias("valid_from"),
        F.lead(F.col(ts_col).cast("timestamp_ntz")).over(w).alias("valid_to"),
    ).withColumn(
        "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0)
    )
    firstb = batch.groupBy(*keys).agg(
        F.min(F.col(ts_col).cast("timestamp_ntz")).alias("__new_first__")
    )
    closed = (
        history.join(F.broadcast(firstb), on=keys, how="left")
        .withColumn(
            "valid_to",
            F.when(
                (F.col("is_current") == 1)
                & F.col("__new_first__").isNotNull(),
                F.col("__new_first__"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0)
        )
        .drop("__new_first__")
    )
    return closed.unionByName(newv)


class Scd2Store:
    """Driver-held handle to an SCD2 history table for foreachBatch CDC
    apply: seed from a base snapshot, then `.apply(batch_df)` per
    micro-batch (pass the bound method straight to foreachBatch).

    localCheckpoint(eager) per batch materializes the merge and truncates
    lineage — without it the plan (and Catalyst's optimization time) grows
    by one join + union per batch, the same blow-up `connected_components`
    hit (operators/graph.py). The checkpoint also makes the store safe to
    read while the next micro-batch is being merged.
    """

    def __init__(
        self,
        base: DataFrame,
        keys: Sequence[str],
        attr_cols: Sequence[str],
        ts_col: str,
        tiebreak: Sequence[str] = (),
    ):
        self._keys = list(keys)
        self._attrs = list(attr_cols)
        self._ts = ts_col
        self._tiebreak = list(tiebreak)
        seed = base.select(
            *self._keys,
            *self._attrs,
            F.lit(BASE_EPOCH).cast("timestamp_ntz").alias("valid_from"),
            F.lit(None).cast("timestamp_ntz").alias("valid_to"),
            F.lit(1).alias("is_current"),
        )
        self._hist = seed.localCheckpoint(eager=True)

    def apply(self, batch: DataFrame, batch_id: int | None = None) -> None:
        self._hist = apply_scd2_batch(
            self._hist,
            batch,
            self._keys,
            self._ts,
            self._attrs,
            self._tiebreak,
        ).localCheckpoint(eager=True)

    def history(self) -> DataFrame:
        return self._hist


def asof_snapshot(
    history: DataFrame, ts, keys: Sequence[str] | None = None
) -> DataFrame:
    """Point-in-time (time-travel) read of an SCD2 history: the table
    state AS OF `ts` — the version whose validity interval contains it
    (valid_from <= ts < valid_to, open-ended current rows included).

    Pure filter over the history — no window, no join, no shuffle: the
    interval-validity invariant (`merge_scd2` emits non-overlapping,
    per-key contiguous intervals) guarantees at most one surviving row
    per key, so there is nothing to deduplicate. At 100 TB this prunes
    by partition/file stats on valid_from when the history is written
    sorted or Z-ordered on it (sinks/layout.py). Keys inserted after
    `ts` simply have no matching interval and drop out."""
    t = F.lit(ts).cast("timestamp_ntz")
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("is_current")
