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
        F.col(ts_col).cast("timestamp").alias("valid_from"),
        F.lead(F.col(ts_col).cast("timestamp")).over(w).alias("valid_to"),
    )

    first_change = changes.groupBy(*keys).agg(
        F.min(F.col(ts_col).cast("timestamp")).alias("valid_to")
    )
    base_rows = base.select(*keys, *attrs).join(
        first_change, on=keys, how="left"
    ).select(
        *keys,
        *attrs,
        F.lit(BASE_EPOCH).cast("timestamp").alias("valid_from"),
        F.col("valid_to"),
    )

    hist = base_rows.unionByName(versions)
    return hist.withColumn(
        "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0)
    )
