"""Scale-safe exact global ranking and size-balanced shard assignment.

The naive global rank — ``row_number().over(Window.orderBy(...))`` — is
the canonical 100 TB scale-killer: an empty ``partitionBy`` funnels the
ENTIRE dataset through one task (Spark even warns). The exact shape that
survives scale is the one ``ORDER BY`` itself uses (range exchange +
local sort), extended with a driver-side prefix sum over per-partition
counts:

1. ``repartitionByRange(P, keys)`` + ``sortWithinPartitions(keys)`` —
   one range shuffle, each partition holds a contiguous, sorted key
   range;
2. one ``mapInPandas`` pass numbers rows 1..n_p WITHIN each partition
   (a running counter across that partition's Arrow batches — no second
   shuffle, no state beyond one long) and tags the partition id;
3. per-partition counts (P rows) come back to the driver, a prefix sum
   turns them into offsets, and a broadcast P-row join makes
   ``rank = offset + local_rank``.

The driver never holds more than P longs; no task ever sees more than
its own range. Ties are broken by the caller-supplied key list, so pass
a unique final key (e.g. the id) to make ranks a pure function of the
data — partition BOUNDARIES from range sampling are not deterministic,
but with a total order the assigned ranks are.

No analog in the reference (its largest ordered set is one JDBC page,
SisConnectorService.java); this is beyond-reference scale surface —
the primitive under exact deciles, serpentine sharding, and any
"sort the corpus once, number it exactly" export.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_ranks(
    df: DataFrame,
    order: list[Column],
    *,
    num_partitions: int = 64,
    rank_col: str = "rank",
) -> DataFrame:
    """Add ``rank_col`` (1-based bigint, dense input order = the given
    column list) to ``df`` without a single-partition window. Project
    ``df`` down to the columns you need FIRST — every retained column
    rides the range exchange and the Arrow pass.

    ``order`` must define a TOTAL order (append a unique id as the last
    key) or equal-key rows get an arbitrary-but-valid rank order.
    """
    if not order:
        raise ValueError("global_ranks needs at least one order column")

    ranged = df.repartitionByRange(num_partitions, *order).sortWithinPartitions(
        *order
    )
    cols = ranged.columns

    def number(it):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in it:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["__pid"] = pid
            pdf["__lrank"] = pd.RangeIndex(seen + 1, seen + n + 1)
            seen += n
            yield pdf

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    # copy, never .add() on the live schema: StructType.add mutates in
    # place and would corrupt `ranged`'s cached column list
    schema = StructType(
        list(ranged.schema.fields)
        + [
            StructField("__pid", IntegerType()),
            StructField("__lrank", LongType()),
        ]
    )
    numbered = ranged.mapInPandas(number, schema)
    # the P-row count side reads the SAME range exchange (identical
    # lineage -> Spark reuses the shuffle files, no second sort of df)
    # and skips the Arrow pass entirely; spark_partition_id() in this
    # post-shuffle stage equals TaskContext.partitionId() in `number`
    counts = sorted(
        ranged.select(F.spark_partition_id().alias("__pid"))
        .groupBy("__pid")
        .count()
        .collect(),
        key=lambda r: r["__pid"],
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["__pid"], acc))
        acc += r["count"]
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    )
    out = (
        numbered.join(off, "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__lrank")).cast("long"))
        .select(*cols, rank_col)
    )
    return out


def serpentine_shards(
    rank: Column, num_shards: int, shard_col: str = "shard"
) -> Column:
    """Map a 1-based global rank to a shard id by serpentine (boustro-
    phedon) round-robin: block b = (rank-1) // S alternates direction,
    so shard s gets the s-th and (2S-1-s)-th largest of every 2S rows.
    Applied to a size-descending rank this is the classic LPT-flavoured
    balance guarantee without any coordination: each shard's total is
    within one max-element of any other's for every prefix of blocks.
    Pure JVM arithmetic — composes into the same select as the rank.
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    i = rank - F.lit(1)
    block = F.floor(i / num_shards)
    pos = i % num_shards
    return (
        F.when(block % 2 == 0, pos)
        .otherwise(F.lit(num_shards - 1) - pos)
        .cast("int")
        .alias(shard_col)
    )
