"""Sequence packing for training-data pipelines.

Packing concatenates documents into fixed-capacity training sequences
(e.g. 2k/8k-token context windows) to avoid padding waste. A globally
optimal bin packing is NP-hard and inherently sequential; the production
shape at 100 TB is *sharded next-fit*: hash documents into shards, pack
each shard independently with a deterministic sequential rule. Shards are
embarrassingly parallel (one applyInPandas group each), the per-shard
state is O(1), and determinism (shard = id % n, scan in id order, next-fit
accumulator) makes the assignment reproducible and oracle-checkable — a
property real pipelines want for resumable runs.

No analog in the reference (it ships rows to an API, not a trainer); part
of the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    size_col: str,
    capacity: int,
    num_shards: int = 32,
    shard_col: str = "shard",
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign each row a (shard, bin_id): shard = id % num_shards; within a
    shard, rows in id order fill bins next-fit — a row that would push the
    running size past `capacity` starts the next bin. Rows larger than
    capacity get a bin of their own. Returns (id_col, shard, bin_id,
    size_col), all bigint.

    The Python loop touches one shard per Arrow batch (inherent: next-fit
    is a sequential recurrence); everything before it is JVM-side, and the
    single shuffle is the groupBy(shard) that any packer needs.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")

    import pandas as pd

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins = []
        bin_id, acc = 0, 0
        for size in pdf[size_col]:
            if acc > 0 and acc + size > capacity:
                bin_id += 1
                acc = 0
            acc += size
            bins.append(bin_id)
        pdf[bin_col] = pd.Series(bins, dtype="int64")
        return pdf[[id_col, shard_col, bin_col, size_col]]

    prepared = df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.pmod(F.col(id_col), F.lit(num_shards)).cast("bigint").alias(shard_col),
        F.col(size_col).cast("bigint").alias(size_col),
    )
    schema = f"{id_col} bigint, {shard_col} bigint, {bin_col} bigint, {size_col} bigint"
    return prepared.groupBy(shard_col).applyInPandas(pack, schema)
