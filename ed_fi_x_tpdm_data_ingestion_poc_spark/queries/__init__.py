"""Declared query surface (SURVEY.md §2.3): operator inventory as runnable
(Spark DataFrame builder, DuckDB oracle SQL) pairs.

Each query is registered via @query(...) into QUERIES. The driver contract
(/root/repo/__spark_entry__.py) exposes:
  queries()   -> {name: builder(spark, sf_dir) -> DataFrame}
  oracle_sql()-> {name: ANSI SQL runnable by DuckDB on the same tables}

Conventions that make cross-engine value-hashing stable:
  * every computed column aliased identically on both sides,
  * doubles ROUNDed in-query,
  * arrays canonicalized (sorted, joined to strings) where hashed,
  * explicit casts where engine result types differ (e.g. DuckDB EXTRACT
    -> BIGINT vs Spark year() -> INT),
  * total ORDER BY wherever a LIMIT exists.
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Build-once fixture/artifact caches are shared across queries; the bench
# runs the suite CONCURRENTLY (Spark's scheduler amortizes the per-job
# floor across in-flight queries), so cache fills must be serialized —
# a double-build wastes a sketch pass and can collide on external
# fixtures (Derby database dirs, REST stub ports). One process-wide
# reentrant lock: builds happen once per session, contention after warmup
# is a dict lookup.
_BUILD_LOCK = threading.RLock()

# Cold-build cost per artifact label, accumulated by memo(). bench.py
# emits this as the JSON line's "build_s" field so regression tracking
# sees index/sketch build costs again — memoization otherwise hides them
# from the per-query medians (round-4 verdict, "What's wrong" #1).
BUILD_TIMES: dict[str, float] = {}


# nesting accumulator for memo(): each in-flight build tracks how much
# of its wall-clock was already attributed to LABELED child builds, so
# BUILD_TIMES is additive (exclusive per label). Without this, whichever
# query happens to build first under the current alphabetical order
# absorbs its dependencies' cold builds into its own label — the r15
# name rotation made q196's label jump 6.9 -> 19.7 s purely because it
# now sorted before the ks_pairs/summaries consumers that used to pay
# those builds. Guarded by _BUILD_LOCK, so a plain list works.
_BUILD_STACK: list[float] = []


def memo(cache: dict, key, build, label: str | None = None):
    """Thread-safe build-once memoization: cache[key] = build() exactly once.
    With `label`, the (cold) build's wall-clock EXCLUSIVE of nested
    labeled builds is accumulated into BUILD_TIMES under that name
    (nested artifact builds report under their own labels; unlabeled
    children stay in the parent)."""
    import time

    with _BUILD_LOCK:
        if key not in cache:
            _BUILD_STACK.append(0.0)
            t0 = time.perf_counter()
            try:
                cache[key] = build()
            finally:
                # pop even when build() raises, else the stale frame
                # silently absorbs every later labeled build's time and
                # BUILD_TIMES attribution is skewed for the whole run
                elapsed = time.perf_counter() - t0
                child_labeled = _BUILD_STACK.pop()
                if label is not None:
                    BUILD_TIMES[label] = round(
                        BUILD_TIMES.get(label, 0.0) + elapsed - child_labeled,
                        3,
                    )
                    contrib = elapsed  # whole subtree now under some label
                else:
                    contrib = child_labeled  # only labeled descendants
                if _BUILD_STACK:
                    _BUILD_STACK[-1] += contrib
        return cache[key]


# gate-probe memo for broadcast_if_small: (session ref kept so id() can't
# be recycled) — keyed by the side's CANONICALIZED plan, so re-built
# expressions over the same tables (a fresh .where() per query eval)
# share one probe count instead of paying a count job per evaluation
_GATE_COUNTS: dict[tuple, tuple] = {}


def _est_row_bytes(dt) -> int:
    """Conservative in-memory width estimate for one row of `dt`
    (a DataType or StructType), for the broadcast-bytes gate. Exact
    per-type sizes for fixed-width primitives; assumed occupancies for
    variable-width data (string 48 B — TPC-H comment-column scale;
    binary 1 KiB — opaque media blobs run larger, which only makes the
    gate MORE conservative; collections assume 64 elements — the
    embedding dim of the reference tables). Over-estimating a narrow
    frame costs one unnecessary shuffle that AQE converts back to a
    broadcast from real runtime sizes; UNDER-estimating a wide frame
    costs a driver/executor OOM at scale, so every guess rounds up."""
    from pyspark.sql import types as T

    fixed = {
        T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2,
        T.IntegerType: 4, T.FloatType: 4, T.DateType: 4,
        T.LongType: 8, T.DoubleType: 8, T.TimestampType: 8,
        T.TimestampNTZType: 8, T.DayTimeIntervalType: 8,
        T.YearMonthIntervalType: 4, T.NullType: 1,
    }
    if type(dt) in fixed:
        return fixed[type(dt)]
    if isinstance(dt, T.DecimalType):
        return 16
    if isinstance(dt, T.StringType):
        return 48
    if isinstance(dt, T.BinaryType):
        return 1024
    if isinstance(dt, T.ArrayType):
        return 64 * _est_row_bytes(dt.elementType)
    if isinstance(dt, T.MapType):
        return 64 * (_est_row_bytes(dt.keyType)
                     + _est_row_bytes(dt.valueType))
    if isinstance(dt, T.StructType):
        return 8 + sum(_est_row_bytes(f.dataType) for f in dt.fields)
    return 64  # unknown/user-defined: assume wide-ish


def broadcast_if_small(
    df: DataFrame,
    max_rows: int = 2_000_000,
    max_bytes: int = 128 << 20,
) -> DataFrame:
    """Broadcast-hint a join side only when it is provably small.

    A hard ``F.broadcast`` on a corpus- or SF-proportional side is a
    scale bug: near-dup cluster membership commonly covers 20-50% of a
    web corpus (and TPC-H part/supplier grow with SF), so at 100 TB an
    unconditional hint forces a driver-OOM-sized broadcast instead of
    letting AQE pick a shuffle join. ``count()`` is exact, unlike
    Catalyst's LogicalRDD stats (unknown for checkpointed iterative
    results); for persisted artifacts it is a metadata read, and for
    scan-shaped sides the probe is memoized per (session, canonical
    plan) — a query re-built per bench evaluation re-uses the first
    probe instead of paying a count job each time (a side with fresh
    lineage — e.g. a new localCheckpoint — hashes differently and is
    re-probed, which is the correct staleness behavior).

    The gate is rows AND estimated bytes (round-14 verdict "What's
    missing" #2): a row cap alone lets a WIDE side through — 2M rows of
    a 64-float embedding struct is ~1 GB of broadcast, above any sane
    executor budget, while the same 2M rows of scalar keys is ~100 MB.
    Bytes are estimated as rows x schema width (_est_row_bytes); above
    either cap the frame is returned unhinted and AQE chooses the
    strategy from runtime shuffle sizes (including its own broadcast
    conversion when the side turns out small after filters)."""
    from pyspark.sql import functions as _F

    key = (id(df.sparkSession), df.semanticHash())
    hit = _GATE_COUNTS.get(key)
    if hit is None or hit[0] is not df.sparkSession:
        _GATE_COUNTS[key] = (df.sparkSession, df.count())
    n = _GATE_COUNTS[key][1]
    small = n <= max_rows and n * _est_row_bytes(df.schema) <= max_bytes
    return _F.broadcast(df) if small else df


# spread_scan decision memo: (session id, semantic hash) -> bool, with the
# session object pinned so id() can't be recycled (the _GATE_COUNTS rule)
_SPREAD_DECISIONS: dict[tuple, tuple] = {}


def spread_scan(df: DataFrame, factor: float = 1) -> DataFrame:
    """Round-robin repartition an under-split input to the session's
    default parallelism (optionally x factor) — guide §2.5's "one huge
    unsplittable file: repartition immediately after the read".

    The driver fixtures are single-file, SINGLE-ROW-GROUP parquet, so
    byte-based split planning cannot parallelize any scan: every
    per-row-heavy pipeline (gram explosion, resample explode, regex
    chains, media decode) otherwise runs on ONE core until its first
    shuffle (measured: the qz131 corpus gram pass 2.28 -> 0.51 s at
    32 cores from this one change). The repartition moves kilobytes-
    to-megabytes ONCE before the expensive map work.

    Scale posture: the gate is the scan's ACTUAL partition count —
    at production scale a corpus table has thousands of row groups
    and splits to >= defaultParallelism on its own, so this returns
    the frame untouched and NO exchange enters the plan. The decision
    is memoized per (session, canonical plan) so repeated bench
    evaluations don't re-plan the probe.

    `factor` scales the target below/above defaultParallelism (e.g.
    0.25 for small fixtures whose downstream shuffles would drown in
    32-way block overhead — measured on the qz104 banded join: 8
    partitions beat both 1 and 32); it stays cluster-RELATIVE, never
    an absolute local tune.

    Memory cap (round 18, guide §5): every partition of the
    per-row-heavy stage behind this call is one RESIDENT Python worker
    (pandas+pyarrow RSS, ~0.3-0.5 GiB each). The round-17 verdict
    showed the uncapped defaultParallelism target co-conspiring with a
    20 GiB heap default to collapse a smaller box at local[32] (every
    direct consumer of this function was in the worst-regressed set,
    2.5-11x faster at 8 cores than 32 on the same tree). The target is
    therefore capped at ~1 worker lane per 1.5 GiB of MemAvailable
    (floor 8, the core count where those queries measured healthy):
    a 128 GiB box keeps the full 32-way spread, a 32 GiB box spreads
    ~12-wide instead of pinning 32 workers it cannot feed. Production
    posture unchanged: corpus tables split past defaultParallelism on
    their own, the under-split gate fails, and this returns the frame
    untouched."""
    key = (id(df.sparkSession), df.semanticHash(), factor)
    hit = _SPREAD_DECISIONS.get(key)
    if hit is None or hit[0] is not df.sparkSession:
        from ..session import mem_available_gb

        par = max(
            1,
            int(df.sparkSession.sparkContext.defaultParallelism * factor),
        )
        avail = mem_available_gb()
        if avail is not None:
            par = min(par, max(8, int(avail / 1.5)))
        _SPREAD_DECISIONS[key] = (
            df.sparkSession,
            df.rdd.getNumPartitions() < par,
            par,
        )
    _, under_split, par = _SPREAD_DECISIONS[key]
    return df.repartition(par) if under_split else df


def built(df: DataFrame) -> DataFrame:
    """Force a persisted artifact DataFrame to materialize INSIDE its timed
    build: a lazy persist() would shift the real compute into whichever
    query first touches the artifact, hiding it from build_s."""
    df.count()
    return df


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check (non-SQL op)
    doc: str = ""
    tags: tuple[str, ...] = ()


QUERIES: dict[str, QuerySpec] = {}


def ok_flag(spark: SparkSession, ok: bool) -> DataFrame:
    """One-row (ok int) result, built JVM-side. createDataFrame([...])
    plans as a Python RDD scan (applySchemaToPythonRDD) that round-trips
    a Python worker on EVERY execution; range+lit is a pure JVM project."""
    from pyspark.sql import functions as F

    return spark.range(1).select(F.lit(1 if ok else 0).cast("int").alias("ok"))


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a declared query. `oracle` is the DuckDB-dialect twin."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "", tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module and return the full registry."""
    from . import relational  # noqa: F401
    from . import scalar_funcs  # noqa: F401
    from . import udfs  # noqa: F401
    from . import llm  # noqa: F401
    from . import streaming_q  # noqa: F401
    from . import pipeline_q  # noqa: F401
    from . import scale_q  # noqa: F401
    from . import curation_q  # noqa: F401
    from . import training_q  # noqa: F401
    from . import quality_q  # noqa: F401
    from . import sketch_q  # noqa: F401
    from . import scoring_q  # noqa: F401
    from . import analysis_q  # noqa: F401
    from . import er_q  # noqa: F401
    from . import stats_q  # noqa: F401

    return dict(QUERIES)
