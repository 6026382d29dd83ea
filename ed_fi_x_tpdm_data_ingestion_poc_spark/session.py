"""SparkSession factory and engine configuration.

Replaces the reference's Spring bootstrap + application.properties
(/root/reference/banner-connector/src/main/java/org/edfi/sis/SisConnectorApp.java:18-29,
/root/reference/runtime/input/application.properties:1-14) with a config
dataclass and a tuned SparkSession.

Scale posture (SURVEY.md §4): AQE on (runtime re-planning + skew-join
handling), shuffle partitions sized to the cluster, Arrow enabled for the
pandas-UDF slow path, UTC session timezone so date/time semantics are
engine-independent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class EngineConfig:
    """Engine-level knobs (analog of the reference's application.properties)."""

    app_name: str = "tpdm-spark-engine"
    master: str | None = None  # None -> respect existing session / local[*]
    shuffle_partitions: int | None = None  # None -> 2x cores, min 32
    session_timezone: str = "UTC"
    extra_conf: dict[str, str] = field(default_factory=dict)


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


# id -> session: holding the reference keeps id() from being reused by a
# later session object after GC (which would wrongly skip tuning it)
_TUNED: dict[int, SparkSession] = {}

# SparkContext id -> context (same id-pinning rationale as _TUNED)
_SHIPPED: dict[int, object] = {}


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executors via addPyFile (the --py-files path).

    Several operators run package code INSIDE executor Python workers
    (mapInPandas/pandas-UDF closures import operators.multimodal,
    operators.dedup, ...). cloudpickle serializes module-level functions
    by REFERENCE, so the worker must be able to import the package — true
    when the driver runs from the repo checkout (cwd on path), false for
    an external driver process launched elsewhere. Zipping the package
    once per SparkContext and addPyFile-ing it makes worker imports
    location-independent — identical to shipping --py-files on a real
    cluster, where executor hosts share nothing with the driver's
    filesystem. ~100 KB, once per context."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, zip_path = tempfile.mkstemp(prefix=pkg_name + "_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED[id(sc)] = sc


def tune(spark: SparkSession, cfg: EngineConfig | None = None) -> SparkSession:
    """Apply engine runtime conf to an existing session (driver-provided or ours).

    Only touches runtime-mutable confs; safe to call on a session we did not
    create (the correctness driver passes its own session into queries()).
    Idempotent per session: every conf set is a py4j round-trip, and table()
    calls this on each load.
    """
    if cfg is None and id(spark) in _TUNED:
        return spark
    cfg = cfg or EngineConfig()
    conf = {
        # Deterministic wall-clock date/time fields regardless of host TZ —
        # matches DuckDB's naive-timestamp reading of the same parquet.
        "spark.sql.session.timeZone": cfg.session_timezone,
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # NOTE: coalescePartitions.parallelismFirst stays at its default
        # (true). Setting it false ("respect advisory partition size", the
        # posture Spark docs suggest for large clusters) coalesces small
        # reduce stages to ONE task and measurably regressed every window/
        # sort query 50-70% at sf0.1 — byte-sized reducers belong in the
        # cluster deploy conf where stages actually carry gigabytes.
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow for the pandas-UDF path (10-100x over row-at-a-time Python).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Case-insensitive resolution is Spark's default; pin it anyway since
        # the reference's column matching is case-insensitive (SURVEY.md R5).
        "spark.sql.caseSensitive": "false",
    }
    if cfg.shuffle_partitions:
        conf["spark.sql.shuffle.partitions"] = str(cfg.shuffle_partitions)
    conf.update(cfg.extra_conf)
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on a live session: keep going
    ship_package(spark)
    _TUNED[id(spark)] = spark
    return spark


def get_spark(cfg: EngineConfig | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    local[N] in tests; on a real cluster the master/resources come from
    spark-submit and this only applies SQL-level conf.
    """
    cfg = cfg or EngineConfig()
    par = _default_parallelism()
    builder = (
        SparkSession.builder.appName(cfg.app_name)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions or max(32, par)))
        # Local-mode heap default (overridable via SPARK_DRIVER_MEMORY).
        # Sized to the declared-query suite's working set, not to one
        # query: the suite keeps ~60 persisted artifacts (indexes,
        # sketches, fixtures) alive in the single local JVM that is
        # both driver and executor. Measured at sf0.1/local[32]
        # (round 17, guide §5 memory pressure): with 8g the bench's
        # sequential pass reads 162.6 s with GC/eviction inflating
        # individual map-only queries up to 8x their isolated cost
        # (qz124 3.60 s in-suite vs 0.40 s isolated); with 20g the
        # same tree reads 117.2 s (-28%) and the inflation largely
        # disappears. On a real cluster driver/executor memory comes
        # from spark-submit and this default is irrelevant.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "20g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", cfg.session_timezone)
    )
    if cfg.master:
        builder = builder.master(cfg.master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{par}]")
    spark = builder.getOrCreate()
    return tune(spark, cfg)
