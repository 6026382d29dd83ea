"""Round-17 measurement harness (guide §1): isolate per-query compute.

For each named query (default: the slowest N from BENCH_DETAIL.json):
  * run it twice with the bench's toPandas materialization (run 2 is the
    steady-state number, matching bench.py methodology),
  * run it once against the noop sink (computation only, no Arrow
    materialization — guide §1.4),
  * dump .explain("formatted") to plans/<round>/<name>_<tag>.txt.

Usage:
    python tools/profile_queries.py [--tag before|after] [--top N]
                                    [--plans-dir plans/r17] [query ...]

Prints one JSON line {name: {"topandas": s, "noop": s}} at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    top_n = 0
    plans_dir = None
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--top":
            top_n = int(next(it))
        elif a == "--plans-dir":
            plans_dir = next(it)
        else:
            names.append(a)

    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries
    from ed_fi_x_tpdm_data_ingestion_poc_spark.session import get_spark

    specs = all_queries()
    if top_n and not names:
        with open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_DETAIL.json")
        ) as f:
            detail = json.load(f)
        names = [
            k for k, _ in sorted(
                detail["queries"].items(), key=lambda kv: -kv[1]
            )[:top_n]
        ]
    spark = get_spark()

    # Warm-up: one arbitrary query + the Python worker pool (bench.py's
    # protocol), so the first measured query is not charged for JVM warmup.
    next(iter(specs.values())).build(spark, SF_DIR).toPandas()
    par = spark.sparkContext.defaultParallelism
    spark.range(0, par * 4, 1, par).mapInPandas(lambda i: i, "id long").count()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        spec = specs[name]
        if "streaming" in spec.tags:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = spec.build(spark, SF_DIR)
        df.toPandas()  # warm run (codegen + artifact builds off the clock)
        t0 = time.perf_counter()
        spec.build(spark, SF_DIR).toPandas()
        t_pd = time.perf_counter() - t0
        noops = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.build(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            noops.append(time.perf_counter() - t0)
        t_noop = sorted(noops)[1]
        out[name] = {"topandas": round(t_pd, 3), "noop": round(t_noop, 3)}
        if plans_dir:
            from ed_fi_x_tpdm_data_ingestion_poc_spark.plans.audit import (
                plan_string,
            )

            os.makedirs(plans_dir, exist_ok=True)
            with open(
                os.path.join(plans_dir, f"{name}_{tag}.txt"), "w"
            ) as f:
                f.write(plan_string(df))
        print(f"{name}: toPandas {t_pd:.3f}s noop {t_noop:.3f}s",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
