"""DuckDB side of the bench gate (BASELINE.md row 9: Spark total <= 2x
DuckDB on the declared query set).

Runs every declared query's oracle SQL on DuckDB over the same parquet
tables with the IDENTICAL dual protocol as bench.py:

* Pass 1 — SEQUENTIAL: warm connection, warm run + one measured run
  per query (the bench.py round-11 protocol), Arrow materialization.
  Reported per-query and as "seq_s".
* Pass 2 — CONCURRENT: the whole suite submitted at once on
  $SPARK_GRAFT_BENCH_THREADS client threads (default 8, longest-first),
  one cursor per thread (DuckDB's documented multi-thread client
  pattern), 3 sweeps, median suite wall-clock — the headline "value".

Prints one JSON line:
  {"metric": "duckdb_oracle_suite_total_wall_clock", "value": sec,
   "queries": {...}, "sf": ..., "seq_s": ...,
   "threads": N}

Queries without an oracle (rows-only ops) are skipped — compare against a
bench.py run filtered to the same key set (bench_ratio.py does this).
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_THREADS = int(os.environ.get("SPARK_GRAFT_BENCH_THREADS", "8"))
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SKIP_TAGS = {"streaming"}


def main() -> None:
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    specs = {
        n: s.oracle
        for n, s in sorted(all_queries().items())
        if s.oracle and not (set(s.tags) & SKIP_TAGS)
    }

    # warm-up off the clock
    first = next(iter(specs.values()))
    con.execute(first).arrow()

    # Round-11 protocol revision, identical to bench.py: warm run + one
    # measured steady-state run per query.
    per_query: dict[str, float] = {}
    for name, sql in specs.items():
        con.execute(sql).arrow()
        t0 = time.perf_counter()
        con.execute(sql).arrow()
        per_query[name] = round(time.perf_counter() - t0, 3)

    # Concurrent pass: one cursor per client thread, longest-first packing.
    ordered = sorted(specs, key=lambda n: -per_query[n])
    local = threading.local()

    def run_one(name: str) -> None:
        cur = getattr(local, "cur", None)
        if cur is None:
            cur = local.cur = con.cursor()
        cur.execute(specs[name]).arrow()

    # Sweeps 0-1 unmeasured: warms the concurrent path (fresh threads +
    # per-thread cursors) — mirror of bench.py's treatment.
    walls = []
    for i in range(5):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(N_THREADS) as ex:
            for _r in ex.map(run_one, ordered):
                pass
        if i >= 2:
            walls.append(time.perf_counter() - t0)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_suite_total_wall_clock",
                "value": round(sorted(walls)[1], 3),
                "unit": "sec",
                # qNN-prefix keys, mirroring bench.py's tail-window trim
                "queries": {n.split("_")[0]: v for n, v in per_query.items()},
                "sf": float(m.group(1).rstrip(".")) if m else None,
                "seq_s": round(sum(per_query.values()), 2),
                "threads": N_THREADS,
            }
        )
    )


if __name__ == "__main__":
    main()
