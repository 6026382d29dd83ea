"""A/B harness for the coreness artifact build (round-18, VERDICT r17
item 6): vary core_numbers(steps_per_job) on the sf0.1 co-purchase
graph and report wall-clock + step counts. Values are invariant (the
h-index fixpoint is idempotent past convergence); only job batching
changes.

Usage: python tools/ab_coreness.py [spj ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.graph import (
        core_numbers,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries.er_q import (
        _copurchase_und,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.session import get_spark

    spjs = [int(a) for a in sys.argv[1:]] or [2, 3, 4, 6]
    spark = get_spark()
    und = _copurchase_und(spark, SF_DIR)  # artifact, built once
    base = None
    for spj in spjs:
        t0 = time.perf_counter()
        c = core_numbers(und, max_iter=60, steps_per_job=spj)
        rows = sorted(map(tuple, c.collect()))
        dt = time.perf_counter() - t0
        if base is None:
            base = rows
        assert rows == base, f"spj={spj} changed values"
        print(f"RESULT spj={spj} wall={dt:.2f}s rows={len(rows)}")


if __name__ == "__main__":
    main()
