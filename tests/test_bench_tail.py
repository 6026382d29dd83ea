"""Bench-tail warning hygiene (VERDICT r16 #8).

The driver records only the last ~2000 chars of bench output, so every
Spark analyzer warning that leaks into the tail crowds out per-query
JSON keys (round 16's tail carried the qz220 "trivially true equals
predicate" warning). The JVM writes log4j output straight to fd 2, so
pytest's capfd sees it: build (and thereby ANALYZE) every non-streaming
declared plan and assert none of the known analyzer warnings fired.

This is build/analysis only — no query executes beyond what fixture
memoization runs — so the sweep stays minutes-cheap at sf0.001 while
still covering the exact surface bench.py benches.
"""

from __future__ import annotations

# Analyzer warnings that indicate a query leaning on fragile plan
# heuristics; each would also pollute the driver-visible bench tail.
FORBIDDEN = (
    "trivially true equals predicate",
    "implicit cartesian product",
    "Ambiguous self join",
)


def test_no_analyzer_warnings_across_benched_surface(spark, sf_dir, capfd):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries

    capfd.readouterr()  # drop anything earlier tests left in the fds
    built = 0
    for name, spec in sorted(all_queries().items()):
        if "streaming" in spec.tags:
            continue  # bench.py skips these; they run their own streams
        df = spec.build(spark, sf_dir)
        _ = df.schema  # force analysis — warnings fire here, not at build
        built += 1
    err = capfd.readouterr().err
    hits = [
        line
        for line in err.splitlines()
        if any(p.lower() in line.lower() for p in FORBIDDEN)
    ]
    assert not hits, hits[:5]
    assert built > 250  # the sweep really covered the benched surface
