"""Triangle-count tests (operators/graph.py::triangle_count /
orient_edges): known closed forms, input canonicalization, and the
exactly-once wedge-apex guarantee."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.graph import (
    orient_edges,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _tri(spark, pairs):
    r = triangle_count(_edges(spark, pairs)).collect()[0]
    return r["n_edges"], r["n_tri"]


def test_single_triangle(spark):
    assert _tri(spark, [(1, 2), (2, 3), (1, 3)]) == (3, 1)


def test_path_has_none(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4)]) == (3, 0)


def test_k5_complete_graph(spark):
    pairs = list(combinations(range(5), 2))
    # C(5,3) = 10 triangles on C(5,2) = 10 edges
    assert _tri(spark, pairs) == (10, 10)


def test_duplicate_and_reversed_edges_canonicalized(spark):
    pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3)]
    assert _tri(spark, pairs) == (3, 1)


def test_star_graph_has_none(spark):
    # hub 0 with 6 leaves: many wedges at the hub, zero closures —
    # and orientation points every edge AWAY from the leaves (degree 1)
    assert _tri(spark, [(0, i) for i in range(1, 7)]) == (6, 0)


def test_orientation_outdegree_bound(spark):
    # K4 plus a pendant: oriented out-degree never exceeds the
    # (degree, id) order's wedge-apex bound and every edge appears once
    pairs = list(combinations(range(4), 2)) + [(3, 9)]
    ori = orient_edges(_edges(spark, pairs))
    rows = [(r["s"], r["t"]) for r in ori.collect()]
    assert len(rows) == len(set(rows)) == 7
    # pendant edge must be oriented out of the degree-1 node
    assert (9, 3) in rows
