"""Connected-components tests (operators/graph.py): transitivity, chain
diameters beyond one round, determinism, survivor convention."""

from __future__ import annotations

import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.graph import (
    connected_components,
    dup_clusters,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "ida long, idb long")
    out = connected_components(df)
    return {r["node"]: r["cluster"] for r in out.collect()}


def test_transitive_pairs_collapse(spark):
    # a~b, b~c => one cluster {1,2,3}; {7,8} separate
    got = _cc(spark, [(1, 2), (2, 3), (7, 8)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-9: diameter 9, needs multiple rounds
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_orientation_and_duplicates_irrelevant(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_dup_clusters_survivor(spark):
    df = spark.createDataFrame([(5, 9), (9, 11)], "ida long, idb long")
    rows = {r["node"]: (r["cluster"], r["keep"]) for r in dup_clusters(df).collect()}
    assert rows == {5: (5, 1), 9: (5, 0), 11: (5, 0)}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(9)], "ida long, idb long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=2)


def _cc_star(spark, edges):
    df = spark.createDataFrame(edges, "ida long, idb long")
    out = connected_components(df, algorithm="star")
    return {r["node"]: r["cluster"] for r in out.collect()}


def test_star_small_graphs_match_label(spark):
    for edges in (
        [(1, 2)],
        [(1, 2), (2, 3), (7, 8)],
        [(2, 1), (1, 2), (2, 3), (3, 2)],
        [(5, 9), (9, 11), (20, 21), (30, 31), (31, 20)],
        [(1, 2), (3, 4), (5, 6), (2, 3), (4, 5)],  # chained pairs
    ):
        assert _cc_star(spark, edges) == _cc(spark, edges)


def test_star_adversarial_chain_beyond_label_cap(spark):
    # Path graph of diameter 300: label propagation needs 300 rounds
    # (far past its max_iter); star contraction converges in O(log n).
    edges = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(edges, "ida long, idb long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=20)
    got = _cc_star(spark, edges)
    assert got == {i: 0 for i in range(301)}


def test_star_random_graph_matches_union_find(spark):
    import random

    rng = random.Random(42)
    nodes = list(range(120))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {n for e in edges for n in e}
    want = {n: find(n) for n in touched}
    assert _cc_star(spark, edges) == want


def test_star_unknown_algorithm_rejected(spark):
    df = spark.createDataFrame([(1, 2)], "ida long, idb long")
    with pytest.raises(ValueError, match="algorithm"):
        connected_components(df, algorithm="bogus")


# ---------------------------------------------------------------------------
# core_numbers (k-core decomposition, h-index fixpoint)
# ---------------------------------------------------------------------------


def _coreness(spark, edges):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.graph import (
        core_numbers,
    )

    df = spark.createDataFrame(edges, "u long, v long")
    return {
        r["node"]: r["coreness"] for r in core_numbers(df).collect()
    }


def test_coreness_triangle_with_tail(spark):
    # triangle 1-2-3 (coreness 2 each), tail 3-4-5 (coreness 1)
    got = _coreness(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    assert got == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1}


def test_coreness_k4_with_pendant(spark):
    # K4 on 1-4 (coreness 3), pendant 5 off node 1 (coreness 1)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    got = _coreness(spark, k4 + [(1, 5)])
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1}


def test_coreness_two_cliques_bridged(spark):
    # two K3s joined by one bridge edge: bridge does not raise coreness
    e = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    got = _coreness(spark, e)
    assert got == {n: 2 for n in range(1, 7)}


def test_coreness_path_all_one(spark):
    got = _coreness(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_coreness_matches_peel_reference(spark):
    # random graph vs a brute-force sequential peel
    import random

    rng = random.Random(11)
    nodes = list(range(30))
    edges = {
        tuple(sorted((rng.choice(nodes), rng.choice(nodes))))
        for _ in range(120)
    }
    edges = [(a, b) for a, b in edges if a != b]

    # reference: classic min-degree peel
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {}
    live = {n: set(v) for n, v in adj.items()}
    k = 0
    while live:
        k = max(k, min(len(v) for v in live.values()))
        doomed = [n for n, v in live.items() if len(v) < k or not v]
        if not doomed:
            doomed = [n for n, v in live.items() if len(v) <= k]
        for n in doomed:
            core[n] = k if len(live[n]) <= k else k
            for m in live[n]:
                live[m].discard(n)
            del live[n]
    # (peel assigns coreness = k at removal time under min-degree order)
    got = _coreness(spark, edges)
    assert got == core
