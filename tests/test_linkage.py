"""Record-linkage tests (operators/linkage.py): blocking restricts the
candidate space, oversized blocks are purged, distance gating, and the
(dist, id)-minimal resolution is deterministic."""

from __future__ import annotations

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.linkage import (
    blocked_candidates,
    link_best_match,
)


def _dirty(spark, rows):
    return spark.createDataFrame(rows, "did long, dnm string, block string")


def _clean(spark, rows):
    return spark.createDataFrame(rows, "cid long, cnm string, block string")


def test_blocking_restricts_pairs(spark):
    left = _dirty(spark, [(1, "aa", "x"), (2, "bb", "y")])
    right = _clean(spark, [(10, "aa", "x"), (11, "cc", "z")])
    got = blocked_candidates(left, right).select("did", "cid").collect()
    assert [(r["did"], r["cid"]) for r in got] == [(1, 10)]


def test_block_purging_drops_oversized_blocks(spark):
    left = _dirty(spark, [(i, "n", "big") for i in range(4)] + [(9, "n", "ok")])
    right = _clean(spark, [(i + 100, "n", "big") for i in range(4)]
                   + [(200, "n", "ok")])
    got = blocked_candidates(
        left, right, max_block_product=15
    ).select("did", "cid").collect()
    # 4x4=16 > 15 purged; 1x1 survives
    assert [(r["did"], r["cid"]) for r in got] == [(9, 200)]


def test_best_match_min_dist_then_min_id(spark):
    d = _dirty(spark, [(1, "abcd", "b")])
    c = _clean(
        spark,
        [(30, "abcx", "b"), (20, "abxx", "b"), (10, "abcy", "b"),
         (40, "zzzz", "b")],
    )
    rows = link_best_match(
        d, c, "did", "cid", "dnm", "cnm", max_dist=2
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # dist 1 beats dist 2; among the two dist-1 candidates id 10 wins
    assert (r["did"], r["cid"], r["dist"], r["n_cand"]) == (1, 10, 1, 3)


def test_distance_gate_excludes_far_candidates(spark):
    d = _dirty(spark, [(1, "aaaa", "b"), (2, "qqqq", "b")])
    c = _clean(spark, [(5, "aaab", "b")])
    got = {r["did"]: r["cid"] for r in link_best_match(
        d, c, "did", "cid", "dnm", "cnm", max_dist=1
    ).collect()}
    assert got == {1: 5}  # "qqqq" has no candidate within 1


def test_exact_match_prefers_dist_zero(spark):
    d = _dirty(spark, [(7, "same", "b")])
    c = _clean(spark, [(1, "samx", "b"), (2, "same", "b")])
    r = link_best_match(d, c, "did", "cid", "dnm", "cnm").collect()[0]
    assert (r["cid"], r["dist"]) == (2, 0)
