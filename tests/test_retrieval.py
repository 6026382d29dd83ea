"""BM25 inverted-index retrieval (operators/retrieval.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.retrieval import (
    bm25_postings,
    bm25_topk,
)


def _py_bm25(corpus, queries, k1=1.2, b=0.75):
    """Reference Okapi BM25 with smoothed idf, distinct query terms."""
    from collections import Counter

    tfs = {i: Counter(t.split(" ")) for i, t in corpus}
    dls = {i: len(t.split(" ")) for i, t in corpus}
    n = len(corpus)
    avgdl = sum(dls.values()) / n
    df = Counter()
    for c in tfs.values():
        for term in c:
            df[term] += 1
    out = {}
    for qid, qt in queries:
        terms = set(qt.split(" "))
        for i in tfs:
            s = 0.0
            for t in terms:
                tf = tfs[i].get(t, 0)
                if not tf:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * dls[i] / avgdl)
                )
            if s > 0:
                out[(qid, i)] = round(s, 6)
    return out


def test_bm25_matches_python_reference(spark):
    corpus = [
        (10, "the cat sat on the mat"),
        (11, "dogs chase the cat quickly"),
        (12, "unrelated totally different words here"),
        (13, "the the the cat cat mat"),  # heavy tf saturation case
    ]
    queries = [(0, "cat mat"), (1, "dogs chase"), (2, "nothing matches")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "doc_id long, text string")
    got = {
        (r.qid, r.id): (r.score, r.rank)
        for r in bm25_topk(bm25_postings(cdf), qdf, k=10).collect()
    }
    want = _py_bm25(corpus, queries)
    assert {k: v[0] for k, v in got.items()} == want
    # ranks follow (score desc, id) within each query
    for qid in (0, 1):
        ranked = sorted(
            [(k[1], v) for k, v in got.items() if k[0] == qid],
            key=lambda x: x[1][1],
        )
        scores = [v[0] for _, v in ranked]
        assert scores == sorted(scores, reverse=True)
    # a query with no matching terms retrieves nothing (no padding rows)
    assert not any(k[0] == 2 for k in got)


def test_bm25_plan_inverted_join_no_product(spark):
    """The point of the postings design: no cartesian/NLJ anywhere — the
    query side meets the corpus only through the term equi-join."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.plans import audit

    cdf = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(20)], "doc_id long, text string"
    )
    qdf = spark.createDataFrame([(0, "common w3")], "doc_id long, text string")
    f = audit(bm25_topk(bm25_postings(cdf), qdf, k=3))
    assert f.cartesian_products == 0
    assert f.python_evals == 0 and f.arrow_evals == 0
