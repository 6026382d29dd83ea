"""Product-quantization ANN (operators/similarity.py PQ family): laws the
compressed path must satisfy regardless of data distribution."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.similarity import (
    cosine_topk,
    pq_encode,
    pq_query_luts,
    pq_topk,
    recall_at_k,
    train_pq_codebooks,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


def test_pq_full_shortlist_equals_exact(spark, emb):
    """With the shortlist covering the whole corpus, the ADC scan is only
    a candidate generator and the exact re-rank must reproduce
    cosine_topk EXACTLY — precision is exact by construction; only
    recall depends on quantization."""
    qs = emb.filter(F.col("vec_id") < 3)
    n = emb.count()
    books = train_pq_codebooks(emb, m=8, k=16)
    approx = pq_topk(
        emb, qs, k=5, codebooks=books, shortlist=(n // 5) + 1
    )
    exact = cosine_topk(emb, qs, k=5)
    a = sorted(map(tuple, approx.collect()))
    e = sorted(map(tuple, exact.collect()))
    assert a == e


def test_pq_codes_shape_and_determinism(spark, emb):
    """Codes are m small ints in [0, k); training + encoding are seeded
    and order-stable, so two independent builds agree bit-for-bit."""
    b1 = train_pq_codebooks(emb, m=8, k=16)
    b2 = train_pq_codebooks(emb, m=8, k=16)
    assert np.array_equal(b1, b2)
    c1 = {r.id: list(r.codes) for r in pq_encode(emb, b1).collect()}
    c2 = {r.id: list(r.codes) for r in pq_encode(emb, b2).collect()}
    assert c1 == c2
    assert all(len(v) == 8 and all(0 <= x < 16 for x in v) for v in c1.values())


def test_pq_lut_gather_matches_numpy_adc(spark, emb):
    """The JVM transform/element_at gather must equal the numpy ADC
    score: sum over subspaces of lut[s*k + code_s]."""
    qs = emb.filter(F.col("vec_id") < 2)
    books = train_pq_codebooks(emb, m=4, k=16)
    codes = pq_encode(emb, books)
    luts = pq_query_luts(qs, books)
    kk = books.shape[1]
    got = (
        codes.limit(50)
        .crossJoin(F.broadcast(luts.select("qid", "lut")))
        .select(
            "id",
            "qid",
            F.aggregate(
                F.transform(
                    F.col("codes"),
                    lambda c, i: F.element_at(F.col("lut"), i * kk + c + 1),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("adc"),
        )
        .collect()
    )
    code_map = {r.id: r.codes for r in codes.collect()}
    lut_map = {r.qid: np.asarray(r.lut) for r in luts.collect()}
    for r in got:
        want = sum(
            lut_map[r.qid][s * kk + code_map[r.id][s]]
            for s in range(books.shape[0])
        )
        assert abs(r.adc - want) < 1e-9


def test_pq_dim_not_divisible_raises(spark, emb):
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(emb, m=7, k=16)


def test_ivfpq_full_probe_and_shortlist_equals_exact(spark, emb):
    """Probing every cell with a corpus-covering shortlist degenerates
    IVF+PQ to a candidate generator over the whole corpus — the exact
    re-rank must then reproduce cosine_topk exactly."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.similarity import (
        ivfpq_topk,
        train_ivfpq,
    )

    qs = emb.filter(F.col("vec_id") < 3)
    n = emb.count()
    model = train_ivfpq(emb, n_centroids=4, m=8, k=16)
    approx = ivfpq_topk(
        emb, qs, k=5, model=model,
        n_probe=4, n_assign=1, shortlist=(n // 5) + 1,
    )
    exact = cosine_topk(emb, qs, k=5)
    assert sorted(map(tuple, approx.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_pq_incremental_encode_equals_full(spark, emb):
    """Nightly-maintenance contract for the compressed index: encoding is
    stateless given frozen codebooks, so encoding only the NEW batch and
    unioning with the stored codes must equal a from-scratch encode of
    the full corpus — history is never re-read (the q96/qz101 contract,
    applied to the ANN index)."""
    books = train_pq_codebooks(emb, m=8, k=16)
    split = 10
    old = emb.filter(F.col("vec_id") < split)
    new = emb.filter(F.col("vec_id") >= split)
    stored = pq_encode(old, books)
    fresh = pq_encode(new, books)
    merged = {
        r.id: list(r.codes) for r in stored.unionByName(fresh).collect()
    }
    full = {r.id: list(r.codes) for r in pq_encode(emb, books).collect()}
    assert merged == full
