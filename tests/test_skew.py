"""Salting laws: salted plans must be result-identical to naive plans,
for arbitrary data (hypothesis) and arbitrary salt counts."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.skew import (
    salted_count,
    salted_join,
    salted_sum,
)

_keys = st.integers(min_value=0, max_value=3)  # few keys -> every key hot
_rows = st.lists(st.tuples(_keys, st.integers(-100, 100)), min_size=0, max_size=30)
_dims = st.lists(st.tuples(_keys, st.sampled_from(["a", "b"])), min_size=0, max_size=6)


@settings(max_examples=15, deadline=None)
@given(rows=_rows, dims=_dims, salt=st.sampled_from([1, 3, 8]))
def test_salted_join_law(spark, rows, dims, salt):
    big = spark.createDataFrame(rows, "k long, v long") if rows else spark.createDataFrame([], "k long, v long")
    small = (
        spark.createDataFrame(dims, "k long, tag string").dropDuplicates(["k"])
        if dims
        else spark.createDataFrame([], "k long, tag string")
    )
    naive = sorted(map(tuple, big.join(small, ["k"]).select("k", "v", "tag").collect()))
    salted = sorted(
        map(tuple, salted_join(big, small, ["k"], salt=salt).select("k", "v", "tag").collect())
    )
    assert naive == salted


@settings(max_examples=15, deadline=None)
@given(rows=_rows, salt=st.sampled_from([1, 4]))
def test_salted_agg_law(spark, rows, salt):
    df = spark.createDataFrame(rows, "k long, v long") if rows else spark.createDataFrame([], "k long, v long")
    naive = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    cnt = {r.k: r.n for r in salted_count(df, ["k"], salt=salt).collect()}
    sm = {r.k: r.s for r in salted_sum(df, ["k"], "v", salt=salt).collect()}
    assert cnt == {k: v[0] for k, v in naive.items()}
    assert sm == {k: v[1] for k, v in naive.items()}
