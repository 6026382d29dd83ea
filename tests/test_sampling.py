"""Sampling operator tests (operators/sampling.py): determinism, exact
per-stratum counts, and the shuffle-free plan shape of hash sampling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
    cap_per_stratum,
    hash_sample,
    stratified_sample_exact,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.plans import audit
from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table


def test_hash_sample_deterministic_subset(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    s1 = hash_sample(d, 0.3, id_col="doc_id").select("doc_id")
    s2 = hash_sample(d, 0.3, id_col="doc_id").select("doc_id")
    ids1 = {r[0] for r in s1.collect()}
    ids2 = {r[0] for r in s2.collect()}
    assert ids1 == ids2  # deterministic across runs
    assert ids1 <= {r[0] for r in d.select("doc_id").collect()}
    # a larger threshold strictly contains a smaller one (monotone in f)
    ids_half = {r[0] for r in hash_sample(d, 0.6, id_col="doc_id").select("doc_id").collect()}
    assert ids1 <= ids_half


def test_hash_sample_is_pure_filter(spark, sf_dir):
    """The scale property: no exchange, no join, no Python — a filter."""
    d = table(spark, sf_dir, "documents")
    facts = audit(hash_sample(d, 0.3, id_col="doc_id"))
    assert facts.exchanges == 0
    assert facts.joins == 0
    assert facts.python_evals == 0 and facts.arrow_evals == 0


def test_stratified_sample_exact_counts(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    frac = 0.2
    out = stratified_sample_exact(d, ["lang"], frac, id_col="doc_id")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    want = {
        r["lang"]: math.ceil(r["n"] * frac)
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_cap_per_stratum(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    out = cap_per_stratum(d, ["lang"], 3, id_col="doc_id")
    counts = [r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()]
    assert counts and max(counts) <= 3
    # deterministic: same cap twice -> same ids
    a = {r[0] for r in out.select("doc_id").collect()}
    b = {r[0] for r in cap_per_stratum(d, ["lang"], 3, id_col="doc_id").select("doc_id").collect()}
    assert a == b


def test_weighted_reservoir_laws(spark):
    """A-ES reservoir: exactly k rows, deterministic per salt, and across
    many salts heavy rows are included far more often than light ones
    (inclusion probability proportional to weight)."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        weighted_reservoir_exact,
    )

    # ids 0..199: weight 1000 for the first 20, weight 10 for the rest
    df = spark.createDataFrame(
        [(i, 1000 if i < 20 else 10) for i in range(200)], "id long, w long"
    )
    a = weighted_reservoir_exact(df, 30, "w", id_col="id", salt=1)
    rows_a = sorted(r.id for r in a.collect())
    assert len(rows_a) == 30
    rows_a2 = sorted(
        r.id
        for r in weighted_reservoir_exact(
            df, 30, "w", id_col="id", salt=1
        ).collect()
    )
    assert rows_a == rows_a2  # deterministic

    heavy = light = 0
    for salt in range(25):
        got = {
            r.id
            for r in weighted_reservoir_exact(
                df, 30, "w", id_col="id", salt=salt
            ).collect()
        }
        heavy += sum(1 for i in got if i < 20)
        light += sum(1 for i in got if i >= 20)
    # 20 rows at 100x the weight of the other 180: heavy rows must be
    # included at a far higher RATE (per-row inclusion frequency)
    assert heavy / 20 > 5 * (light / 180), (heavy, light)
