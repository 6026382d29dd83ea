"""Incremental MinHash-LSH dedup: sketching only the new batch and joining
against a stored band-key index must find exactly the same candidate pairs
as re-running LSH over the full corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.dedup import (
    minhash_band_keys,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
    minhash_signatures,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table


def test_incremental_equals_full_rerun(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    old = docs.filter(F.col("doc_id") <= mid)   # the already-indexed corpus
    new = docs.filter(F.col("doc_id") > mid)    # the arriving batch

    # stored index: signatures + band keys for the old corpus only
    old_sigs = minhash_signatures(old).persist()
    index_keys = minhash_band_keys(old_sigs).persist()

    incremental = minhash_lsh_pairs_incremental(new, index_keys)
    old_only = minhash_lsh_pairs(old, signatures=old_sigs)
    combined = {
        (r["ida"], r["idb"])
        for r in incremental.unionAll(old_only).distinct().collect()
    }

    full = {
        (r["ida"], r["idb"]) for r in minhash_lsh_pairs(docs).collect()
    }
    assert combined == full
    # and the batch really did find cross-boundary duplicates to matter
    cross = {(a, b) for a, b in full if a <= mid < b}
    assert cross <= {(r["ida"], r["idb"]) for r in incremental.collect()}
