"""Streaming incremental dedup: documents arrive in micro-batches; each
batch is sketched once and checked against the ACCUMULATED band-key index
(a parquet table on storage — the state a production pipeline keeps),
then appended to it. Union of per-batch candidate pairs must equal the
full-corpus LSH run."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.dedup import (
    minhash_band_keys,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
    minhash_signatures,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.streaming.replay import (
    read_replay_stream,
    run_foreach_batch,
    write_replay_dir,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table

DOCS_DDL = "doc_id long, text string"


def test_streaming_batches_match_full_rerun(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.orderBy("doc_id").toPandas()
    n = len(pdf)
    replay = write_replay_dir(
        [pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :]]
    )
    index_dir = os.path.join(tempfile.mkdtemp(prefix="lsh-index-"), "bands")
    found: list[tuple[int, int]] = []

    def dedup_batch(batch_df, batch_id):
        batch = batch_df.persist()
        if os.path.isdir(index_dir):
            index_keys = batch.sparkSession.read.parquet(index_dir)
            pairs = minhash_lsh_pairs_incremental(batch, index_keys)
        else:  # first batch: only new-new duplicates exist
            sigs = minhash_signatures(batch).persist()
            pairs = minhash_lsh_pairs(batch, signatures=sigs)
        found.extend((r["ida"], r["idb"]) for r in pairs.collect())
        # append this batch's band keys to the persistent index
        minhash_band_keys(minhash_signatures(batch)).write.mode("append").parquet(
            index_dir
        )
        batch.unpersist()

    run_foreach_batch(read_replay_stream(spark, replay, DOCS_DDL), dedup_batch)

    full = {
        (r["ida"], r["idb"]) for r in minhash_lsh_pairs(docs).collect()
    }
    assert set(found) == full
    assert len(found) == len(set(found))  # no pair reported twice
    # the index now covers the whole corpus
    idx = spark.read.parquet(index_dir)
    assert idx.select("id").distinct().count() == n


def test_streaming_cms_maintenance_matches_batch(spark, sf_dir):
    """Streaming frequency-summary maintenance: each micro-batch is
    sketched ALONE and cms_merge'd into the running summary (the state a
    live ingest keeps — 64 KiB, never the corpus). After the drain the
    accumulated sketch must be CELL-IDENTICAL to a single batch build
    over all rows: counting is linear, so streaming == batch exactly."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        cms_build,
        cms_merge,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.text import tokens

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.orderBy("doc_id").toPandas()
    n = len(pdf)
    replay = write_replay_dir(
        [pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :]]
    )
    state = {"cms": None}

    def sketch_batch(batch_df, batch_id):
        words = batch_df.select(F.explode(tokens("text")).alias("w"))
        part = cms_build(words, "w", d=4, w=1024)
        state["cms"] = (
            part if state["cms"] is None else cms_merge(state["cms"], part)
        )

    stream = read_replay_stream(spark, replay, DOCS_DDL)
    run_foreach_batch(stream, sketch_batch)
    full = cms_build(
        docs.select(F.explode(tokens("text")).alias("w")), "w", d=4, w=1024
    )
    assert state["cms"]["tables"] == full["tables"]
    assert state["cms"]["n"] == full["n"]
