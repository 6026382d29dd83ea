"""Checkpoint recovery: the production streaming contract that a restarted
query resumes from its checkpoint — no reprocessing of consumed input, and
stateful operator state RESTORED, not rebuilt.

The reference's batch job has no recovery story at all (a crashed run is
re-run whole, SisConnectorService.java:142-160); these tests pin the
engine's replacement: file-source + checkpoint = exactly-once per input
file across restarts, and dropDuplicates state surviving the restart.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def _write_file(spark, path: str, name: str, ids: list[int]) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"id": ids}), preserve_index=False
        ),
        os.path.join(path, name),
    )


def _run_once(spark, src: str, out: str, ckpt: str, dedup: bool) -> None:
    stream = spark.readStream.schema("id long").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    if dedup:
        stream = stream.dropDuplicates(["id"])
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_restart_does_not_reprocess_consumed_files(spark, tmp_path):
    """Phase 1 consumes files A,B; phase 2 adds file C and RESTARTS from
    the same checkpoint: the sink must gain exactly C's rows — file-level
    exactly-once across the restart."""
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    _write_file(spark, src, "0000.parquet", list(range(0, 10)))
    _write_file(spark, src, "0001.parquet", list(range(10, 20)))
    _run_once(spark, src, out, ckpt, dedup=False)
    got1 = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got1 == list(range(20))

    _write_file(spark, src, "0002.parquet", list(range(20, 25)))
    _run_once(spark, src, out, ckpt, dedup=False)
    got2 = sorted(r.id for r in spark.read.parquet(out).collect())
    # every id exactly once: files A,B were NOT re-emitted on restart
    assert got2 == list(range(25))


def test_dedup_state_survives_restart(spark, tmp_path):
    """dropDuplicates state must be RESTORED from the checkpoint: ids seen
    before the restart are suppressed when they reappear after it."""
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    _write_file(spark, src, "0000.parquet", list(range(0, 10)))
    _run_once(spark, src, out, ckpt, dedup=True)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(
        range(10)
    )

    # 5..9 already seen before the restart; 10..14 are new
    _write_file(spark, src, "0001.parquet", list(range(5, 15)))
    _run_once(spark, src, out, ckpt, dedup=True)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(15)), got


def test_fresh_checkpoint_rereads_source(spark, tmp_path):
    """Control: WITHOUT the old checkpoint the source re-reads every file
    (into a fresh sink dir — the parquet sink's own _spark_metadata log
    would otherwise skip the replayed batches, a second idempotence layer
    the first test exercises implicitly). Pins that no-reprocess-on-
    restart comes from the recovered offsets, not from the source
    forgetting old files."""
    src = str(tmp_path / "src")
    _write_file(spark, src, "0000.parquet", list(range(0, 5)))
    _run_once(spark, src, str(tmp_path / "out1"), str(tmp_path / "ckpt1"),
              dedup=False)
    _run_once(spark, src, str(tmp_path / "out2"), str(tmp_path / "ckpt2"),
              dedup=False)
    got = sorted(r.id for r in spark.read.parquet(
        str(tmp_path / "out2")).collect())
    assert got == list(range(5))
