"""Structured Streaming extension: file-replay harness, windowed
aggregations, watermark/late-data handling, stateful dedup, foreachBatch
REST reconciliation sink (SURVEY.md §2.3 Q44-Q49)."""

from .replay import (  # noqa: F401
    EVENTS_DDL,
    events_replay_dir,
    read_replay_stream,
    run_foreach_batch,
    run_to_memory,
    write_replay_dir,
)
