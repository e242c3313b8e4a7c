"""Structured Streaming wiring — the reference's pump loop, Spark-style.

The reference's single-threaded producer loop (``/root/reference/cdc/
producer.py:41-161``: fetch -> write -> poll -> scheduled tasks) maps onto
the microbatch engine: the file-stream source over WAL segment dirs is the
replication slot (its offset log under ``checkpointLocation`` is the slot's
restart LSN, reference S3), ``maxFilesPerTrigger`` is the backpressure knob
(reference ``BufferError`` retry, ``cdc/producer.py:84-94``), and the
offset-log/commit-log pair brackets each batch exactly like write-position /
flush-position tracking (``cdc/sources/__init__.py:82-106``). In production
the same pipeline reads ``format("kafka")`` — only this module changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from .apply import CdcApply
from .config import ENVELOPE_DDL, EngineConfig
from .parse import parse_frames

FRAMED_DDL = "lsn BIGINT, value STRING"


def start_stream(
    spark: SparkSession,
    source_dir: str,
    cfg: EngineConfig,
    *,
    framed: bool = False,
    available_now: bool = True,
    processing_time: str | None = None,
    fail_after_batches: int | None = None,
) -> tuple[StreamingQuery, CdcApply]:
    """Start the WAL-tail -> lake pipeline over parquet segment dirs.

    ``framed=True`` reads (lsn, value) wire frames and runs the vectorized
    parser in-stream; otherwise segments already carry the envelope.
    ``fail_after_batches`` injects a crash for kill-and-resume tests.
    """
    ddl = FRAMED_DDL if framed else ENVELOPE_DDL
    reader = spark.readStream.schema(ddl)
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    df = reader.parquet(os.path.join(source_dir, "seg=*"))
    if framed:
        df = parse_frames(df)

    applier = CdcApply(spark, cfg)
    n_seen = {"batches": 0}

    def _fb(batch_df, batch_id: int) -> None:
        applier.apply_batch(batch_df, batch_id)
        n_seen["batches"] += 1
        if fail_after_batches is not None and n_seen["batches"] >= fail_after_batches:
            raise RuntimeError("injected failure for kill-and-resume test")

    writer = df.writeStream.foreachBatch(_fb).option(
        "checkpointLocation", cfg.checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start(), applier


def run_to_completion(
    spark: SparkSession, source_dir: str, cfg: EngineConfig, **kw
) -> CdcApply:
    """Bounded replay: consume everything currently in ``source_dir`` and
    stop (the reference's graceful drain, ``cdc/producer.py:27-44``)."""
    q, applier = start_stream(spark, source_dir, cfg, available_now=True, **kw)
    q.awaitTermination()
    return applier


def replay_batches(
    spark: SparkSession,
    dfs,
    cfg: EngineConfig,
    start_batch_id: int = 0,
) -> CdcApply:
    """Batch-mode replay: apply pre-split DataFrames as consecutive batches
    (deterministic batching for tests and benchmarks, no streaming engine)."""
    applier = CdcApply(spark, cfg)
    for i, df in enumerate(dfs):
        applier.apply_batch(df, start_batch_id + i)
    return applier
