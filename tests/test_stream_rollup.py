"""Streaming window rollup: the Structured Streaming surface of
window_rollup — same aggregation builder, plus watermark semantics.

Covers the two contracts the batch oracle cannot:
- append-mode finalization: a window emits exactly once, after the
  watermark passes its end, and the emitted row equals the batch rollup
  over the rows that arrived in time;
- late-data drop: a row older than the watermark whose window already
  closed is discarded, not double-counted and not re-emitted.
"""

import os
import uuid

from pyspark.sql import functions as F

from cdc_spark.functions.temporal import (
    stream_window_rollup,
    window_rollup,
)

_DDL = "ts timestamp, event_type string, value double"


def _write_batch(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, _DDL).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    # the file stream source orders files by modification time; pin it so
    # the two-microbatch sequence below is deterministic
    for f in os.listdir(path):
        full = os.path.join(path, f)
        os.utime(full, (mtime, mtime))


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_stream_rollup_append_and_late_drop(spark, tmpdir_factory_clean):
    src = tmpdir_factory_clean("rollup_src")
    ckpt = tmpdir_factory_clean("rollup_ck")
    # batch 0: three on-time rows in the first three 15-min windows, plus a
    # sentinel at 02:00 that advances the watermark to 01:30 once processed
    early = [
        (_ts("2024-01-01 00:05:00"), "click", 1.25),
        (_ts("2024-01-01 00:20:00"), "click", 2.50),
        (_ts("2024-01-01 00:35:00"), "error", 4.00),
    ]
    _write_batch(spark, os.path.join(src, "b1"),
                 early + [(_ts("2024-01-01 02:00:00"), "click", 8.0)],
                 1_700_000_000)
    # batch 1: a benign fresh row. Microbatch watermark propagation lags one
    # batch: the input filter of batch N uses the watermark derived from
    # batches <= N-1, so batch 0's sentinel governs filtering only from
    # batch 2 on — the late row must therefore arrive in its own THIRD file
    _write_batch(spark, os.path.join(src, "b2"),
                 [(_ts("2024-01-01 02:10:00"), "click", 16.0)],
                 1_700_000_010)
    # batch 2: one LATE row for the long-closed 00:00 window (watermark is
    # 01:30 >= the 00:15 window end -> dropped, window NOT re-emitted)
    _write_batch(spark, os.path.join(src, "b3"),
                 [(_ts("2024-01-01 00:10:00"), "click", 64.0)],
                 1_700_000_020)

    stream = (
        spark.readStream.schema(_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    name = "rollup_" + uuid.uuid4().hex[:8]
    q = (
        stream_window_rollup(stream, minutes=15, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_c"], r["vmax_c"])
        for r in spark.sql(f"select * from {name}").collect()
    }
    # exactly the three early windows finalized; the late 00:10 row is NOT
    # in the 00:00 window's count, and the 02:00/02:10 windows never closed
    expect = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_c"], r["vmax_c"])
        for r in window_rollup(
            spark.createDataFrame(early, _DDL), minutes=15
        ).collect()
    }
    assert got == expect
    assert got[("2024-01-01 00:00:00", "click")] == (1, 125, 125)
    assert dropped == 1  # the late row was discarded by the watermark


def test_stream_rollup_equals_batch_without_late_rows(spark, tmpdir_factory_clean):
    """One-trigger stream over the whole fixture slice == batch rollup
    (all rows on time -> complete agreement on every emittable window)."""
    src = tmpdir_factory_clean("rollup_all")
    ckpt = tmpdir_factory_clean("rollup_ck2")
    e = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("ts", "event_type", "value")
        .filter(F.col("ts") < "2024-01-03")
    )
    data = os.path.join(src, "data")
    e.coalesce(1).write.mode("overwrite").parquet(data)
    # a one-row second file far in the future closes every fixture window
    _write_batch(
        spark, os.path.join(src, "z_fin"),
        [(_ts("2024-06-01 00:00:00"), "fin", 0.0)], 1_700_000_020,
    )
    for f in os.listdir(data):
        os.utime(os.path.join(data, f), (1_700_000_000, 1_700_000_000))

    stream = (
        spark.readStream.schema(_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    name = "rollup_" + uuid.uuid4().hex[:8]
    q = (
        stream_window_rollup(stream, minutes=15, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["win_start"], r["event_type"], r["n_events"], r["value_c"], r["vmax_c"])
        for r in spark.sql(f"select * from {name}").collect()
    )
    expect = sorted(
        (r["win_start"], r["event_type"], r["n_events"], r["value_c"], r["vmax_c"])
        for r in window_rollup(e, minutes=15).collect()
    )
    assert got == expect
