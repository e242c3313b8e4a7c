"""Streaming session rollup: the Structured Streaming surface of
session_rollup — Spark's built-in session_window stateful operator, same
aggregation builder as the batch query. Covers session MERGE across
microbatches, append-mode finalization, watermark late-drop, and
stream==batch equality on the fixture slice."""

import os
import uuid

from pyspark.sql import functions as F

from cdc_spark.functions.temporal import (
    session_rollup,
    stream_session_rollup,
)

_DDL = "user_id bigint, ts timestamp, value double"


def _write_batch(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, _DDL).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def _run(spark, src, ckpt):
    stream = (
        spark.readStream.schema(_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    name = "sess_" + uuid.uuid4().hex[:8]
    q = (
        stream_session_rollup(stream, gap_min=30, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    rows = spark.sql(f"select * from {name}").collect()
    return rows, dropped


def _key(rows):
    return sorted(
        (r["user_id"], r["sess_start"], r["sess_end"], r["n_events"], r["value_c"])
        for r in rows
    )


def test_stream_session_merge_finalize_and_late_drop(
    spark, tmpdir_factory_clean
):
    src = tmpdir_factory_clean("sess_src")
    ckpt = tmpdir_factory_clean("sess_ck")
    # user 1's single session arrives SPLIT ACROSS MICROBATCHES (00:05 in
    # b1, 00:25 in b2 — 20 min apart, one session): the state store must
    # merge them. user 2 pins the boundary: an exact 30-min gap MERGES
    # (touching [ts, ts+gap) spans are one session — split is strictly >
    # gap) while 30:01 SPLITS.
    b1 = [
        (1, _ts("2024-01-01 00:05:00"), 1.25),
        (2, _ts("2024-01-01 00:00:00"), 4.00),
        (2, _ts("2024-01-01 00:30:00"), 8.00),
        (2, _ts("2024-01-01 01:00:01"), 16.00),
    ]
    b2 = [
        (1, _ts("2024-01-01 00:25:00"), 2.50),
        # sentinel: advances the watermark to 05:30 once processed
        (9, _ts("2024-01-01 06:00:00"), 0.0),
    ]
    _write_batch(spark, os.path.join(src, "b1"), b1, 1_700_000_000)
    _write_batch(spark, os.path.join(src, "b2"), b2, 1_700_000_010)
    # b3: benign row keeps the stream going so the late row lands under
    # the b2-derived watermark filter (one-batch propagation lag)
    _write_batch(
        spark, os.path.join(src, "b4"),
        [(9, _ts("2024-01-01 06:10:00"), 0.0)], 1_700_000_020,
    )
    # b4: LATE row for user 1's long-closed session -> dropped
    _write_batch(
        spark, os.path.join(src, "b5"),
        [(1, _ts("2024-01-01 00:10:00"), 64.0)], 1_700_000_030,
    )

    rows, dropped = _run(spark, src, ckpt)
    got = _key(rows)
    expect = _key(
        session_rollup(
            spark.createDataFrame(b1 + b2[:1], _DDL), gap_min=30
        ).collect()
    )
    assert got == expect
    # the cross-batch merge produced ONE user-1 session of 2 events
    u1 = [r for r in got if r[0] == 1]
    assert u1 == [(1, "2024-01-01 00:05:00", "2024-01-01 00:55:00", 2, 375)]
    # exact-30-min gap merged (00:00 + 00:30 one session), 30:01 split
    u2 = [r for r in got if r[0] == 2]
    assert len(u2) == 2
    assert u2[0] == (2, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 2, 1200)
    assert u2[1][1] == "2024-01-01 01:00:01"
    assert dropped == 1


def test_stream_session_equals_batch_without_late_rows(
    spark, tmpdir_factory_clean
):
    src = tmpdir_factory_clean("sess_all")
    ckpt = tmpdir_factory_clean("sess_ck2")
    e = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts", "value")
        .filter(F.col("ts") < "2024-01-03")
    )
    data = os.path.join(src, "data")
    e.coalesce(1).write.mode("overwrite").parquet(data)
    for f in os.listdir(data):
        os.utime(os.path.join(data, f), (1_700_000_000, 1_700_000_000))
    # far-future one-row file closes every fixture session
    _write_batch(
        spark, os.path.join(src, "z_fin"),
        [(999999, _ts("2024-06-01 00:00:00"), 0.0)], 1_700_000_020,
    )

    rows, _ = _run(spark, src, ckpt)
    got = _key(rows)
    expect = _key(session_rollup(e, gap_min=30).collect())
    assert got == expect
