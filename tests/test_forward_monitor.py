"""Forwarding mode (the reference's producer product) + observability:
StreamMessage shape, frame round-trip through the sink, progress listener,
stateful LSN-gap monitor."""

import os

from pyspark.sql import functions as F

from cdc_spark.config import EngineConfig
from cdc_spark.forward import kafka_available, start_forward, to_stream_messages
from cdc_spark.loggen import change_log, write_segments
from cdc_spark.monitor import ProgressRecorder, lsn_gap_monitor
from cdc_spark.parse import parse_frames


def test_stream_message_shape_and_headers(spark):
    log = change_log(spark, 200, n_repos=5, seed=71)
    msgs = to_stream_messages(log)
    row = msgs.filter(F.decode("value", "UTF-8").startswith("M|")).first()
    headers = {h["key"]: bytes(h["value"]).decode() for h in row["headers"]}
    assert headers["table"] == "repos"
    assert headers["lsn"].isdigit()
    key = bytes(row["key"]).decode()
    assert key.startswith("repo-") and "|src/" in key


def test_forward_roundtrip_through_file_sink(spark, tmpdir_factory_clean):
    """Producer writes StreamMessages; a consumer parsing the sink's framed
    values recovers the original envelope (the docker integration test of
    the reference, minus docker)."""
    root = tmpdir_factory_clean("fw")
    log = change_log(spark, 500, n_repos=8, delete_rate=0.1, seed=73)
    write_segments(log, os.path.join(root, "wal"), seg_size=100)
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "ckpt"), n_buckets=4
    )
    q = start_forward(
        spark, os.path.join(root, "wal"), cfg,
        sink="parquet", sink_path=os.path.join(root, "sink"),
    )
    q.awaitTermination()
    sunk = spark.read.parquet(os.path.join(root, "sink"))
    assert sunk.count() == 500
    # consumer side: decode value frames back to the envelope
    frames = sunk.select(
        F.element_at(
            F.filter("headers", lambda h: h["key"] == "lsn"), 1
        )["value"].cast("string").cast("bigint").alias("lsn"),
        F.decode("value", "UTF-8").alias("value"),
    )
    parsed = parse_frames(frames)
    a = log.select("lsn", "op", "repo", "path", "content").orderBy("lsn").collect()
    b = parsed.select("lsn", "op", "repo", "path", "content").orderBy("lsn").collect()
    assert a == b


def test_kafka_gated(spark):
    assert kafka_available(spark) is False  # no jar in this container


def test_progress_listener(spark, tmpdir_factory_clean):
    root = tmpdir_factory_clean("pl")
    log = change_log(spark, 300, n_repos=5, seed=79)
    write_segments(log, os.path.join(root, "wal"), seg_size=100)
    rec = ProgressRecorder(os.path.join(root, "progress"))
    spark.streams.addListener(rec)
    try:
        cfg = EngineConfig(
            lake_root=root, checkpoint=os.path.join(root, "ckpt"), n_buckets=4,
            max_files_per_trigger=2,
        )
        from cdc_spark.stream import run_to_completion

        run_to_completion(spark, os.path.join(root, "wal"), cfg)
        import glob
        import time

        import pandas as pd

        total = 0
        for _ in range(40):  # listener delivery is async
            files = glob.glob(os.path.join(root, "progress", "*.parquet"))
            total = (
                sum(int(pd.read_parquet(f)["num_input_rows"].sum()) for f in files)
                if files
                else 0
            )
            if total >= 300:
                break
            time.sleep(0.5)
        assert total == 300
    finally:
        spark.streams.removeListener(rec)


def test_lsn_gap_monitor(spark, tmpdir_factory_clean):
    """Gaps in delivered LSNs are surfaced; duplicates are not gaps."""
    root = tmpdir_factory_clean("gap")
    log = change_log(spark, 100, n_repos=4, seed=83)
    # drop lsns 40..49, duplicate 10..19
    holey = log.filter(~F.col("lsn").between(40, 49)).unionByName(
        log.filter(F.col("lsn").between(10, 19))
    )
    write_segments(holey, os.path.join(root, "wal"), seg_size=30)

    from cdc_spark.config import ENVELOPE_DDL

    src = (
        spark.readStream.schema(ENVELOPE_DDL)
        .parquet(os.path.join(root, "wal", "seg=*"))
    )
    gaps = lsn_gap_monitor(src)
    q = (
        gaps.writeStream.format("memory")
        .queryName("gaps")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["gap_start"], r["gap_end"])
        for r in spark.sql("SELECT * FROM gaps").collect()
    }
    assert (40, 49) in got
    # nothing below 40 is a gap (dups are benign)
    assert all(s >= 40 for s, _ in got)


def test_stats_emitter_statsd_wire():
    """Push-style live stats: DogStatsD wire format over UDP loopback
    (reference cdc/utils/stats.py:17-65 — sampled timings; errors are
    fire-and-forget)."""
    import socket
    import time

    from cdc_spark.monitor import StatsEmitter

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5)
    port = rx.getsockname()[1]
    em = StatsEmitter("127.0.0.1", port, namespace="cdc")
    em.message_flushed(time.time() - 0.25)
    msg = rx.recv(1024).decode()
    assert msg.startswith("cdc.message_flushed:")
    assert msg.endswith("|ms")
    assert 200 <= int(msg.split(":")[1].split("|")[0]) < 1500
    em.task_executed(time.time() - 0.1, "merge")
    msg2 = rx.recv(1024).decode()
    assert msg2.startswith("cdc.task_executed:")
    assert msg2.endswith("|#tasktype:merge")
    # sampling rate encodes on the wire
    em.timing("x", 42, sample_rate=0.999)
    msg3 = rx.recv(1024).decode()
    assert msg3 == "cdc.x:42|ms|@0.999"
    # fire-and-forget: closed socket must not raise
    em.close()
    em2 = StatsEmitter("127.0.0.1", port)
    em2._sock.close()
    em2.timing("y", 1)  # no raise
    rx.close()
