"""Streaming pgoutput wire: the binary front end driven through the REAL
Structured Streaming pipeline (file-segments source, wire_format=pgoutput,
foreachBatch decode with the persistent Relation registry), including
kill-and-resume across a schema change."""

import os

import pytest
from pyspark.sql import functions as F

from cdc_spark.config import EngineConfig
from cdc_spark.loggen import change_log, write_segments
from cdc_spark.oracle import assert_matches, replay
from cdc_spark.pgoutput import PgOutputDecoder, encode_envelope
from cdc_spark.stream import run_to_completion, start_stream

SCHEMA_CHANGES = {
    700: {"action": "add", "column": "stars", "type": "long"},
}


def _wire_segments(spark, base, n=2000, **log_kw):
    log = change_log(
        spark, n, n_repos=25, delete_rate=0.1,
        truncate_lsns=(1200,), schema_changes=SCHEMA_CHANGES, seed=11,
        **log_kw,
    )
    wire = encode_envelope(log, SCHEMA_CHANGES)
    # in-order delivery (shuffle_window=0): a real WAL stream never
    # reorders, and the streaming decoder requires a Relation to arrive no
    # later than the first data message it governs
    write_segments(wire, f"{base}/wal", seg_size=250)
    return log


def test_pgoutput_stream_end_to_end(spark, tmpdir_factory_clean):
    base = tmpdir_factory_clean("pgow")
    log = _wire_segments(spark, base)
    cfg = EngineConfig(
        lake_root=f"{base}/lake", checkpoint=f"{base}/ckpt",
        n_buckets=4, max_files_per_trigger=2,
    )
    applier = run_to_completion(
        spark, None, cfg,
        source_conf={"path": f"{base}/wal", "wire_format": "pgoutput"},
    )
    lake = applier.lake_for("repos")
    assert_matches(lake.read().toPandas(), replay(log.toPandas(), cfg.base_fields))
    # the schema-evolved column materialized as a real lake column
    assert "stars" in lake.read().columns
    # the relation registry persisted exactly the two schema versions
    dec = PgOutputDecoder(os.path.join(cfg.lake_root, "_pgoutput_relations.json"))
    assert [len(v[2]) for v in dec._timeline[1]] == [5, 6]


def test_pgoutput_stream_kill_and_resume(spark, tmpdir_factory_clean):
    """Crash mid-stream (after the batch containing the schema change),
    resume from checkpoint: the registry merge + schema_change derivation
    must be idempotent and the final lake identical to the oracle."""
    base = tmpdir_factory_clean("pgor")
    log = _wire_segments(spark, base)
    cfg = EngineConfig(
        lake_root=f"{base}/lake", checkpoint=f"{base}/ckpt",
        n_buckets=4, max_files_per_trigger=1,
    )
    conf = {"path": f"{base}/wal", "wire_format": "pgoutput"}
    q, _ = start_stream(
        spark, None, cfg, source_conf=conf, fail_after_batches=4
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    # resume: a FRESH decoder instance reloads the registry from disk
    applier = run_to_completion(spark, None, cfg, source_conf=conf)
    lake = applier.lake_for("repos")
    assert_matches(lake.read().toPandas(), replay(log.toPandas(), cfg.base_fields))
    live = lake.read()
    post = log.filter(
        (F.col("lsn") > 700) & F.col("op").isin("insert", "update")
    ).count()
    assert post > 0  # the schema-evolved era actually carried rows
    assert "stars" in live.columns
