"""The postgres-logical slot state machine (pg_logical.py), tested against
the in-memory replication wire — mirrors the reference's backend tests
(``/root/reference/tests/cdc/sources/backends/test_postgres_logical.py:
59-129``): slot create/resume, flush-position feedback from the commit log
only, WAL reclamation, keepalive cadence, kill-and-resume."""

import os

import pytest
from pyspark.sql import functions as F

from cdc_spark.config import EngineConfig
from cdc_spark.loggen import change_log, to_frames
from cdc_spark.oracle import assert_matches, replay
from cdc_spark.pg_logical import (
    FakeReplicationServer,
    PgLogicalStreamReader,
    SlotError,
)


def _reader(wire, **opts):
    o = {"wire": wire, "slot_name": "s", "keepalive_interval_s": "1000"}
    o.update({k: str(v) for k, v in opts.items()})
    return PgLogicalStreamReader(o)


def test_slot_create_if_absent_and_missing_slot_error():
    srv = FakeReplicationServer.reset("t1")
    _reader("fake://t1")  # creates the slot
    assert "s" in srv.slots
    _reader("fake://t1")  # already exists -> caught, not fatal
    with pytest.raises(SlotError):
        _reader("fake://t1", slot_name="other", create_slot="false")


def test_flush_advances_only_from_commit():
    """The write position moves with reads; the slot's restart LSN moves
    ONLY when Spark commits the batch (reference sources/__init__.py:90-121
    discipline) — and committed WAL is reclaimed."""
    srv = FakeReplicationServer.reset("t2")
    for lsn in range(1, 11):
        srv.append(lsn, f"G|{{\"n\":{lsn}}}")
    r = _reader("fake://t2")
    start = r.initialOffset()
    assert start == {"lsn": -1}
    rows, end = r.read(start)
    assert [l for l, _ in rows] == list(range(1, 11)) and end == {"lsn": 10}
    # read but NOT committed: slot unchanged, WAL retained
    assert srv.restart_lsn("s") == -1 and len(srv.wal) == 10
    # a write-position feedback was sent with the read
    assert (10, None) in srv.feedbacks
    r.commit(end)
    assert srv.restart_lsn("s") == 10 and srv.wal == []


def test_replay_between_offsets_after_crash():
    """A planned-but-uncommitted batch must be re-readable after a restart:
    the WAL survives because nothing was flushed."""
    srv = FakeReplicationServer.reset("t3")
    for lsn in (5, 7, 9, 12):
        srv.append(lsn, f"p{lsn}")
    r1 = _reader("fake://t3")
    rows, end = r1.read(r1.initialOffset())
    assert end == {"lsn": 12}
    # crash: a fresh reader (same wire, same slot) replays the exact range
    r2 = _reader("fake://t3")
    replayed = list(r2.readBetweenOffsets({"lsn": -1}, end))
    assert replayed == [(5, "p5"), (7, "p7"), (9, "p9"), (12, "p12")]
    # partial range too
    assert [l for l, _ in r2.readBetweenOffsets({"lsn": 5}, {"lsn": 9})] == [7, 9]


def test_restart_lsn_advances_exactly_with_commit_log():
    """Kill-and-resume: each committed batch advances the slot to that
    batch's high-watermark, and a restarted reader resumes from it."""
    srv = FakeReplicationServer.reset("t4")
    for lsn in range(1, 7):
        srv.append(lsn, f"p{lsn}")
    r = _reader("fake://t4", max_events_per_batch=2)
    off = r.initialOffset()
    seen, hwms = [], []
    for _ in range(3):
        rows, off = r.read(off)
        seen += [l for l, _ in rows]
        r.commit(off)
        hwms.append(srv.restart_lsn("s"))
    assert seen == [1, 2, 3, 4, 5, 6] and hwms == [2, 4, 6]
    # restart: resumes exactly after the last committed position
    srv.append(7, "p7")
    r2 = _reader("fake://t4")
    assert r2.initialOffset() == {"lsn": 6}
    rows, end = r2.read({"lsn": 6})
    assert [l for l, _ in rows] == [7]


def test_keepalive_cadence():
    srv = FakeReplicationServer.reset("t5")
    r = _reader("fake://t5", keepalive_interval_s=0)
    off = r.initialOffset()
    for _ in range(3):
        _, off = r.read(off)  # idle reads: every one sends a keepalive
    assert srv.keepalives == 3


def test_pg_logical_stream_end_to_end(spark, tmpdir_factory_clean):
    """Full pipeline: fake replication wire -> pg-logical DataSource ->
    parse -> apply -> lake == LSN-ordered oracle across a stop/resume, with
    the slot's flush position advancing from Spark's batch-commit log
    (lazily, trailing by at most one batch — Spark's source-commit
    protocol)."""
    from cdc_spark.stream import start_stream

    srv = FakeReplicationServer.reset("e2e")
    log = change_log(spark, 600, n_repos=10, n_paths=4, delete_rate=0.1,
                     seed=53)
    frames = to_frames(log).orderBy("lsn").collect()
    for row in frames:
        srv.append(row["lsn"], row["value"])
    root = tmpdir_factory_clean("pglog")
    cfg = EngineConfig(lake_root=root, checkpoint=os.path.join(root, "ck"),
                       n_buckets=4)
    conf = {"wire": "fake://e2e", "slot_name": "cdc"}
    q, applier = start_stream(
        spark, None, cfg, source="postgres-logical", source_conf=conf
    )
    q.awaitTermination()
    lake = applier.lake_for("repos")
    assert_matches(lake.read().toPandas(), replay(log.toPandas(), cfg.base_fields))
    # batch 0 is in the lake but its source-commit fires on the NEXT batch:
    # the slot must NOT have advanced past data the engine has not durably
    # confirmed back, and never beyond the lake's own committed hwm
    assert srv.restart_lsn("cdc") <= lake.last_batch["lsn_hwm"]
    # resume with MORE wal: only the new events are applied
    more = change_log(spark, 800, n_repos=10, n_paths=4, delete_rate=0.1,
                      seed=53).filter(F.col("lsn") > 600)
    for row in to_frames(more).orderBy("lsn").collect():
        srv.append(row["lsn"], row["value"])
    q2, applier2 = start_stream(
        spark, None, cfg, source="postgres-logical", source_conf=conf
    )
    q2.awaitTermination()
    full = change_log(spark, 800, n_repos=10, n_paths=4, delete_rate=0.1,
                      seed=53)
    lake2 = applier2.lake_for("repos").refresh()
    assert_matches(lake2.read().toPandas(), replay(full.toPandas(), cfg.base_fields))
    # constructing batch 1 committed batch 0: the slot advanced to 600 and
    # the server reclaimed that WAL
    assert srv.restart_lsn("cdc") == 600
    assert all(l > 600 for l, _ in srv.wal)
    # a third (empty) resume run leaves everything consistent
    q3, applier3 = start_stream(
        spark, None, cfg, source="postgres-logical", source_conf=conf
    )
    q3.awaitTermination()
    lake3 = applier3.lake_for("repos").refresh()
    assert_matches(lake3.read().toPandas(), replay(full.toPandas(), cfg.base_fields))


def test_pg_logical_via_yaml_config(spark, tmpdir_factory_clean):
    """The jsonschema-validated YAML config wires the postgres-logical
    backend end-to-end (what `python -m cdc_spark consumer --config` runs)."""
    from cdc_spark.config import load_config
    from cdc_spark.stream import start_stream

    srv = FakeReplicationServer.reset("yamlcfg")
    log = change_log(spark, 300, n_repos=6, n_paths=3, seed=59)
    for row in to_frames(log).orderBy("lsn").collect():
        srv.append(row["lsn"], row["value"])
    root = tmpdir_factory_clean("pgyaml")
    cfg_path = os.path.join(root, "cdc.yml")
    with open(cfg_path, "w") as fh:
        fh.write(f"""
version: 1
source:
  backend: postgres-logical
  wire: fake://yamlcfg
  slot_name: cdc
lake:
  root: {root}/lake
  checkpoint: {root}/ck
  buckets: 4
""")
    cfg, doc = load_config(cfg_path)
    src = dict(doc["source"])
    backend = src.pop("backend")
    q, applier = start_stream(
        spark, None, cfg, source=backend, source_conf=src
    )
    q.awaitTermination()
    lake = applier.lake_for("repos")
    assert_matches(lake.read().toPandas(), replay(log.toPandas(), cfg.base_fields))


def test_pg_logical_torture_crash_schema_truncate(spark, tmpdir_factory_clean):
    """Torture over the replication source: duplicates, a mid-stream schema
    change, a truncate, AND an injected crash mid-run — the restart must
    replay the planned-but-uncommitted batch via readBetweenOffsets (the
    WAL is retained because the slot only flushes from the commit log) and
    the final lake must equal the LSN-ordered oracle."""
    from cdc_spark.stream import start_stream

    srv = FakeReplicationServer.reset("torture")
    log = change_log(
        spark, 1200, n_repos=12, n_paths=4, delete_rate=0.1, dup_rate=0.05,
        truncate_lsns=(500,),
        schema_changes={300: {"action": "add", "column": "stars",
                              "type": "long"}},
        seed=67,
    )
    for row in to_frames(log).orderBy("lsn").collect():
        srv.append(row["lsn"], row["value"])
    root = tmpdir_factory_clean("pgtort")
    cfg = EngineConfig(lake_root=root, checkpoint=os.path.join(root, "ck"),
                       n_buckets=4)
    conf = {"wire": "fake://torture", "slot_name": "cdc",
            "max_events_per_batch": 300}
    q, _ = start_stream(
        spark, None, cfg, source="postgres-logical", source_conf=conf,
        fail_after_batches=1,
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    # nothing flushed for the crashed batch: its WAL is still on the server
    assert srv.restart_lsn("cdc") < 1200
    # resume until drained (availableNow + prefetched simple reader drains
    # one read per run)
    for _ in range(8):
        q2, applier = start_stream(
            spark, None, cfg, source="postgres-logical", source_conf=conf
        )
        q2.awaitTermination()
    lake = applier.lake_for("repos").refresh()
    assert dict(lake.schema_fields()).get("stars") == "long"
    assert lake.truncate_lsn == 500
    assert_matches(lake.read().toPandas(), replay(log.toPandas(), cfg.base_fields))
