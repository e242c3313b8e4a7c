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
    """Keepalives run on a BACKGROUND cadence independent of the trigger
    (the reference schedules ``send_keepalive`` as a timed task,
    postgres_logical.py:199-213): an idle stream with zero read() calls
    still feeds the walsender, so a trigger interval longer than
    wal_sender_timeout can't drop the connection."""
    import time

    srv = FakeReplicationServer.reset("t5")
    r = _reader("fake://t5", keepalive_interval_s=0.05)
    try:
        deadline = time.monotonic() + 5.0
        while srv.keepalives < 3 and time.monotonic() < deadline:
            time.sleep(0.02)
    finally:
        r.stop()
    assert srv.keepalives >= 3  # no read() ever issued


def test_wal_positions_final_after_reclamation():
    """Once ``send_feedback`` reclaims segments, appends at or below the
    appended watermark are rejected even though the WAL dir is empty —
    positions are final; a 'new' message there would be silently
    undeliverable to the resumed slot."""
    srv = FakeReplicationServer.reset("t5b")
    for lsn in (1, 2, 3):
        srv.append(lsn, f"p{lsn}")
    srv.append(3, "p3")  # identical redelivery of retained WAL: no-op
    srv.create_replication_slot("s")
    srv.send_feedback("s", flush_lsn=3)  # reclaims everything
    assert srv.wal == []
    with pytest.raises(ValueError, match="appended watermark"):
        srv.append(3, "p3")  # reclaimed: position is final
    with pytest.raises(ValueError, match="appended watermark"):
        srv.append(2, "px")
    srv.append(4, "p4")  # strictly above the watermark: fine


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


# ---------------------------------------------------- psycopg2 wire contract
class _MockPg:
    """A mocked psycopg2 surface (module + extras + server state) asserting
    the exact cursor call sequence the reference makes
    (``/root/reference/cdc/sources/backends/postgres_logical.py:137-213``).
    psycopg2 is absent in this container, so the Psycopg2Wire adapter is
    contract-tested against this stand-in injected into sys.modules."""

    class Error(Exception):
        pass

    class ProgrammingError(Error):
        pass

    class OperationalError(Error):
        pass

    class LogicalReplicationConnection:
        pass

    REPLICATION_LOGICAL = 7  # sentinel — must be passed through verbatim

    def __init__(self):
        self.slots = {}       # name -> restart lsn text ("X/Y") or None
        self.wal = []         # [(data_start, payload bytes)]
        self.calls = []       # flat call log across all connections
        self.open_conns = []
        #: raise this many SQLSTATE-55006 active-slot errors on
        #: start_replication before succeeding (the lingering dead
        #: consumer window the wire must retry through)
        self.active_failures = 0

    # -- module surface
    def connect(self, dsn, connection_factory=None):
        conn = _MockConn(self, dsn, connection_factory)
        self.open_conns.append(conn)
        return conn

    def install(self, monkeypatch):
        import sys
        import types

        mod = types.ModuleType("psycopg2")
        mod.connect = self.connect
        mod.Error = _MockPg.Error
        mod.ProgrammingError = _MockPg.ProgrammingError
        mod.OperationalError = _MockPg.OperationalError
        extras = types.ModuleType("psycopg2.extras")
        extras.LogicalReplicationConnection = _MockPg.LogicalReplicationConnection
        extras.REPLICATION_LOGICAL = _MockPg.REPLICATION_LOGICAL
        mod.extras = extras
        monkeypatch.setitem(sys.modules, "psycopg2", mod)
        monkeypatch.setitem(sys.modules, "psycopg2.extras", extras)


class _MockConn:
    def __init__(self, server, dsn, factory):
        self.server = server
        self.dsn = dsn
        self.factory = factory
        self.closed = False

    def cursor(self):
        if self.factory is _MockPg.LogicalReplicationConnection:
            return _MockReplCursor(self)
        return _MockPlainCursor(self)

    def close(self):
        self.closed = True


class _MockMsg:
    def __init__(self, data_start, payload):
        self.data_start = data_start
        self.payload = payload


class _MockReplCursor:
    """What a psycopg2 LogicalReplicationConnection cursor offers. Every
    operation checks the connection is still open — the round-4 review
    found the reader sending feedback through a cursor whose connection a
    later start_replication had recycled; the mock must model that."""

    def __init__(self, conn):
        self.connection = conn
        self._server = conn.server
        self._stream = None

    def _check_open(self):
        if self.connection.closed:
            raise RuntimeError("connection already closed")

    def create_replication_slot(self, name, repl_type, plugin):
        self._check_open()
        self._server.calls.append(("create_slot", name, repl_type, plugin))
        if name in self._server.slots:
            raise _MockPg.ProgrammingError(
                f'replication slot "{name}" already exists\n'
            )
        self._server.slots[name] = "0/0"

    def start_replication(self, name, repl_type, options=None, start_lsn=None):
        self._check_open()
        self._server.calls.append(
            ("start_replication", name, repl_type, options, start_lsn)
        )
        if name not in self._server.slots:
            raise _MockPg.ProgrammingError(
                f'replication slot "{name}" does not exist'
            )
        if self._server.active_failures > 0:
            self._server.active_failures -= 1
            e = _MockPg.OperationalError(
                f'replication slot "{name}" is active for PID 4242'
            )
            e.pgcode = "55006"
            raise e
        lo = start_lsn if start_lsn is not None else -1
        self._stream = [m for m in self._server.wal if m[0] > lo]

    def read_message(self):
        self._check_open()
        if not self._stream:
            return None
        lsn, payload = self._stream.pop(0)
        return _MockMsg(lsn, payload)

    def send_feedback(self, **kw):
        self._check_open()
        self._server.calls.append(("send_feedback", kw))
        flush = kw.get("flush_lsn")
        if flush is not None:
            # walsender advances the slot's catalog restart_lsn
            for name in self._server.slots:
                self._server.slots[name] = f"{flush >> 32:X}/{flush & 0xFFFFFFFF:X}"


class _MockPlainCursor:
    def __init__(self, conn):
        self._server = conn.server
        self._row = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def execute(self, sql, params):
        self._server.calls.append(("sql", sql, params))
        assert "pg_replication_slots" in sql
        name = params[0]
        self._row = (
            (self._server.slots[name],) if name in self._server.slots else None
        )

    def fetchone(self):
        return self._row


def test_psycopg2_wire_slot_contract(monkeypatch):
    """create-if-absent: fresh create passes REPLICATION_LOGICAL + plugin;
    a duplicate surfaces as SlotError (the reader's catch), any other
    ProgrammingError propagates; the one-shot connections are closed."""
    from cdc_spark.pg_logical import Psycopg2Wire

    pg = _MockPg()
    pg.install(monkeypatch)
    wire = Psycopg2Wire("postgres://db/x", plugin="wal2json")
    wire.create_replication_slot("cdc")
    assert pg.calls[-1] == ("create_slot", "cdc", _MockPg.REPLICATION_LOGICAL,
                            "wal2json")
    with pytest.raises(SlotError):
        wire.create_replication_slot("cdc")  # duplicate -> SlotError
    assert all(c.closed for c in pg.open_conns)  # one-shot conns closed


def test_psycopg2_wire_stream_and_feedback(monkeypatch):
    """start_replication passes plugin options + start_lsn and recycles the
    prior connection; read_message maps to (data_start, utf-8 payload);
    send_feedback forwards only the kwargs given."""
    from cdc_spark.pg_logical import Psycopg2Wire

    pg = _MockPg()
    pg.install(monkeypatch)
    pg.slots["cdc"] = "0/0"
    pg.wal = [(5, b"G|{}"), (9, b"M|repos|{\"k\":1}")]
    wire = Psycopg2Wire("postgres://db/x",
                        slot_options={"include-xids": "1"})
    cur = wire.start_replication("cdc", start_lsn=5)
    assert pg.calls[-1] == ("start_replication", "cdc",
                            _MockPg.REPLICATION_LOGICAL,
                            {"include-xids": "1"}, 5)
    assert cur.read_message() == (9, 'M|repos|{"k":1}')  # bytes -> str
    assert cur.read_message() is None
    first_conn = pg.open_conns[-1]
    wire.send_feedback("cdc", write_lsn=9)
    assert pg.calls[-1] == ("send_feedback", {"write_lsn": 9})
    wire.send_feedback("cdc", write_lsn=9, flush_lsn=9)
    assert pg.calls[-1] == ("send_feedback", {"write_lsn": 9, "flush_lsn": 9})
    wire.start_replication("cdc", start_lsn=9)  # re-position
    assert first_conn.closed  # one replication stream per connection


def test_psycopg2_wire_restart_lsn_parse(monkeypatch):
    """restart_lsn reads the catalog over a PLAIN connection and parses
    pg_lsn 'X/Y' text into the integer send_feedback takes."""
    from cdc_spark.pg_logical import Psycopg2Wire

    pg = _MockPg()
    pg.install(monkeypatch)
    pg.slots["cdc"] = "1/16B2D08"
    wire = Psycopg2Wire("postgres://db/x")
    assert wire.restart_lsn("cdc") == (1 << 32) | 0x16B2D08
    # the catalog read must NOT use the replication connection factory
    assert pg.open_conns[-1].factory is None
    pg.slots["cdc"] = None  # slot exists, never advanced
    assert wire.restart_lsn("cdc") == -1
    with pytest.raises(SlotError):
        wire.restart_lsn("ghost")


def test_reader_over_psycopg2_wire_end_to_end(monkeypatch):
    """The full slot state machine runs unchanged over the psycopg2 wire:
    create-if-absent, resume from catalog restart_lsn, drain, commit ->
    flush feedback. Proves the adapter is a drop-in for the fake."""
    pg = _MockPg()
    pg.install(monkeypatch)
    pg.wal = [(1, b"p1"), (2, b"p2"), (3, b"p3")]
    r = PgLogicalStreamReader(
        {"wire": "postgres://db/x", "slot_name": "cdc",
         "keepalive_interval_s": "1000"}
    )
    try:
        assert ("create_slot", "cdc", _MockPg.REPLICATION_LOGICAL,
                "wal2json") in pg.calls
        start = r.initialOffset()
        assert start == {"lsn": 0}  # catalog "0/0"
        rows, end = r.read(start)
        assert [l for l, _ in rows] == [1, 2, 3] and end == {"lsn": 3}
        assert ("send_feedback", {"write_lsn": 3}) in pg.calls
        r.commit(end)
        assert pg.calls[-1] == ("send_feedback",
                                {"write_lsn": 3, "flush_lsn": 3})
        assert pg.slots["cdc"] == "0/3"
    finally:
        r.stop()


def test_exclusive_wire_released_between_operations(monkeypatch):
    """ADVICE r4 (pg_logical.py:542): the reader must NOT hold a
    replication stream open between operations on the real wire — a
    logical slot admits ONE active consumer, so a held driver-side stream
    locks out the worker-side crash-recovery replay. After init, read,
    and commit, every mock connection is closed and the reader holds no
    wire."""
    pg = _MockPg()
    pg.install(monkeypatch)
    pg.wal = [(1, b"p1"), (2, b"p2")]
    r = PgLogicalStreamReader(
        {"wire": "postgres://db/x", "slot_name": "cdc",
         "keepalive_interval_s": "1000"}
    )
    try:
        assert r._wire is None and all(c.closed for c in pg.open_conns)
        rows, end = r.read(r.initialOffset())
        assert [l for l, _ in rows] == [1, 2] and end == {"lsn": 2}
        assert r._wire is None and all(c.closed for c in pg.open_conns)
        r.commit(end)
        assert r._wire is None and all(c.closed for c in pg.open_conns)
    finally:
        r.stop()


def test_active_slot_error_retries_until_freed(monkeypatch):
    """A dying consumer's connection can linger server-side; the wire's
    start_replication must absorb SQLSTATE 55006 with retries instead of
    crash-looping the stream exactly when it is recovering."""
    from cdc_spark.pg_logical import Psycopg2Wire

    pg = _MockPg()
    pg.install(monkeypatch)
    pg.slots["cdc"] = "0/0"
    pg.wal = [(1, b"p1")]
    pg.active_failures = 2
    wire = Psycopg2Wire("postgres://db/x")
    monkeypatch.setattr(Psycopg2Wire, "_ACTIVE_RETRY_WAIT_S", 0.01)
    cur = wire.start_replication("cdc")
    assert cur.read_message() == (1, "p1")
    # budget exhausted -> the error propagates
    pg.active_failures = 10_000
    monkeypatch.setattr(Psycopg2Wire, "_ACTIVE_RETRIES", 2)
    with pytest.raises(_MockPg.OperationalError):
        wire.start_replication("cdc")
    # a NON-active error is never retried
    pg.active_failures = 0
    with pytest.raises(_MockPg.ProgrammingError):
        wire.start_replication("ghost")


def test_worker_replay_copy_releases_slot_and_stops_keepalive(monkeypatch):
    """The unpickled worker-side copy replaying a crashed batch must (a)
    take the slot (possible now the driver releases between operations),
    (b) release it again after the replay, and (c) stop its keepalive
    thread so it can never keep feeding the slot (ADVICE r4)."""
    import pickle

    pg = _MockPg()
    pg.install(monkeypatch)
    pg.wal = [(1, b"p1"), (2, b"p2"), (3, b"p3")]
    r = PgLogicalStreamReader(
        {"wire": "postgres://db/x", "slot_name": "cdc",
         "keepalive_interval_s": "1000"}
    )
    try:
        worker = pickle.loads(pickle.dumps(r))
        assert worker._worker_copy and not r._worker_copy
        try:
            rows = list(
                worker.readBetweenOffsets({"lsn": 1}, {"lsn": 3})
            )
            assert [l for l, _ in rows] == [2, 3]
            assert worker._wire is None
            assert all(c.closed for c in pg.open_conns)
            assert worker._ka_stop.is_set()  # keepalives stopped for good
            assert not r._ka_stop.is_set()   # driver's keepalives live on
        finally:
            worker.stop()
    finally:
        r.stop()
