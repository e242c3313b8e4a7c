"""Postgres logical-replication source as a PySpark custom streaming
DataSource — the reference's core connector
(``/root/reference/cdc/sources/backends/postgres_logical.py:137-213``)
re-expressed for the microbatch engine, with the transport INJECTED so the
slot state machine itself is real, tested logic:

- slot create-if-absent on startup (reference ``__get_cursor``,
  ``postgres_logical.py:137-168``),
- resume from the slot's restart LSN across engine restarts,
- standby keepalives on a cadence while reading (``send_keepalive``,
  ``postgres_logical.py:199-213``),
- ``send_feedback(flush_lsn=...)`` advancing the slot ONLY from the commit
  log — Spark calls :meth:`PgLogicalStreamReader.commit` exactly when a
  microbatch is durably committed, which is the reference's
  write-position/flush-position discipline (``cdc/sources/__init__.py:
  90-121``): the WAL below the flushed LSN becomes reclaimable, and a crash
  between offset and commit replays the batch instead of losing it.

The wire protocol is a tiny duck-typed surface (``create_replication_slot /
start_replication / read_message / send_feedback``) so production drops in a
psycopg2 ``LogicalReplicationConnection`` cursor behind the same reader,
while tests (and this container, which has no psycopg2) use
:class:`FakeReplicationServer` — an in-memory Postgres-side model that
enforces the same slot rules (unknown slot errors, WAL retention from
``restart_lsn``, duplicate-create errors).

Rows produced are FRAMED (``lsn BIGINT, value STRING``) — exactly what
``parse.parse_frames`` consumes — so the whole downstream pipeline is
transport-agnostic.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Iterator, Optional, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class SlotError(RuntimeError):
    pass


# --------------------------------------------------------------------- fake
class FakeReplicationServer:
    """FILE-BACKED stand-in for the Postgres side of the replication
    protocol: all state (WAL messages, slot positions, feedback log) lives
    under a directory, because Spark runs a Python data-source reader in a
    separate worker process — an in-memory fake would silently test nothing.
    The durable state also models reality: the server outlives any number
    of consumer restarts.

    It enforces the SERVER rules the reader must respect:

    - a slot must exist before ``start_replication`` (else SlotError);
    - creating an existing slot raises (the reader must catch-and-continue,
      mirroring the reference's already-exists handling);
    - messages are retained from ``restart_lsn``; ``send_feedback`` with a
      flush LSN advances it and RECLAIMS older WAL (so a reader that
      flushed too early can no longer re-read — the test-visible
      consequence of a broken commit discipline);
    - keepalives are logged (cadence assertions).
    """

    def __init__(self, name: str):
        import tempfile

        self.name = name
        self.root = os.path.join(
            tempfile.gettempdir(), "cdc_fake_wire", name
        )
        self._wal_dir = os.path.join(self.root, "wal")
        os.makedirs(self._wal_dir, exist_ok=True)
        self._slots_path = os.path.join(self.root, "slots.json")
        self._fb_path = os.path.join(self.root, "feedbacks.jsonl")
        self._floor_path = os.path.join(self.root, "floor")

    @classmethod
    def get(cls, name: str) -> "FakeReplicationServer":
        return cls(name)

    @classmethod
    def reset(cls, name: str) -> "FakeReplicationServer":
        import shutil
        import tempfile

        shutil.rmtree(
            os.path.join(tempfile.gettempdir(), "cdc_fake_wire", name),
            ignore_errors=True,
        )
        return cls(name)

    # -- durable state helpers
    def _read_slots(self) -> dict:
        if not os.path.exists(self._slots_path):
            return {}
        with open(self._slots_path) as fh:
            return json.load(fh)

    def _write_slots(self, slots: dict) -> None:
        tmp = self._slots_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(slots, fh)
        os.replace(tmp, self._slots_path)

    @property
    def slots(self) -> dict:
        return self._read_slots()

    @property
    def wal(self) -> list:
        out = []
        for fn in sorted(os.listdir(self._wal_dir)):
            with open(os.path.join(self._wal_dir, fn)) as fh:
                out.append((int(fn), fh.read()))
        return out

    @property
    def feedbacks(self) -> list:
        if not os.path.exists(self._fb_path):
            return []
        with open(self._fb_path) as fh:
            return [tuple(json.loads(line)) for line in fh if line.strip()]

    @property
    def keepalives(self) -> int:
        return sum(1 for w, f in self.feedbacks if w is None and f is None)

    # -- producer side (tests append WAL like Postgres would)
    def _appended_floor(self) -> int:
        """Highest LSN ever appended — persisted separately from the WAL
        files so reclamation (``send_feedback`` advancing ``restart_lsn``)
        cannot re-open already-used positions."""
        if not os.path.exists(self._floor_path):
            return -1
        with open(self._floor_path) as fh:
            return int(fh.read().strip() or -1)

    def append(self, lsn: int, payload: str) -> None:
        """Append one message. An identical redelivery of a RETAINED LSN
        is a no-op (at-least-once transport); a different payload at an
        existing LSN, or any append at or below the appended watermark
        once its segment is reclaimed, is rejected — WAL positions are
        final even after the slot's ``restart_lsn`` has passed them."""
        path = os.path.join(self._wal_dir, f"{lsn:018d}")
        if os.path.exists(path):
            with open(path) as fh:
                if fh.read() == payload:
                    return
            raise ValueError(f"conflicting payload for existing lsn {lsn}")
        floor = self._appended_floor()
        if lsn <= floor:
            raise ValueError(
                f"WAL lsns must be appended in order (lsn {lsn} <= "
                f"appended watermark {floor})"
            )
        with open(path, "w") as fh:
            fh.write(payload)
        tmp = self._floor_path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(lsn))
        os.replace(tmp, self._floor_path)

    # -- replication protocol surface (what a psycopg2 cursor offers)
    def create_replication_slot(self, slot_name: str, plugin: str = "wal2json") -> None:
        slots = self._read_slots()
        if slot_name in slots:
            raise SlotError(f'replication slot "{slot_name}" already exists')
        slots[slot_name] = {"plugin": plugin, "restart_lsn": -1}
        self._write_slots(slots)

    def start_replication(self, slot_name: str, start_lsn: int | None = None):
        slots = self._read_slots()
        if slot_name not in slots:
            raise SlotError(f'replication slot "{slot_name}" does not exist')
        lo = max(
            slots[slot_name]["restart_lsn"],
            start_lsn if start_lsn is not None else -1,
        )
        return _FakeCursor(self, slot_name, lo)

    def send_feedback(
        self,
        slot_name: str,
        write_lsn: int | None = None,
        flush_lsn: int | None = None,
    ) -> None:
        with open(self._fb_path, "a") as fh:
            fh.write(json.dumps([write_lsn, flush_lsn]) + "\n")
        if flush_lsn is not None:
            slots = self._read_slots()
            if flush_lsn > slots[slot_name]["restart_lsn"]:
                slots[slot_name]["restart_lsn"] = flush_lsn
                self._write_slots(slots)
                # WAL reclamation: segments at or below the slot's
                # restart_lsn are discarded (single-slot model)
                for fn in os.listdir(self._wal_dir):
                    if int(fn) <= flush_lsn:
                        os.unlink(os.path.join(self._wal_dir, fn))

    def restart_lsn(self, slot_name: str) -> int:
        return self._read_slots()[slot_name]["restart_lsn"]


class _FakeCursor:
    """The reading side of one ``start_replication`` call."""

    def __init__(self, server: FakeReplicationServer, slot: str, after_lsn: int):
        self._server = server
        self._slot = slot
        self._pos = after_lsn
        self._pending: list = []

    def read_message(self) -> Optional[tuple[int, str]]:
        """Next (data_start, payload) after the cursor position, or None
        when caught up (the reference's ``fetch``,
        ``postgres_logical.py:176-181``)."""
        if not self._pending:
            self._pending = [
                m for m in self._server.wal if m[0] > self._pos
            ]
        if not self._pending:
            return None
        msg = self._pending.pop(0)
        self._pos = msg[0]
        return msg

    def send_feedback(self, write_lsn=None, flush_lsn=None) -> None:
        self._server.send_feedback(
            self._slot, write_lsn=write_lsn, flush_lsn=flush_lsn
        )


class Psycopg2Wire:
    """Production wire: the :class:`FakeReplicationServer` duck-typed
    surface over a psycopg2 ``LogicalReplicationConnection`` — the same
    cursor calls the reference makes (``/root/reference/cdc/sources/
    backends/postgres_logical.py:137-213``): ``create_replication_slot``
    with ``REPLICATION_LOGICAL`` + the wal2json plugin (duplicate-slot
    ``ProgrammingError`` mapped to :class:`SlotError` so the reader's
    create-if-absent catch works identically on both wires),
    ``start_replication`` with plugin options, ``read_message`` yielding
    ``(data_start, payload)``, and ``send_feedback(write_lsn/flush_lsn)``.

    One replication connection carries one stream, so repeated
    ``start_replication`` calls (the reader issues one per microbatch with
    an explicit ``start_lsn``) recycle the connection: close, reconnect,
    re-position. Postgres replays retained WAL after the slot's
    ``restart_lsn``, which is exactly the semantics the fake models.

    Boundary note: the fake wire treats ``start_lsn`` as EXCLUSIVE
    (messages strictly after it) while a real ``START_REPLICATION`` is
    inclusive of the position — so on a real server the first message of a
    batch can be a redelivery of the previous batch's last LSN. That is
    at-least-once delivery, which the pipeline already absorbs (LWW dedup
    + idempotent lake commits); it never loses or reorders data.

    ``exclusive = True``: a logical slot admits ONE active consumer, so
    the reader must not hold this wire's stream open across operations —
    it releases (``close``) after each read/feedback, letting a
    crash-recovery replay in a Spark worker (or a restarted driver whose
    predecessor's TCP connection still lingers server-side) take the slot
    without a second-consumer conflict. ``start_replication`` additionally
    absorbs the lingering-connection window itself: SQLSTATE 55006
    ("replication slot ... is active for PID") retries with backoff until
    the server reaps the dead consumer.
    """

    #: one active consumer per slot: release the stream between operations
    exclusive = True
    #: active-slot (55006) retry budget for start_replication: the dead
    #: previous consumer's connection can linger until the server notices
    _ACTIVE_RETRIES = 20
    _ACTIVE_RETRY_WAIT_S = 0.5

    def __init__(self, dsn: str, plugin: str = "wal2json",
                 slot_options: Optional[dict] = None):
        import psycopg2
        from psycopg2.extras import LogicalReplicationConnection

        self._psycopg2 = psycopg2
        self._conn_factory = LogicalReplicationConnection
        self._dsn = dsn
        self._plugin = plugin
        self._slot_options = dict(slot_options or {})
        self._cursor = None

    def _replication_cursor(self):
        cur = self._psycopg2.connect(
            self._dsn, connection_factory=self._conn_factory
        ).cursor()
        return cur

    def create_replication_slot(self, slot_name: str,
                                plugin: str | None = None) -> None:
        from psycopg2.extras import REPLICATION_LOGICAL

        cur = self._replication_cursor()
        try:
            cur.create_replication_slot(
                slot_name, REPLICATION_LOGICAL, plugin or self._plugin
            )
        except self._psycopg2.ProgrammingError as e:
            # reference postgres_logical.py:155-163: the only tolerated
            # ProgrammingError is already-exists; surface it as SlotError
            # so the reader's create-if-absent catch applies. Matched by
            # SQLSTATE 42710 (duplicate_object) first — message text is
            # localized (lc_messages) and version-dependent; the English
            # string is only a fallback for drivers not exposing pgcode.
            if getattr(e, "pgcode", None) == "42710" or (
                str(e).strip()
                == f'replication slot "{slot_name}" already exists'
            ):
                raise SlotError(str(e).strip()) from e
            raise
        finally:
            cur.connection.close()

    def close(self) -> None:
        """Release the current replication stream (and its connection).
        The slot's restart_lsn is durable server-side; a later
        ``start_replication`` resumes from retained WAL."""
        if self._cursor is not None:
            try:
                self._cursor.connection.close()
            except Exception:
                pass
            self._cursor = None

    @staticmethod
    def _is_slot_active_error(e) -> bool:
        # SQLSTATE 55006 (object_in_use) first; the English message is a
        # fallback for drivers not exposing pgcode (text is localized)
        return getattr(e, "pgcode", None) == "55006" or (
            "is active for PID" in str(e)
        )

    def start_replication(self, slot_name: str,
                          start_lsn: int | None = None):
        from psycopg2.extras import REPLICATION_LOGICAL

        self.close()
        kwargs = {"options": self._slot_options} if self._slot_options else {}
        if start_lsn is not None and start_lsn >= 0:
            kwargs["start_lsn"] = start_lsn
        attempt = 0
        while True:
            self._cursor = self._replication_cursor()
            try:
                self._cursor.start_replication(
                    slot_name, REPLICATION_LOGICAL, **kwargs
                )
                return _Psycopg2Cursor(self._cursor)
            except self._psycopg2.Error as e:
                self.close()
                if (
                    not self._is_slot_active_error(e)
                    or attempt >= self._ACTIVE_RETRIES
                ):
                    raise
                attempt += 1
                time.sleep(self._ACTIVE_RETRY_WAIT_S)

    def send_feedback(self, slot_name: str, write_lsn: int | None = None,
                      flush_lsn: int | None = None) -> None:
        kwargs = {}
        if write_lsn is not None:
            kwargs["write_lsn"] = write_lsn
        if flush_lsn is not None:
            kwargs["flush_lsn"] = flush_lsn
        if self._cursor is None:
            raise SlotError("send_feedback before start_replication")
        self._cursor.send_feedback(**kwargs)

    def restart_lsn(self, slot_name: str) -> int:
        """The slot's durable resume point, read off the catalog with a
        plain (non-replication) connection. ``X/Y`` pg_lsn text ->
        ``(X << 32) | Y`` (the integer form ``send_feedback`` takes)."""
        conn = self._psycopg2.connect(self._dsn)
        try:
            with conn.cursor() as cur:
                cur.execute(
                    "SELECT restart_lsn::text FROM pg_replication_slots "
                    "WHERE slot_name = %s", (slot_name,)
                )
                row = cur.fetchone()
        finally:
            conn.close()
        if row is None:
            raise SlotError(
                f'replication slot "{slot_name}" does not exist'
            )
        if row[0] is None:
            return -1
        hi, lo = row[0].split("/")
        return (int(hi, 16) << 32) | int(lo, 16)


class _Psycopg2Cursor:
    """One ``start_replication`` stream: non-blocking drain + feedback."""

    def __init__(self, cursor):
        self._cursor = cursor

    def read_message(self) -> Optional[tuple[int, str]]:
        msg = self._cursor.read_message()
        if msg is None:
            return None
        payload = msg.payload
        if isinstance(payload, (bytes, bytearray, memoryview)):
            payload = bytes(payload).decode("utf-8")
        return (msg.data_start, payload)

    def send_feedback(self, write_lsn=None, flush_lsn=None) -> None:
        kwargs = {}
        if write_lsn is not None:
            kwargs["write_lsn"] = write_lsn
        if flush_lsn is not None:
            kwargs["flush_lsn"] = flush_lsn
        self._cursor.send_feedback(**kwargs)


def connect_wire(url: str, plugin: str = "wal2json",
                 slot_options: Optional[dict] = None):
    """Resolve the injectable wire. ``fake://<name>`` -> the named
    file-backed server; anything else is treated as a Postgres DSN and
    served by :class:`Psycopg2Wire` (requires psycopg2 — not in this
    container, so the DSN path is exercised by the mocked-psycopg2
    contract tests in ``tests/test_pg_logical.py``)."""
    if url.startswith("fake://"):
        return FakeReplicationServer.get(url[len("fake://"):])
    try:
        import psycopg2  # noqa: F401
        from psycopg2.extras import LogicalReplicationConnection  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "postgres-logical with a real DSN needs psycopg2 (not in this "
            "container); use wire='fake://<name>' or front the slot with "
            "the forwarder into Kafka"
        ) from e
    return Psycopg2Wire(url, plugin=plugin, slot_options=slot_options)


# ------------------------------------------------------------- data source
class PgLogicalStreamReader(SimpleDataSourceStreamReader):
    """The slot state machine as a Spark stream reader.

    Offsets are ``{"lsn": <last read LSN>}``. ``read`` drains available
    messages (bounded by ``max_events_per_batch`` — the backpressure knob,
    reference ``BufferError`` retry ``cdc/producer.py:84-94``) and reports
    the write position; ``commit`` is the ONLY path that flushes the slot.
    """

    def __init__(self, options: dict):
        self._slot = options.get("slot_name", "cdc")
        self._wire_url = options.get("wire", "fake://default")
        self._create = str(options.get("create_slot", "true")).lower() == "true"
        self._max_events = int(options.get("max_events_per_batch", 100_000))
        self._keepalive_s = float(options.get("keepalive_interval_s", 10.0))
        self._worker_copy = False
        self._wire = connect_wire(self._wire_url)
        if self._create:
            try:
                self._wire.create_replication_slot(self._slot)
            except SlotError:
                pass  # create-if-absent (reference postgres_logical.py:155-163)
        self._cursor = self._wire.start_replication(self._slot)
        self._start_keepalive_thread()
        # on an exclusive wire (real Postgres: ONE active consumer per
        # slot) the validation stream above must not stay open — a held
        # driver-side stream would lock out the worker-side crash-recovery
        # replay (readBetweenOffsets) and any restarted driver
        self._maybe_release()

    def _start_keepalive_thread(self) -> None:
        # Keepalives on a cadence INDEPENDENT of the trigger interval — the
        # reference schedules send_keepalive as a timed task
        # (postgres_logical.py:199-213); sending only inside read() would
        # drop a real walsender connection whenever the trigger interval
        # (or an idle stream) outlasts wal_sender_timeout.
        self._fb_lock = threading.Lock()
        self._last_keepalive = time.monotonic()
        self._ka_stop = threading.Event()
        self._ka_thread = threading.Thread(
            target=self._keepalive_loop, daemon=True, name="pg-keepalive"
        )
        self._ka_thread.start()

    def __getstate__(self) -> dict:
        """Spark cloudpickles the simple reader into its worker process;
        thread primitives don't pickle, and neither do live psycopg2
        connections — drop them all and rebuild on the other side (the
        wire URL + slot name are sufficient; the slot already exists, so
        the rebuild never re-creates it)."""
        d = self.__dict__.copy()
        for k in ("_fb_lock", "_last_keepalive", "_ka_stop", "_ka_thread",
                  "_wire", "_cursor"):
            d.pop(k, None)
        return d

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)
        # LAZY wire rebuild: a logical slot admits ONE active consumer, so
        # the unpickled worker-side copy must not open a second stream
        # while the driver-side reader still holds its own — connect only
        # when this copy is actually asked to read
        self._wire = None
        self._cursor = None
        self._worker_copy = True
        self._start_keepalive_thread()

    def _ensure_wire(self, open_stream: bool = True) -> None:
        if self._wire is None:
            self._wire = connect_wire(self._wire_url)
            self._cursor = None
        if open_stream and self._cursor is None:
            self._cursor = self._wire.start_replication(self._slot)

    def _maybe_release(self) -> None:
        """Drop the wire between operations when it is EXCLUSIVE (one
        active consumer per slot — the real psycopg2 wire): holding the
        stream would lock out crash-recovery replays and restarted
        drivers, and a closed walsender needs no keepalives (the
        keepalive loop naturally idles while ``_wire is None``). The
        persistent fake wire (and any shared transport) is kept open, so
        keepalive cadence semantics there are unchanged."""
        if self._wire is not None and getattr(self._wire, "exclusive", False):
            close = getattr(self._wire, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass
            self._wire = None
            self._cursor = None

    def _feedback(self, **kwargs) -> None:
        """All slot feedback (data positions AND empty keepalives) goes
        through one lock — the replication cursor is not thread-safe — and
        resets the keepalive clock, mirroring the reference's
        ``commit_positions``/``send_keepalive`` both stamping
        ``__last_keepalive_datetime``.

        Feedback is sent via the WIRE (which always addresses its current
        replication cursor), not a cursor captured at init: on the psycopg2
        wire each ``start_replication`` recycles the connection, so a
        cursor cached by the reader would be closed after the first
        ``read``."""
        with self._fb_lock:
            self._ensure_wire()
            self._wire.send_feedback(self._slot, **kwargs)
            self._last_keepalive = time.monotonic()
            self._maybe_release()

    #: consecutive keepalive failures tolerated before the thread gives up
    #: (a dead wire at shutdown should not spin forever; a transient blip
    #: must NOT kill keepalives for the stream's lifetime)
    _KA_MAX_FAILURES = 60

    def _keepalive_loop(self) -> None:
        failures = 0
        while not self._ka_stop.wait(max(min(self._keepalive_s, 1.0) / 2, 0.01)):
            if self._wire is None:
                continue  # unpickled worker copy: no stream to feed yet
            if time.monotonic() - self._last_keepalive >= self._keepalive_s:
                try:
                    self._feedback()  # empty = standby keepalive
                    failures = 0
                except Exception:
                    failures += 1
                    # retry once per keepalive INTERVAL, not per tick —
                    # the clock reset makes _KA_MAX_FAILURES mean "60
                    # intervals of outage", not ~30 seconds of ticks
                    self._last_keepalive = time.monotonic()
                    if failures >= self._KA_MAX_FAILURES:
                        return  # wire gone for good; stop spinning

    def stop(self) -> None:
        self._ka_stop.set()

    def initialOffset(self) -> dict:
        """First-ever start: begin at the slot's restart LSN (a slot created
        just now starts at -1 = everything retained)."""
        with self._fb_lock:
            self._ensure_wire(open_stream=False)
            try:
                return {"lsn": self._wire.restart_lsn(self._slot)}
            finally:
                self._maybe_release()

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        rows: list[tuple[int, str]] = []
        hwm = start["lsn"]
        # the WHOLE drain holds the feedback lock: the replication cursor
        # is not thread-safe, and a concurrent keepalive mid-drain would
        # interleave send_feedback with read_message on the same cursor.
        # Keepalives pause while data is flowing — which is also when the
        # walsender least needs them — and the write-position feedback at
        # the end resets the keepalive clock.
        with self._fb_lock:
            self._ensure_wire(open_stream=False)
            cur = self._wire.start_replication(self._slot, start_lsn=hwm)
            while len(rows) < self._max_events:
                msg = cur.read_message()
                if msg is None:
                    break
                rows.append(msg)
                hwm = msg[0]
            if rows:
                # write position advances with the read; the FLUSH
                # position only advances in commit()
                # (reference sources/__init__.py:82-106)
                self._wire.send_feedback(self._slot, write_lsn=hwm)
            self._last_keepalive = time.monotonic()
            self._maybe_release()
        return iter(rows), {"lsn": hwm}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        """Deterministic replay of a planned-but-uncommitted batch after a
        crash: the WAL in (start, end] is still retained because the slot
        only flushed through ``commit``."""
        out = []
        with self._fb_lock:
            self._ensure_wire(open_stream=False)
            cur = self._wire.start_replication(
                self._slot, start_lsn=start["lsn"]
            )
            while True:
                msg = cur.read_message()
                if msg is None or msg[0] > end["lsn"]:
                    break
                out.append(msg)
            self._maybe_release()
        if self._worker_copy:
            # a worker-side replay copy is done once its range is read:
            # stop its keepalive thread so it can never keep feeding the
            # slot (ADVICE r4) — the driver-side reader owns keepalives
            self._ka_stop.set()
        return iter(out)

    def commit(self, end: dict) -> None:
        """Spark committed the microbatch ending at ``end`` durably —
        advance the slot's flush position; Postgres may now reclaim the WAL
        at or below it (reference ``commit_positions``,
        ``postgres_logical.py:186-198``).

        Spark invokes this when the NEXT batch is constructed (the engine's
        lazy source-commit protocol, same as its Kafka source), so the slot
        trails the lake by at most one microbatch: WAL retention is bounded
        by one batch, and a crash in the window replays rows the lake's
        idempotent batch-id commits deduplicate — never loses them."""
        if end["lsn"] >= 0:
            self._feedback(write_lsn=end["lsn"], flush_lsn=end["lsn"])


class PgLogicalDataSource(DataSource):
    """``spark.readStream.format("pg-logical")`` — FRAMED rows
    (lsn BIGINT, value STRING), options: slot_name, wire, create_slot,
    max_events_per_batch, keepalive_interval_s."""

    @classmethod
    def name(cls) -> str:
        return "pg-logical"

    def schema(self) -> str:
        return "lsn BIGINT, value STRING"

    def simpleStreamReader(self, schema) -> PgLogicalStreamReader:
        return PgLogicalStreamReader(self.options)


def register(spark) -> None:
    """Register the data source with a session. Registration is a map-put
    on the session's data-source registry (re-registering the same name
    overwrites), so this is safe to call unconditionally — caching by
    ``id(spark)`` would misfire when a stopped session's id is reused."""
    spark.dataSource.register(PgLogicalDataSource)
