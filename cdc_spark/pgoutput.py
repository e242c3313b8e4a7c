"""pgoutput (Postgres's in-core logical-decoding plugin) wire decode.

The reference only speaks its own ``B|/C|/G/M|<table>|<json>`` text frames
fed by wal2json (``/root/reference/cdc/sources/backends/postgres_logical.py:
37-80``); real deployments increasingly run the built-in ``pgoutput``
binary plugin instead (no extension install needed). This module makes the
engine a drop-in consumer of that wire too: ``parse_pgoutput`` turns an
``(lsn BIGINT, value BINARY)`` stream of pgoutput messages into the exact
``ENVELOPE_DDL`` frame ``parse.parse_frames`` emits, so everything
downstream (LWW dedup, lake merge, schema evolution, near-dup index) is
unchanged.

Message formats are the published PostgreSQL protocol ("Logical Streaming
Replication > Message Formats"): single ASCII type byte, big-endian ints,
NUL-terminated strings, TupleData = Int16 ncols then per-column
``n``(null) / ``u``(unchanged toast) / ``t``(text: Int32 len + bytes).
The per-DML LSN is NOT in the message body — the replication stream's
XLogData header carries it, which is why the input here is ``(lsn,
value)`` exactly like the ``pg_logical`` source's envelope.

Spark-first split of the work:

- Message-type routing, the envelope lift (parallel arrays -> map -> typed
  base columns + ``extra``), and all downstream transforms are JVM column
  expressions.
- The variable-length binary walk itself is genuinely inexpressible as
  column expressions (nested length-prefixed fields, NUL scans), so it
  runs as Arrow-batched ``mapInPandas`` — the same seam the multimodal
  ops use; zero per-row Python crosses the JVM boundary outside Arrow.
- ``Relation`` messages define the column set for every later DML on that
  relation id. They are O(#tables x #schema-changes) — a control-plane
  cardinality — so they are parsed first, collected (capped), diffed into
  the engine's ``schema_change`` events (add/drop/retype, same JSON the
  reference-style control frames carry), and broadcast to the data-message
  decoder as an as-of timeline: each DML resolves its column names against
  the latest Relation at-or-before its LSN, exactly the stream semantics
  (a Relation message precedes first use and every schema change).

Caveats (documented, not silent): ``u`` (unchanged-TOAST) columns are
omitted from the emitted row — the engine's LWW apply is whole-row
replacement, so sources should run REPLICA IDENTITY FULL if very wide
TOASTed values must survive partial updates. ``b`` (binary-mode) tuple
values are hex-encoded strings.
"""

from __future__ import annotations

import json
import os
from bisect import bisect_right
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parse import BASE_COLUMNS, envelope_base_extra, lock_envelope

#: intermediate frame shape (mirrors what wal2json decode sees)
PGOUT_FRAME_DDL = (
    "lsn BIGINT, op STRING, `table` STRING, "
    "columnnames ARRAY<STRING>, columnvalues ARRAY<STRING>, "
    "schema_change STRING"
)

REL_DDL = (
    "lsn BIGINT, relid BIGINT, namespace STRING, relname STRING, "
    "colnames ARRAY<STRING>, coltypes ARRAY<STRING>"
)

#: relation-timeline collect cap — #tables x #schema-changes is control
#: plane, not data plane; blowing this means the stream is misrouted.
MAX_RELATIONS = 65_536

# public type-OID map for the envelope's logical types (pg_type.dat);
# anything else decodes as "string" (values are text-mode anyway)
_OID_TO_TYPE = {
    16: "boolean",
    20: "long",
    21: "long",
    23: "long",
    700: "double",
    701: "double",
    1082: "date",
    1114: "timestamp",
    1184: "timestamp",
}
_TYPE_TO_OID = {
    "string": 25,
    "boolean": 16,
    "long": 20,
    "double": 701,
    "date": 1082,
    "timestamp": 1114,
}
_NUMERIC_OID = 1700
_VARHDRSZ = 4  # numeric typmod carries ((precision<<16)|scale)+VARHDRSZ


def _oid_to_type(oid: int, typmod: int) -> str:
    if oid == _NUMERIC_OID:
        if typmod >= _VARHDRSZ:
            m = typmod - _VARHDRSZ
            return f"decimal({(m >> 16) & 0xFFFF},{m & 0xFFFF})"
        return "decimal(38,9)"
    return _OID_TO_TYPE.get(oid, "string")


def _type_to_oid(t: str) -> tuple[int, int]:
    if t.startswith("decimal"):
        try:
            p, s = t[t.index("(") + 1 : t.rindex(")")].split(",")
            return _NUMERIC_OID, ((int(p) << 16) | int(s)) + _VARHDRSZ
        except ValueError:
            return _NUMERIC_OID, -1
    return _TYPE_TO_OID.get(t, 25), -1


# ---------------------------------------------------------------------------
# byte-level walkers (run inside Arrow batches only)
# ---------------------------------------------------------------------------


def _cstr(b: bytes, o: int) -> tuple[str, int]:
    e = b.index(0, o)
    return b[o:e].decode("utf-8"), e + 1


def _i(b: bytes, o: int, n: int) -> int:
    return int.from_bytes(b[o : o + n], "big")


def _tuple_data(b: bytes, o: int) -> tuple[list[str | None], int]:
    """TupleData -> per-column text values (None for null/unchanged)."""
    ncols = _i(b, o, 2)
    o += 2
    vals: list[str | None] = []
    for _ in range(ncols):
        kind = b[o]
        o += 1
        if kind in (0x6E, 0x75):  # 'n' null / 'u' unchanged toast
            vals.append(None)
        elif kind == 0x74:  # 't' text
            ln = _i(b, o, 4)
            o += 4
            vals.append(b[o : o + ln].decode("utf-8"))
            o += ln
        elif kind == 0x62:  # 'b' binary-mode value -> hex string
            ln = _i(b, o, 4)
            o += 4
            vals.append(b[o : o + ln].hex())
            o += ln
        else:
            raise ValueError(f"pgoutput: unknown TupleData kind {kind:#x}")
    return vals, o


def _parse_relation(b: bytes) -> tuple[int, str, str, list[str], list[str]]:
    relid = _i(b, 1, 4)
    ns, o = _cstr(b, 5)
    name, o = _cstr(b, o)
    o += 1  # replica identity byte
    ncols = _i(b, o, 2)
    o += 2
    names, types = [], []
    for _ in range(ncols):
        o += 1  # per-column flags (bit 1 = key part)
        cname, o = _cstr(b, o)
        typoid = _i(b, o, 4)
        typmod = _i(b, o + 4, 4)
        if typmod >= 0x8000_0000:  # Int32 is signed; -1 = no modifier
            typmod -= 0x1_0000_0000
        o += 8
        names.append(cname)
        types.append(_oid_to_type(typoid, typmod))
    return relid, ns, name, names, types


# ---------------------------------------------------------------------------
# encoders (test/bench harness + golden vectors; pure functions of inputs)
# ---------------------------------------------------------------------------


def enc_begin(final_lsn: int = 0, ts_us: int = 0, xid: int = 0) -> bytes:
    return (
        b"B"
        + final_lsn.to_bytes(8, "big")
        + ts_us.to_bytes(8, "big")
        + xid.to_bytes(4, "big")
    )


def enc_commit(commit_lsn: int = 0, end_lsn: int = 0, ts_us: int = 0) -> bytes:
    return (
        b"C\x00"
        + commit_lsn.to_bytes(8, "big")
        + end_lsn.to_bytes(8, "big")
        + ts_us.to_bytes(8, "big")
    )


def enc_relation(
    relid: int,
    relname: str,
    cols: list[tuple[str, str]],
    namespace: str = "public",
    key_cols: frozenset[str] = frozenset(("repo", "path")),
) -> bytes:
    out = [
        b"R",
        relid.to_bytes(4, "big"),
        namespace.encode() + b"\x00",
        relname.encode() + b"\x00",
        b"d",  # replica identity: default
        len(cols).to_bytes(2, "big"),
    ]
    for cname, ctype in cols:
        oid, typmod = _type_to_oid(ctype)
        out.append(b"\x01" if cname in key_cols else b"\x00")
        out.append(cname.encode() + b"\x00")
        out.append(oid.to_bytes(4, "big"))
        out.append((typmod & 0xFFFF_FFFF).to_bytes(4, "big"))
    return b"".join(out)


def _enc_tuple(values: list[str | None]) -> bytes:
    out = [len(values).to_bytes(2, "big")]
    for v in values:
        if v is None:
            out.append(b"n")
        else:
            enc = v.encode("utf-8")
            out.append(b"t" + len(enc).to_bytes(4, "big") + enc)
    return b"".join(out)


def enc_insert(relid: int, values: list[str | None]) -> bytes:
    return b"I" + relid.to_bytes(4, "big") + b"N" + _enc_tuple(values)


def enc_update(
    relid: int,
    values: list[str | None],
    old_key: list[str | None] | None = None,
) -> bytes:
    old = b"K" + _enc_tuple(old_key) if old_key is not None else b""
    return b"U" + relid.to_bytes(4, "big") + old + b"N" + _enc_tuple(values)


def enc_delete(
    relid: int, key_values: list[str | None], part: bytes = b"K"
) -> bytes:
    """``part=b"K"`` = replica-identity key tuple (non-key columns null),
    ``part=b"O"`` = full old row (REPLICA IDENTITY FULL)."""
    return b"D" + relid.to_bytes(4, "big") + part + _enc_tuple(key_values)


def enc_truncate(relids: list[int], options: int = 0) -> bytes:
    return (
        b"T"
        + len(relids).to_bytes(4, "big")
        + bytes([options])
        + b"".join(r.to_bytes(4, "big") for r in relids)
    )


# ---------------------------------------------------------------------------
# relation timeline (control plane)
# ---------------------------------------------------------------------------


def parse_relations(df: DataFrame, value: str = "value") -> DataFrame:
    """All ``R`` messages -> (lsn, relid, namespace, relname, colnames,
    coltypes). Message-type routing is a JVM predicate; only Relation
    bytes reach Python."""
    rels = df.filter(
        F.expr(f"decode(substring({value}, 1, 1), 'UTF-8')") == "R"
    ).select("lsn", value)

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for lsn, raw in zip(pdf["lsn"], pdf[value]):
                relid, ns, name, names, types = _parse_relation(bytes(raw))
                rows.append((int(lsn), relid, ns, name, names, types))
            yield pd.DataFrame(
                rows,
                columns=[
                    "lsn", "relid", "namespace", "relname",
                    "colnames", "coltypes",
                ],
            )

    return rels.mapInPandas(walk, REL_DDL)


def relation_timeline(
    rel_df: DataFrame,
) -> dict[int, list[tuple[int, str, list[str], list[str]]]]:
    """Collect the Relation control plane into an as-of lookup:
    relid -> [(lsn, relname, colnames, coltypes)] sorted by lsn."""
    rows = rel_df.limit(MAX_RELATIONS + 1).collect()
    if len(rows) > MAX_RELATIONS:
        raise ValueError(
            f"pgoutput: >{MAX_RELATIONS} Relation messages — stream is "
            "misrouted (Relation cardinality is #tables x #schema-changes)"
        )
    tl: dict[int, list[tuple[int, str, list[str], list[str]]]] = {}
    for r in rows:
        tl.setdefault(int(r["relid"]), []).append(
            (int(r["lsn"]), r["relname"], list(r["colnames"]), list(r["coltypes"]))
        )
    for relid, v in tl.items():
        v.sort(key=lambda t: t[0])
        # duplicate-delivery of the SAME message dedupes; two DIFFERENT
        # Relation versions at one LSN would make as-of resolution
        # collect-order-dependent — fail loudly instead
        dedup: list[tuple[int, str, list[str], list[str]]] = []
        for t in v:
            if dedup and dedup[-1][0] == t[0]:
                if dedup[-1] != t:
                    raise ValueError(
                        f"pgoutput: two conflicting Relation versions for "
                        f"relid {relid} at lsn {t[0]} — protocol violation"
                    )
                continue
            dedup.append(t)
        tl[relid] = dedup
    return tl


def schema_change_events(
    timeline: dict[int, list[tuple[int, str, list[str], list[str]]]],
) -> list[tuple[int, str, str]]:
    """Diff consecutive Relation versions into the engine's control events:
    (lsn, table, schema_change_json) with the same ``{"action", "column",
    "type"}`` JSON the text-frame protocol carries (loggen.py contract).
    Multiple changes in one Relation message emit one event per column, at
    the same LSN — apply's stepwise retype folding handles the group."""
    out: list[tuple[int, str, str]] = []
    for versions in timeline.values():
        for (_, _, p_names, p_types), (lsn, name, n_names, n_types) in zip(
            versions, versions[1:]
        ):
            prev = dict(zip(p_names, p_types))
            n_set = set(n_names)
            for c, t in zip(n_names, n_types):
                if c not in prev:
                    out.append(
                        (lsn, name, json.dumps(
                            {"action": "add", "column": c, "type": t}))
                    )
                elif prev[c] != t:
                    out.append(
                        (lsn, name, json.dumps(
                            {"action": "retype", "column": c, "type": t}))
                    )
            for c in p_names:
                if c not in n_set:
                    out.append(
                        (lsn, name, json.dumps({"action": "drop", "column": c}))
                    )
    out.sort()
    return out


def _versions(
    tl: dict[int, list[tuple[int, str, list[str], list[str]]]], relid: int,
    lsn: int,
) -> list[tuple[int, str, list[str], list[str]]]:
    """Timeline lookup with a protocol-violation error (not a bare
    KeyError) when no Relation message has ever been seen for the id."""
    versions = tl.get(relid)
    if not versions:
        raise ValueError(
            f"pgoutput: DML at lsn {lsn} references relation id {relid} "
            f"with no Relation message seen — the wire requires "
            f"Relation-before-DML delivery (across microbatches too)"
        )
    return versions


def _as_of(
    versions: list[tuple[int, str, list[str], list[str]]], lsn: int
) -> tuple[str, list[str]]:
    """Latest Relation at-or-before ``lsn`` (a Relation message precedes
    first use, so a miss means a protocol violation)."""
    i = bisect_right(versions, lsn, key=lambda t: t[0])
    if i == 0:
        raise ValueError(
            f"pgoutput: DML at lsn {lsn} precedes any Relation message "
            f"for its relation id"
        )
    _, name, cols, _ = versions[i - 1]
    return name, cols


# ---------------------------------------------------------------------------
# data-message decode
# ---------------------------------------------------------------------------

_OPS = {0x49: "insert", 0x55: "update", 0x44: "delete"}


def _decode_data(
    df: DataFrame,
    timeline: dict[int, list[tuple[int, str, list[str], list[str]]]],
    changes: list[tuple[int, str, str]],
    value: str = "value",
) -> DataFrame:
    """Arrow-batched walk of the non-Relation messages against a broadcast
    as-of timeline, plus the schema_change control rows. Shared by the
    batch decode (timeline from the same frame) and the streaming decoder
    (timeline from the persistent registry)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(timeline)

    data = df.filter(
        ~F.expr(f"decode(substring({value}, 1, 1), 'UTF-8')").isin("R", "Y", "O")
    ).select("lsn", value)

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tl = bc.value
        cols = [
            "lsn", "op", "table", "columnnames", "columnvalues",
            "schema_change",
        ]
        for pdf in batches:
            rows = []
            for lsn, raw in zip(pdf["lsn"], pdf[value]):
                b = bytes(raw)
                lsn = int(lsn)
                t = b[0]
                if t == 0x42:  # Begin
                    rows.append((lsn, "begin", None, None, None, None))
                elif t == 0x43:  # Commit
                    rows.append((lsn, "commit", None, None, None, None))
                elif t in _OPS:
                    relid = _i(b, 1, 4)
                    o = 5
                    tup = None
                    while o < len(b):
                        part = b[o]
                        o += 1
                        vals, o = _tuple_data(b, o)
                        # U: K/O old tuple then N new; D: K/O only.
                        # the LAST tuple wins (N for I/U, the key for D)
                        tup = vals if part in (0x4E, 0x4B, 0x4F) else tup
                    name, cnames = _as_of(_versions(tl, relid, lsn), lsn)
                    if tup is None:
                        raise ValueError("pgoutput: DML without TupleData")
                    if len(tup) != len(cnames):
                        # zip would silently pair values against the wrong
                        # column prefix (or emit unequal parallel arrays)
                        raise ValueError(
                            f"pgoutput: tuple width {len(tup)} != relation "
                            f"width {len(cnames)} for table {name!r} at lsn "
                            f"{lsn} — stale or missing Relation version "
                            f"(delivery-order protocol violation)"
                        )
                    names = [c for c, v in zip(cnames, tup) if v is not None]
                    vals = [v for v in tup if v is not None]
                    rows.append((lsn, _OPS[t], name, names, vals, None))
                elif t == 0x54:  # Truncate
                    nrels = _i(b, 1, 4)
                    for k in range(nrels):
                        relid = _i(b, 6 + 4 * k, 4)
                        name, _ = _as_of(_versions(tl, relid, lsn), lsn)
                        rows.append((lsn, "truncate", name, None, None, None))
                else:  # Message / unknown -> generic (reference fallback)
                    rows.append((lsn, "generic", None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    out = data.mapInPandas(walk, PGOUT_FRAME_DDL)
    if changes:
        ctrl = spark.createDataFrame(
            [(l, "schema_change", tbl, None, None, ch) for l, tbl, ch in changes],
            PGOUT_FRAME_DDL,
        )
        out = out.unionByName(ctrl)
    return out


def decode_pgoutput(df: DataFrame, value: str = "value") -> DataFrame:
    """(lsn, value BINARY) pgoutput stream -> PGOUT_FRAME_DDL frames
    (batch form — the whole stream is visible, so the Relation timeline
    comes from the frame itself).

    Two passes: (1) Relation messages -> collected timeline (+ diffed
    schema_change events), (2) Arrow-batched walk of the data messages
    against the broadcast timeline. Null/unchanged-toast columns are
    omitted from the emitted parallel arrays (element_at on the lifted map
    then yields NULL — same contract as the wal2json path)."""
    timeline = relation_timeline(parse_relations(df, value))
    changes = schema_change_events(timeline)
    return _decode_data(df, timeline, changes, value)


def _lift_envelope(frames: DataFrame) -> DataFrame:
    """PGOUT_FRAME_DDL -> ENVELOPE_DDL via the shared
    ``parse.envelope_base_extra`` lift (one implementation for every wire
    front end), pure JVM column expressions."""
    cols = F.map_from_arrays("columnnames", "columnvalues")
    is_dml = F.col("op").isin("insert", "update", "delete")
    base, extra = envelope_base_extra(cols, is_dml)
    return lock_envelope(
        frames.select(
            "lsn",
            "op",
            "table",
            *base,
            extra.alias("extra"),
            F.col("schema_change"),
        )
    )


def parse_pgoutput(df: DataFrame, value: str = "value") -> DataFrame:
    """Full pgoutput wire -> ``ENVELOPE_DDL`` (drop-in for
    ``parse.parse_frames``), batch form."""
    return _lift_envelope(decode_pgoutput(df, value))


# ---------------------------------------------------------------------------
# streaming decoder: per-microbatch decode with a persistent relation
# registry (a streaming frame cannot collect its own Relation timeline)
# ---------------------------------------------------------------------------


class PgOutputDecoder:
    """Per-microbatch pgoutput decode for the foreachBatch path.

    A Relation message governs every later DML on its relation id —
    including DML in LATER microbatches — so the timeline must outlive the
    batch. The registry is a tiny JSON file (O(#tables x #schema-changes)
    rows, control-plane cardinality) persisted atomically (tmp + rename)
    BEFORE the batch's envelope is handed to the idempotent apply:

    - crash after registry write, before lake commit -> replay re-merges
      the same versions (keyed (relid, lsn) — no-op) and re-derives the
      SAME schema_change rows (they diff the batch's Relation messages
      against their registry predecessors, deterministically), so the
      replayed batch is byte-identical;
    - a connector re-sending an unchanged Relation after reconnect (the
      pgoutput per-connection contract) produces no diff -> no spurious
      schema_change.

    Requires in-order delivery ACROSS batches per relation (a Relation
    arrives no later than the first data message it governs — the WAL
    stream's own guarantee); within a batch, resolution is as-of by LSN.
    """

    def __init__(self, registry_path: str):
        self.registry_path = registry_path
        self._timeline: dict[int, list[tuple[int, str, list[str], list[str]]]] = {}
        self._load()

    def _load(self) -> None:
        if not os.path.exists(self.registry_path):
            return
        with open(self.registry_path) as f:
            raw = json.load(f)
        self._timeline = {
            int(relid): [tuple(v) for v in versions]
            for relid, versions in raw.items()
        }

    def _persist(self) -> None:
        os.makedirs(os.path.dirname(self.registry_path) or ".", exist_ok=True)
        tmp = self.registry_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._timeline, f)
        os.replace(tmp, self.registry_path)

    def _merge(self, rel_df: DataFrame) -> list[tuple[int, str, str]]:
        """Merge the batch's Relation messages into the registry; return
        the schema_change events they imply (vs their predecessor version
        in the MERGED timeline — stable under replay)."""
        batch_tl = relation_timeline(rel_df)
        if not batch_tl:
            return []
        changes: list[tuple[int, str, str]] = []
        for relid, versions in batch_tl.items():
            have = self._timeline.setdefault(relid, [])
            known = {v[0] for v in have}
            merged: list = []
            by_lsn = {h[0]: h for h in have}
            for v in versions:
                if v[0] in known:
                    # replay of an already-merged version: re-derive its
                    # diff below — but a CONFLICTING version at a stored
                    # LSN is the cross-batch twin of relation_timeline's
                    # same-LSN guard and must fail just as loudly (the
                    # width check cannot catch same-width renames/retypes)
                    if tuple(by_lsn[v[0]][1:]) != tuple(v[1:]):
                        raise ValueError(
                            f"pgoutput: Relation for relid {relid} at lsn "
                            f"{v[0]} conflicts with the registry's stored "
                            f"version — protocol violation"
                        )
                    merged.append(v)
                    continue
                # a reconnecting connector re-sends an unchanged Relation
                # at a fresh LSN (the pgoutput per-connection contract);
                # appending it would grow the registry/broadcast/bisect
                # linearly with reconnect count — skip content-identical
                # versions instead (deterministic on replay: same skip)
                pred = max(
                    (h for h in have if h[0] <= v[0]),
                    key=lambda h: h[0],
                    default=None,
                )
                if pred is not None and tuple(pred[1:]) == tuple(v[1:]):
                    continue
                have.append(v)
                known.add(v[0])
                merged.append(v)
            have.sort(key=lambda t: t[0])
            # diff each merged batch version against its predecessor in
            # the merged timeline (replay-deterministic: merge idempotent)
            for v in merged:
                i = next(k for k, h in enumerate(have) if h[0] == v[0])
                if i > 0:
                    changes.extend(
                        schema_change_events({relid: [have[i - 1], have[i]]})
                    )
        self._persist()
        changes.sort()
        return changes

    def __call__(self, df: DataFrame, value: str = "value") -> DataFrame:
        changes = self._merge(parse_relations(df, value))
        return _lift_envelope(
            _decode_data(df, self._timeline, changes, value)
        )


# ---------------------------------------------------------------------------
# envelope -> pgoutput encoder (test / bench harness)
# ---------------------------------------------------------------------------


def column_versions(
    schema_changes: dict[int, dict] | None = None,
) -> list[tuple[int, list[tuple[str, str]]]]:
    """The (lsn, [(col, type)]) as-of timeline a loggen ``schema_changes``
    spec implies — one Relation message per version."""
    cols: list[tuple[str, str]] = [(c, "string") for c in BASE_COLUMNS]
    versions = [(0, list(cols))]
    for l, ch in sorted((schema_changes or {}).items()):
        act, cname = ch["action"], ch["column"]
        if act == "add":
            cols = [c for c in cols if c[0] != cname] + [
                (cname, ch.get("type", "string"))
            ]
        elif act == "drop":
            cols = [c for c in cols if c[0] != cname]
        elif act == "retype":
            cols = [
                (n, ch.get("type", "string") if n == cname else t)
                for n, t in cols
            ]
        if l <= versions[-1][0]:
            # a change at (or before) the current version's LSN folds INTO
            # that version — a real stream never carries two Relation
            # messages at one LSN, and emitting both would make as-of
            # resolution order-dependent (relation_timeline raises on it)
            versions[-1] = (versions[-1][0], list(cols))
        else:
            versions.append((l, list(cols)))
    return versions


def encode_envelope(
    env: DataFrame,
    schema_changes: dict[int, dict] | None = None,
    *,
    relid: int = 1,
    table: str = "repos",
) -> DataFrame:
    """``ENVELOPE_DDL`` rows -> an ``(lsn, value BINARY)`` pgoutput stream:
    one Relation message per schema version (at the control LSN — this IS
    the wire's schema_change signal; explicit schema_change rows are
    dropped), DML as Insert/Update/Delete (deletes as REPLICA IDENTITY
    FULL old rows so the round trip is exact), truncates as Truncate.
    Deterministic; inverse of ``parse_pgoutput`` up to map ordering."""
    spark = env.sparkSession
    versions = column_versions(schema_changes)
    rel_rows = [
        (l, bytearray(enc_relation(relid, table, cols)))
        for l, cols in versions
    ]
    bc = spark.sparkContext.broadcast(versions)
    dml = env.filter(F.col("op").isin("insert", "update", "delete", "truncate"))

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vs = bc.value
        base = list(BASE_COLUMNS)
        for pdf in batches:
            out = []
            it = zip(
                pdf["lsn"], pdf["op"], pdf["extra"],
                *[pdf[c] for c in base],
            )
            for lsn, op, extra, *bvals in it:
                lsn = int(lsn)
                if op == "truncate":
                    out.append((lsn, enc_truncate([relid])))
                    continue
                i = bisect_right(vs, lsn, key=lambda t: t[0])
                cols = vs[i - 1][1]
                row = dict(zip(base, bvals))
                if isinstance(extra, dict):
                    row.update(extra)
                vals = [
                    None if (v := row.get(n)) is None or v != v else str(v)
                    for n, _ in cols
                ]
                if op == "insert":
                    out.append((lsn, enc_insert(relid, vals)))
                elif op == "update":
                    out.append((lsn, enc_update(relid, vals)))
                else:
                    out.append((lsn, enc_delete(relid, vals, part=b"O")))
            yield pd.DataFrame(out, columns=["lsn", "value"])

    enc = dml.mapInPandas(walk, "lsn BIGINT, value BINARY")
    rels = spark.createDataFrame(rel_rows, "lsn BIGINT, value BINARY")
    return enc.unionByName(rels)
