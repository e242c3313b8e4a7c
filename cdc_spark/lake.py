"""Iceberg-semantics lake table in pure PySpark (no Iceberg jar available).

The apply side the reference deliberately leaves unimplemented
(``/root/reference/cdc/__main__.py:87-92``), built per the north rule with
the commit discipline of the reference's snapshot destination state machine
(``cdc/snapshots/destinations/__init__.py:56-126``): data files are staged
first, the manifest is published last by an atomic rename, and a failure at
any point leaves no visible snapshot (the reference's ``complete.json``
success marker, ``file_snapshot.py:113-119``).

Layout (one table per directory):

    <root>/metadata/v<N>.json               -- manifests, atomic link publish
    <root>/data/v<N>-<attempt>/_bucket=K/*.parquet
                                            -- per-ATTEMPT staging dirs: a
                                               writer losing the manifest
                                               race leaves orphans (GC'd by
                                               expire_snapshots), never
                                               clobbers the winner

Manifest fields:
    version, table, key, n_buckets,
    schema_id, schemas        -- full schema-version history (E3)
    schema_changes            -- RAW (lsn, change_json) history; validity is
                                 re-derived on every read via replay_changes
    files                     -- [{path, bucket, schema_id, change_lsn,
                                 min_key, max_key, key_ranges, rows}]
                                 (paths rel. root; change_lsn = the highest
                                 schema-change LSN applied at write time —
                                 an LSN stamp, NOT a list position, because
                                 out-of-order control events insert into the
                                 MIDDLE of the LSN-sorted history and would
                                 shift positional indexes under existing
                                 files; min/max_key = folded first-key-column
                                 range, key_ranges = per-row-group interval
                                 list (<= MAX_KEY_RANGES, round 4+ — keeps a
                                 mixed hot+cold file's gap visible to the
                                 skip test; absent in legacy manifests, where
                                 pruning falls back to min/max),
                                 rows = row count)
    truncate_lsn              -- table-truncate watermark (O(1) truncate)
    last_batch                -- {id, lsn_hwm}: idempotent-commit key (E2);
                                 commits are keyed by (checkpoint epoch,
                                 LSN high-watermark) per the north rule

Scale design:
- Data files are hash-bucketed on the merge key: a copy-on-write merge
  rewrites ONLY buckets containing batch keys (file pruning via the
  manifest), so write amplification is bounded by batch key spread, not
  table size. At 100 TB use thousands of buckets so one bucket ~= one
  executor's working set.
- Old-schema files are never rewritten on schema evolution; reads project
  them into the current schema lazily (add -> null, drop -> pruned at the
  parquet scan, retype -> try_cast), exactly Iceberg's lazy evolution.
- Rows are sorted within files by key (``sortWithinPartitions``) so bucket
  merges are sorted-merge friendly and key ranges cluster for min/max skip.
- Tombstones: deletes keep a ``_deleted`` row carrying its LSN so later
  out-of-order (stale) updates for the key still lose the LWW race;
  ``compact()`` drops tombstones older than a caller-supplied watermark.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SQL_TYPES = {"string": "STRING", "long": "BIGINT", "double": "DOUBLE",
              "boolean": "BOOLEAN", "int": "INT", "timestamp": "TIMESTAMP",
              "date": "DATE", "map<string,string>": "MAP<STRING,STRING>",
              "array<float>": "ARRAY<FLOAT>",
              "array<double>": "ARRAY<DOUBLE>"}

_DECIMAL_RE = None  # compiled lazily (module import stays light)

#: engine bookkeeping columns stored in every data file. ``_extra`` keeps the
#: wal2json payload entries not consumed by the schema in force when the row
#: was applied, so a late-delivered add-column (control event arriving in a
#: later batch than data that post-dates it) can still resurrect the values —
#: without it the engine would silently drop them where the LSN-ordered
#: oracle keeps them.
META_FIELDS = [("_lsn", "long"), ("_deleted", "boolean"),
               ("_extra", "map<string,string>")]
_META_NAMES = {n for n, _ in META_FIELDS}


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first; refresh and retry."""


def evolve_fields(
    fields: list[tuple[str, str]], change: dict, key: tuple[str, ...]
) -> list[tuple[str, str]]:
    """Apply one schema-change event to a field list.

    The reference handles DDL operationally — a fresh snapshot signalled over
    the control topic (``cdc/snapshots/control_protocol.py:21-54``); the
    engine upgrades this to in-stream, LSN-ordered evolution. Key columns are
    immutable (they define row identity)."""
    action, column = change["action"], change["column"]
    if column in key:
        raise ValueError(f"cannot {action} key column {column}")
    names = [n for n, _ in fields]
    if action == "add":
        if column in names:
            raise ValueError(f"add: column {column} already exists")
        typ = change.get("type", "string")
        sql_type(typ)  # unknown type -> KeyError -> replay skips the event
        return fields + [(column, typ)]
    if action == "drop":
        return [f for f in fields if f[0] != column]
    if action == "retype":
        # validate the target type HERE, not lazily at epoch projection:
        # an invalid type marked valid would later raise an uncatchable
        # KeyError in sql_type inside foreachBatch and crash-loop the
        # stream on replay — the exact failure poison tolerance exists
        # to prevent. replay_changes deterministically skips it instead.
        sql_type(change["type"])
        return [(n, change["type"] if n == column else t) for n, t in fields]
    raise ValueError(f"unknown schema change action {action!r}")


def replay_changes(
    base_fields: list[tuple[str, str]],
    raw_pairs: list,
    key: tuple[str, ...],
) -> tuple[list[tuple[str, str]], list, list]:
    """Replay the raw ``(lsn, change_json)`` history from the base schema.

    Invalid payloads (unparseable JSON, add of an existing column, any
    action on a key column, unknown action) are SKIPPED deterministically —
    a poison control frame must never crash-loop the stream, and because
    validity depends on the state at the replay point (a late-arriving
    earlier change can flip it), the RAW history is what the manifest
    stores and every reader re-derives validity with this one function.

    Returns ``(final_fields, aligned, epochs)`` where ``aligned[i]`` is the
    parsed dict for ``raw_pairs[i]`` or None if skipped (aligned with the
    raw history, whose entries carry the LSNs per-file ``change_lsn``
    stamps compare against), and ``epochs`` is
    ``[(lower_lsn, fields, aligned_upper_idx)]`` — rows with
    ``lsn > lower_lsn`` (and below the next epoch's) were written under
    ``fields``, with ``aligned[aligned_upper_idx:]`` still ahead of them."""
    aligned: list = []
    epochs = [(-1, list(base_fields), 0)]
    for i, (c_lsn, c_json) in enumerate(raw_pairs):
        try:
            ch = json.loads(c_json)
            nxt = evolve_fields(epochs[-1][1], ch, key)
        except (ValueError, TypeError, KeyError):
            aligned.append(None)
            continue
        aligned.append(ch)
        epochs.append((int(c_lsn), nxt, i + 1))
    return epochs[-1][1], aligned, epochs


def sql_type(t: str) -> str:
    if t in _SQL_TYPES:
        return _SQL_TYPES[t]
    global _DECIMAL_RE
    if _DECIMAL_RE is None:
        import re

        _DECIMAL_RE = re.compile(r"decimal\((\d+),\s*(\d+)\)")
    m = _DECIMAL_RE.fullmatch(t)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    raise KeyError(f"unsupported column type {t!r}")


def bucket_expr(key: tuple[str, ...], n_buckets: int):
    cols = [F.coalesce(F.col(k).cast("string"), F.lit("")) for k in key]
    return F.pmod(F.xxhash64(*cols), F.lit(n_buckets)).cast("int")


def _pack_buckets(
    bucket_rows: dict, budget: int, max_groups: int
) -> list[list[int]] | None:
    """First-fit-decreasing bin pack of the batch's buckets into chunks of
    at most ``budget`` batch rows each — the plan for the 'chunked' merge
    strategy (each chunk's key set broadcasts on its own). Returns None
    when infeasible: a single bucket alone exceeds the budget (its join
    side would not be safely broadcastable) or the batch needs more than
    ``max_groups`` chunks (plan-size guard) — the caller then falls back
    to the shuffle 'agg' strategy."""
    bins: list[list] = []  # [rows, [buckets]]
    for bkt, rows in sorted(
        bucket_rows.items(), key=lambda kv: (-kv[1], kv[0])
    ):
        if rows > budget:
            return None
        for bin_ in bins:
            if bin_[0] + rows <= budget:
                bin_[0] += rows
                bin_[1].append(bkt)
                break
        else:
            bins.append([rows, [bkt]])
            if len(bins) > max_groups:
                return None
    return [sorted(b[1]) for b in bins]


#: per-file interval cap: row-group intervals beyond this are coalesced by
#: merging the SMALLEST gaps first, so the kept intervals preserve the
#: largest holes — the ones that actually let a merge skip the file
MAX_KEY_RANGES = 8


def _coalesce_ranges(ranges: list, cap: int = MAX_KEY_RANGES) -> list:
    """Merge overlapping/adjacent [lo, hi] intervals (inputs sorted by lo),
    then reduce to <= cap by closing the narrowest gaps."""
    out: list = []
    for lo, hi in ranges:
        if out and lo <= out[-1][1]:
            if hi > out[-1][1]:
                out[-1][1] = hi
        else:
            out.append([lo, hi])
    while len(out) > cap:
        # find the narrowest inter-interval gap and merge across it.
        # "narrowest" needs a numeric width; for string keys fall back to
        # merging the first pair (still correct, just less selective)
        best, best_w = 0, None
        for i in range(len(out) - 1):
            a, b = out[i][1], out[i + 1][0]
            w = (b - a) if isinstance(a, int) and isinstance(b, int) else None
            if best_w is None or (w is not None and (best_w is False or w < best_w)):
                best, best_w = i, (w if w is not None else False)
        out[best][1] = out[best + 1][1]
        del out[best + 1]
    return out


def _file_key_stats(path: str, key_col: str) -> tuple:
    """(min, max, rows, key_ranges) of ``key_col`` from the parquet FOOTER
    — a driver-side metadata read (no data scan, no job). Rows are
    key-sorted within files, so footer min/max are exact cluster bounds;
    ``merge`` uses them to skip files whose key range cannot intersect a
    batch (Iceberg's lower/upper_bounds file skipping). ``key_ranges`` is
    the PER-ROW-GROUP interval list (coalesced to <= MAX_KEY_RANGES):
    single-interval stats go blind the moment one file holds both a hot
    and a cold key cluster (its folded range spans everything), while the
    row-group intervals keep the gap visible, so the mixed file still
    skips batches that fall into the hole. Returns (None, None, rows,
    None) when the writer produced no stats (pruning then never skips)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = None
    for i in range(md.num_columns if md.num_row_groups else 0):
        if md.row_group(0).column(i).path_in_schema == key_col:
            idx = i
            break
    lo = hi = None
    ranges = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx).statistics if idx is not None else None
        if st is None or not st.has_min_max:
            return None, None, md.num_rows, None
        mn, mx = st.min, st.max
        if isinstance(mn, bytes):
            try:
                mn, mx = mn.decode(), mx.decode()
            except UnicodeDecodeError:
                return None, None, md.num_rows, None
        ranges.append([mn, mx])
        lo = mn if lo is None or mn < lo else lo
        hi = mx if hi is None or mx > hi else hi
    if not isinstance(lo, (str, int)) or type(lo) is not type(hi):
        return None, None, md.num_rows, None
    ranges.sort(key=lambda r: (r[0], r[1]))
    return lo, hi, md.num_rows, _coalesce_ranges(ranges)


def _file_ranges(f: dict) -> list | None:
    """A manifest file entry's pruning intervals: the row-group ranges when
    stamped (round 4+), else the folded [min, max] (legacy manifests), else
    None (no stats — never skip)."""
    if f.get("key_ranges"):
        return f["key_ranges"]
    mn, mx = f.get("min_key"), f.get("max_key")
    if mn is None or mx is None:
        return None
    return [[mn, mx]]


def chain_for_column(
    name: str, tail: list[dict], present: bool, start_casts: list[str]
) -> tuple[str, list[str]]:
    """Walk the schema-change tail (changes applied AFTER a value was stored)
    for one column and return how to materialize it under the head schema:

    - ``("value", casts)``  -- fold ``casts`` onto the stored column value
    - ``("extra", casts)``  -- column added later; resurrect the raw string
      from ``_extra`` and fold ``casts`` (first cast = the add type)
    - ``("null", [])``      -- column was dropped after storage (a re-add
      gives pre-existing rows NULL, matching the LSN-ordered oracle)
    - ``("absent", [])``    -- no lineage found (caller falls back)

    Retype chains fold STEPWISE (string->long->string turns '007' into '7',
    never '007') so lazy projection byte-matches the oracle's per-event
    ``convert`` replay even through lossy intermediate types."""
    mode = "value" if present else "absent"
    casts = list(start_casts)
    for ch in tail:
        if ch is None or ch.get("column") != name:
            continue
        action = ch["action"]
        if action == "retype":
            if mode in ("value", "extra"):
                casts.append(ch["type"])
        elif action == "drop":
            mode, casts = "gone", []
        elif action == "add":
            if mode == "gone":
                mode = "null"
            elif mode == "absent":
                mode, casts = "extra", [ch.get("type", "string")]
    if mode == "gone":
        mode = "null"
    return mode, casts


def fold_cast_expr(raw_sql: str, casts: list[str], final_type: str) -> str:
    """Nest try_casts for each chain step; guarantee the final type."""
    expr = raw_sql
    for t in casts:
        expr = f"try_cast({expr} AS {sql_type(t)})"
    if not casts or casts[-1] != final_type:
        expr = f"try_cast({expr} AS {sql_type(final_type)})"
    return expr


def project_to(
    df: DataFrame,
    src_fields: list,
    dst_fields: list,
    changes_tail: list[dict] | None = None,
) -> DataFrame:
    """Project a frame carrying ``src_fields`` (+META) into ``dst_fields``:
    missing columns -> NULL, retypes -> try_cast, drops -> pruned. Column
    pruning + casts stay in the parquet scan / codegen (no shuffle).

    ``changes_tail`` is the ordered list of schema-change dicts applied
    between when these rows were written and the target schema; with it the
    projection folds the full per-column cast chain stepwise (see
    ``chain_for_column``). Without it (legacy files carrying no change
    index) the projection is a direct stored-type -> target-type cast."""
    src = dict(src_fields)
    exprs = []
    for name, typ in dst_fields + META_FIELDS:
        if name in _META_NAMES:
            exprs.append(f"try_cast(`{name}` AS {sql_type(typ)}) AS `{name}`")
            continue
        if changes_tail is None:
            if name in src:
                exprs.append(f"try_cast(`{name}` AS {sql_type(typ)}) AS `{name}`")
            else:
                # column added after this file was written: resurrect the
                # value from the row's unconsumed payload residue
                exprs.append(
                    f"try_cast(element_at(`_extra`, '{name}') AS {sql_type(typ)}) "
                    f"AS `{name}`"
                )
            continue
        mode, casts = chain_for_column(name, changes_tail, name in src, [])
        if mode == "value":
            e = fold_cast_expr(f"`{name}`", casts, typ)
        elif mode == "extra":
            e = fold_cast_expr(f"element_at(`_extra`, '{name}')", casts, typ)
        elif mode == "null":
            e = f"CAST(NULL AS {sql_type(typ)})"
        else:  # no lineage in the tail: legacy resurrect
            e = f"try_cast(element_at(`_extra`, '{name}') AS {sql_type(typ)})"
        exprs.append(f"{e} AS `{name}`")
    return df.selectExpr(*exprs)


class LakeTable:
    #: above this many batch rows the broadcast 'join' merge strategy falls
    #: back to bucket-chunked joins and, past the chunk budget, to the
    #: shuffle 'agg' strategy (a broadcast must fit executor mem)
    broadcast_max_rows = 5_000_000
    #: range shards per 'append' (merge-on-read) delta commit: each shard is
    #: one key-sorted file with tight footer ranges, so later point-set
    #: reads (``files_for_key_values``) skip deltas that cannot contain the
    #: probed keys. Size to ~cluster write parallelism in production; small
    #: here so per-batch file count stays bounded between compactions.
    append_shards = 4
    #: chunked-join budget: the batch may exceed broadcast_max_rows by up
    #: to this factor if its buckets bin-pack into at most this many
    #: broadcastable chunks (each chunk = its own broadcast join; the plan
    #: unions the chunks, so the count is bounded to keep plan size sane)
    chunk_max_groups = 32
    #: the 'join' strategy's costs scale with |batch keys| (two key-set
    #: broadcasts: the batch's (key, lsn) set and the stale set) while its
    #: benefit — touched lake rows crossing NO exchange — scales with the
    #: touched lake size. When the batch is comparable to the touched lake
    #: (bulk loads, full-churn replays) the single-shuffle 'agg' reduce is
    #: faster (measured ~1.5 s/20M-event batch at batch == lake == 2.7M
    #: keys); 'join' stays the pick whenever touched lake rows exceed
    #: batch rows by this factor — the trickle-CDC regime the strategy
    #: exists for, and the only regime that matters at 100 TB.
    join_min_lake_ratio = 4
    #: parquet row-group size (bytes) for lake data files; None = Spark's
    #: default (128 MB). Smaller groups give the per-row-group key_ranges
    #: stats finer pruning granularity — tests set a tiny value so multi-
    #: interval pruning is exercised on small fixtures
    parquet_block_size: int | None = None
    #: truncate-transform file partitioning width (EngineConfig.
    #: file_block_prefix): > 0 adds a key-prefix partition level to data
    #: file paths so key clusters become separately skippable files
    file_block_prefix: int = 0

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._meta = self._load_current()

    # ------------------------------------------------------------- metadata
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        fields: list[tuple[str, str]],
        key: tuple[str, ...] = ("repo", "path"),
        n_buckets: int = 16,
        table: str = "repos",
        merge_on_read: bool = False,
    ) -> "LakeTable":
        """``merge_on_read=True`` creates an MOR table: commits are O(batch)
        appends of key-range-sharded delta files (``strategy='append'``) and
        the LWW winner per key is resolved at READ time (``_lww_resolve``);
        ``compact()`` folds the deltas back to one row per key. This is the
        layout for uniformly-hashed keys (e.g. fingerprint indexes), where a
        copy-on-write merge can never skip files — every batch's key set
        intersects every file's range — so COW write amplification would be
        O(table) per batch. MOR files carry bucket = -1 (range-sharded, not
        hash-bucketed); point reads prune on footer key ranges alone."""
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
        meta = {
            "version": 0,
            "table": table,
            "key": list(key),
            "n_buckets": n_buckets,
            "merge_on_read": bool(merge_on_read),
            "schema_id": 0,
            "schemas": [{"schema_id": 0, "fields": [list(f) for f in fields]}],
            "schema_changes": [],
            "files": [],
            "truncate_lsn": -1,
            "last_batch": {"id": -1, "lsn_hwm": -1},
            "parent": None,
            "committed_at": time.time(),
        }
        cls._publish(root, meta)
        return cls(spark, root)

    @classmethod
    def exists(cls, root: str) -> bool:
        d = os.path.join(root, "metadata")
        return os.path.isdir(d) and any(
            f.startswith("v") and f.endswith(".json") for f in os.listdir(d)
        )

    @staticmethod
    def _publish(root: str, meta: dict, replace: bool = False) -> None:
        """Atomic manifest publish: stage then hard-link into place. The
        link(2) fails if the version already exists, so two writers racing
        to commit the same version cannot clobber each other — the loser
        gets ``FileExistsError`` and must refresh + retry (optimistic
        concurrency, like Iceberg's catalog swap). No publish -> the
        snapshot never existed (reference K4 semantics)."""
        mdir = os.path.join(root, "metadata")
        final = os.path.join(mdir, f"v{meta['version']}.json")
        tmp = os.path.join(mdir, f".tmp.v{meta['version']}.json")
        with open(tmp, "w") as fh:
            json.dump(meta, fh, indent=1)
        if replace:
            os.rename(tmp, final)
            return
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {meta['version']} already published at {root}"
            ) from None
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def _load_current(self) -> dict:
        mdir = os.path.join(self.root, "metadata")
        versions = [
            int(f[1:-5])
            for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        ]
        with open(os.path.join(mdir, f"v{max(versions)}.json")) as fh:
            return json.load(fh)

    def refresh(self) -> "LakeTable":
        self._meta = self._load_current()
        return self

    # ------------------------------------------------------------ accessors
    @property
    def meta(self) -> dict:
        return self._meta

    @property
    def version(self) -> int:
        return self._meta["version"]

    @property
    def key(self) -> tuple[str, ...]:
        return tuple(self._meta["key"])

    @property
    def n_buckets(self) -> int:
        return self._meta["n_buckets"]

    @property
    def truncate_lsn(self) -> int:
        return self._meta["truncate_lsn"]

    @property
    def last_batch(self) -> dict:
        return self._meta["last_batch"]

    def schema_fields(self, schema_id: int | None = None) -> list[tuple[str, str]]:
        sid = self._meta["schema_id"] if schema_id is None else schema_id
        for s in self._meta["schemas"]:
            if s["schema_id"] == sid:
                return [tuple(f) for f in s["fields"]]
        raise KeyError(f"unknown schema_id {sid}")

    # -------------------------------------------------------------- reading
    def _parsed_changes(self, meta: dict | None = None) -> list:
        """The manifest's raw change history replayed through the validity
        filter — a list of ``(lsn, parsed_dict_or_None)`` pairs in LSN order
        (None = skipped poison entry). Per-file ``change_lsn`` stamps select
        each file's unapplied tail as ``lsn > stamp``."""
        m = meta or self._meta
        base = next(
            [tuple(f) for f in s["fields"]]
            for s in m["schemas"]
            if s["schema_id"] == 0
        )
        raw = m.get("schema_changes", [])
        _, aligned, _ = replay_changes(base, raw, tuple(m["key"]))
        return [(int(l), c) for (l, _), c in zip(raw, aligned)]

    def _read_files(
        self,
        files: list[dict],
        target_fields: list[tuple[str, str]],
        changes: list[dict] | None = None,
    ) -> DataFrame | None:
        """Read manifest files projected to ``target_fields`` (+META).
        Files are grouped by (schema_id, change_lsn) so each group is one
        pruned, pushdown-friendly parquet scan whose per-column cast chain
        (the changes with ``lsn > change_lsn`` — an LSN comparison, robust
        to late-arriving control events inserting mid-history) is folded
        into the scan projection. ``changes`` is ``_parsed_changes()``
        output: LSN-ordered ``(lsn, parsed_or_None)`` pairs."""
        if not files:
            return None
        by_grp: dict[tuple, list[str]] = {}
        for f in files:
            grp = (f["schema_id"], f.get("change_lsn"), f.get("change_idx"))
            by_grp.setdefault(grp, []).append(os.path.join(self.root, f["path"]))
        parts = []
        for (sid, clsn, cidx), paths in by_grp.items():
            src_fields = self.schema_fields(sid)
            if changes is None:
                tail = None
            elif clsn is not None:
                tail = [c for l, c in changes if l > clsn]
            elif cidx is not None:
                # pre-round-3 manifest: the stamp is a POSITION into the
                # raw history; honor it so an upgraded lake keeps folding
                # its retype chains (new commits re-stamp with the LSN)
                tail = [c for _l, c in changes[cidx:]]
            else:
                tail = None
            df = self.spark.read.parquet(*paths)
            parts.append(project_to(df, src_fields, target_fields, tail))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _load_version(self, version: int) -> dict:
        with open(os.path.join(self.root, "metadata", f"v{version}.json")) as fh:
            return json.load(fh)

    def _lww_resolve(self, df: DataFrame) -> DataFrame:
        """Per-key LWW winner for merge-on-read tables: deltas appended by
        ``strategy='append'`` can carry several rows per key across files;
        the visible row is the max-LSN one (the same max_by reduce the COW
        'agg' merge strategy uses at write time). Partial-aggregated, so
        the shuffle carries one row per key per map partition."""
        payload = [c for c in df.columns if c not in self.key]
        return (
            df.groupBy(*[F.col(f"`{k}`") for k in self.key])
            .agg(
                F.max_by(
                    F.struct(*[F.col(f"`{c}`") for c in payload]),
                    F.col("_lsn"),
                ).alias("_s")
            )
            .select(*[f"`{k}`" for k in self.key], "_s.*")
        )

    def resolve_live(
        self, df: DataFrame, truncate_lsn: int | None = None
    ) -> DataFrame:
        """Apply the table's visibility rule to raw (+META) rows: truncate
        watermark, LWW resolve (merge-on-read tables only), tombstone drop.
        Callers that pre-filter a ``scan_for_keys`` frame MUST filter by
        whole keys or key PREFIXES only — a predicate that split a key's
        rows across the filter would corrupt the LWW resolve."""
        t = self.truncate_lsn if truncate_lsn is None else truncate_lsn
        df = df.filter(F.col("_lsn") > F.lit(t))
        if self._meta.get("merge_on_read"):
            df = self._lww_resolve(df)
        return df.filter(~F.col("_deleted"))

    def _live_view(self, files: list[dict]) -> DataFrame:
        """The table's ONE visibility rule — project ``files`` to the
        current schema, resolve LWW winners (merge-on-read tables), and
        drop tombstones + truncated rows. Shared by ``read`` and ``lookup``
        so the predicate can never drift."""
        fields = self.schema_fields()
        df = self._read_files(files, fields, changes=self._parsed_changes())
        if df is None:
            ddl = ", ".join(
                f"`{n}` {sql_type(t)}" for n, t in fields + META_FIELDS
            )
            df = self.spark.createDataFrame([], ddl)
        return self.resolve_live(df)

    def read(self, include_meta: bool = False, version: int | None = None) -> DataFrame:
        """Live view: tombstones and truncated rows filtered out. Pass
        ``version`` for time travel to any retained snapshot (each manifest
        is self-contained: file list + schema history + watermarks)."""
        meta = self._meta if version is None else self._load_version(version)
        if version is not None:
            # evaluate under that snapshot's schema + watermarks
            saved, self._meta = self._meta, meta
            try:
                return self.read(include_meta=include_meta)
            finally:
                self._meta = saved
        live = self._live_view(self._meta["files"])
        if include_meta:
            return live
        return live.select(*[f"`{n}`" for n, _ in self.schema_fields()])

    def diff(self, v_old: int, v_new: int | None = None) -> DataFrame:
        """Release notes between two retained snapshots: (key..., change_op)
        where change_op is ``added`` / ``removed`` / ``changed``, comparing
        the live views of version ``v_old`` and ``v_new`` (None = current).
        One full-outer equi-join on the table key with map-side payload
        fingerprints — see :func:`cdc_spark.functions.versioning.frame_diff`."""
        from .functions.versioning import frame_diff

        old = self.read(version=v_old)
        new = self.read(version=v_new)
        return frame_diff(old, new, list(self.key))

    # -------------------------------------------------------------- lookups
    def _files_for_key(self, key_value: tuple) -> list[dict]:
        """Manifest files that can contain ``key_value``: the key's hash
        bucket, then min/max first-key-column footer-stat pruning within
        it. Driver-side metadata math only — no scan."""
        kv = tuple(key_value)
        if len(kv) != len(self.key):
            raise ValueError(f"expected {len(self.key)} key values, got {len(kv)}")
        # one-row local job: the bucket hash is the JVM's xxhash64, so it
        # must be computed BY the JVM (no data read — a literal frame)
        types = dict(self.schema_fields())
        ddl = ", ".join(
            f"`{k}` {sql_type(types.get(k, 'string'))}" for k in self.key
        )
        bucket = (
            self.spark.createDataFrame([kv], ddl)
            .select(bucket_expr(self.key, self.n_buckets).alias("b"))
            .first()["b"]
        )
        k1 = kv[0]
        out = []
        for f in self._meta["files"]:
            # bucket -1 = a range-sharded merge-on-read file (append delta
            # or MOR compaction output): not hash-bucketed, can hold any
            # key — prune it by range only
            if f["bucket"] not in (bucket, -1):
                continue
            ranges = _file_ranges(f)
            try:
                if ranges is not None and all(
                    k1 < mn or k1 > mx for mn, mx in ranges
                ):
                    continue
            except TypeError:
                pass  # mixed-type stats: keep the file
            out.append(f)
        return out

    def files_for_key_values(self, values) -> list[dict]:
        """Manifest files whose first-key-column footer ranges can contain
        ANY of ``values`` — the point-SET analog of ``_files_for_key``:
        driver-side interval-vs-sorted-list intersection over file metadata,
        no scan, no job. Files without stats are always kept (pruning may
        only skip provably irrelevant files); ``values=None`` disables
        pruning (all files — the over-cap fallback)."""
        import bisect

        if values is None:
            return list(self._meta["files"])
        vals = sorted(v for v in set(values) if v is not None)
        out = []
        for f in self._meta["files"]:
            ranges = _file_ranges(f)
            if ranges is None or not vals:
                if ranges is None:
                    out.append(f)
                continue
            try:
                for lo, hi in ranges:
                    i = bisect.bisect_left(vals, lo)
                    if i < len(vals) and vals[i] <= hi:
                        out.append(f)
                        break
            except TypeError:  # mixed-type stats vs values: keep the file
                out.append(f)
        return out

    def scan_for_keys(
        self, values, version: int | None = None
    ) -> DataFrame:
        """RAW projected rows (+META — no LWW resolve, no live filter) read
        from ONLY the files that can contain any of the first-key-column
        ``values``. The caller narrows to its exact keys (whole keys or key
        prefixes), then applies :meth:`resolve_live` — together an
        O(probed-keys x file-size) point-set read instead of an O(table)
        scan, the shape that keeps per-batch index lookups flat as the
        table grows 100x. ``version`` reads an older retained snapshot
        (e.g. the pre-batch state during a crash replay). Records
        ``last_scan_stats = {files_total, files_read}`` for IO assertions."""
        meta = self._meta if version is None else self._load_version(version)
        saved, self._meta = self._meta, meta
        try:
            files = self.files_for_key_values(values)
            self.last_scan_stats = {
                "files_total": len(meta["files"]),
                "files_read": len(files),
            }
            fields = self.schema_fields()
            df = self._read_files(
                files, fields, changes=self._parsed_changes()
            )
            if df is None:
                ddl = ", ".join(
                    f"`{n}` {sql_type(t)}" for n, t in fields + META_FIELDS
                )
                df = self.spark.createDataFrame([], ddl)
            return df
        finally:
            self._meta = saved

    def lookup(self, key_value: tuple) -> DataFrame:
        """Point lookup for one key: scans ONLY the files whose bucket and
        key range can contain it (typically one file regardless of table
        size — the O(1)-ish read the per-file footer stats buy)."""
        live = self._live_view(self._files_for_key(key_value))
        cond = None
        for k, v in zip(self.key, key_value):
            c = F.col(k) == F.lit(v)
            cond = c if cond is None else (cond & c)
        return live.filter(cond).select(
            *[f"`{n}`" for n, _ in self.schema_fields()]
        )

    # -------------------------------------------------------------- merging
    def _write_data(self, merged: DataFrame, out_dir: str) -> None:
        """One data write for merge/compact: bucket-partitioned, plus the
        truncate-transform key-prefix level when ``file_block_prefix`` is
        on (separate files per key cluster -> skippable independently)."""
        part_cols = ["_bucket"]
        if self.file_block_prefix:
            merged = merged.withColumn(
                "_kblk",
                F.substring(
                    F.coalesce(
                        F.col(self.key[0]).cast("string"), F.lit("")
                    ),
                    1,
                    self.file_block_prefix,
                ),
            )
            part_cols.append("_kblk")
        writer = merged.write.partitionBy(*part_cols).mode("overwrite")
        if self.parquet_block_size:
            writer = writer.option(
                "parquet.block.size", str(self.parquet_block_size)
            )
        writer.parquet(out_dir)

    def _stat_written(
        self, out_dir: str, schema_id: int, change_lsn: int
    ) -> list[dict]:
        """Walk the freshly written data dir (any partition depth) and stamp
        each file's manifest entry with its footer key stats."""
        out = []
        for dirpath, _dirs, fnames in sorted(os.walk(out_dir)):
            bucket = next(
                (
                    int(seg.split("=", 1)[1])
                    for seg in dirpath.split(os.sep)
                    if seg.startswith("_bucket=")
                ),
                None,
            )
            if bucket is None:
                continue
            for part in sorted(fnames):
                if not part.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, part)
                mn, mx, nrows, ranges = _file_key_stats(full, self.key[0])
                rel = os.path.relpath(full, self.root)
                out.append(
                    {
                        "path": rel,
                        "bucket": bucket,
                        "schema_id": schema_id,
                        "change_lsn": change_lsn,
                        "min_key": mn,
                        "max_key": mx,
                        "key_ranges": ranges,
                        "rows": nrows,
                    }
                )
        return out

    def merge(
        self,
        batch_df: DataFrame | None,
        batch_id: int,
        lsn_hwm: int,
        new_schemas: list[dict] | None = None,
        new_schema_id: int | None = None,
        new_truncate_lsn: int | None = None,
        extra_summary: dict | None = None,
        affected_buckets: list[int] | None = None,
        batch_rows: int | None = None,
        strategy: str | None = None,
        new_schema_changes: list | None = None,
        bucket_key_ranges: dict | None = None,
        bucket_batch_rows: dict | None = None,
    ) -> dict:
        """Copy-on-write upsert of a deduped batch + single atomic commit.

        ``batch_df`` must carry the FINAL (post-batch) schema fields + META
        and at most one row per key (LWW-deduped). ``new_schemas`` /
        ``new_schema_id`` publish schema evolution that happened inside the
        batch; ``new_truncate_lsn`` publishes a table truncate. Idempotent:
        a batch_id at or below the last committed one is skipped wholesale
        (exactly-once under Spark's replay-on-restart, E2).

        Three physical strategies (result-identical, covered by the same
        oracle tests):

        - ``join`` (default when the batch is broadcastable): lake bytes
          NEVER shuffle. The deduped batch's (key, lsn) set is broadcast;
          survivors of the old files are a map-side left join + filter,
          stale batch rows are a map-side inner join, and only the (small)
          batch side repartitions by bucket. Per batch the touched lake
          data flows parquet-scan -> map filter -> parquet-write exactly
          once — the shape that survives 100 TB, where shuffling the lake
          through an exchange would dominate (and this VM's memory-bandwidth
          ceiling shows exactly that effect locally).
        - ``chunked`` (mid-size batches, up to ~chunk_max_groups x the
          broadcast budget): the batch's buckets are bin-packed
          (``_pack_buckets``, fed by ``bucket_batch_rows`` from the
          caller's existing lineage job) into chunks whose key sets each
          broadcast; every chunk runs the join strategy against only its
          own buckets' files and the chunks union into one write — lake
          bytes STILL never cross an exchange.
        - ``mixed`` (chunkable batch with individually-over-budget hot
          buckets): the small buckets run chunked joins, ONLY the hot
          buckets take the agg shuffle — the lake exchange is bounded by
          the genuinely hot buckets, not every touched one.
        - ``agg`` (fallback for huge batches): union old+batch, per-key
          max_by reduce (partial-aggregated), repartition by bucket.
          Shuffles touched lake rows; used when no bucket stats exist or
          the chunk count would exceed ``chunk_max_groups``.

        ``batch_rows`` / ``bucket_batch_rows`` (when known, e.g. from the
        caller's lineage job) pick the strategy automatically.
        """
        cur = self._meta
        if batch_id <= cur["last_batch"]["id"]:
            return {"skipped": True, "version": cur["version"], "batch_id": batch_id}

        schemas = new_schemas if new_schemas is not None else cur["schemas"]
        schema_id = new_schema_id if new_schema_id is not None else cur["schema_id"]
        final_fields = [
            tuple(f)
            for s in schemas
            if s["schema_id"] == schema_id
            for f in s["fields"]
        ]
        truncate_lsn = (
            max(cur["truncate_lsn"], new_truncate_lsn)
            if new_truncate_lsn is not None
            else cur["truncate_lsn"]
        )
        new_version = cur["version"] + 1
        # the post-commit change history: old files are projected THROUGH it
        # (stepwise retype folding) and new files are stamped with its length
        history = (
            new_schema_changes
            if new_schema_changes is not None
            else cur.get("schema_changes", [])
        )
        base0 = next(
            [tuple(f) for f in s["fields"]]
            for s in cur["schemas"]
            if s["schema_id"] == 0
        )
        _, aligned, _ = replay_changes(base0, history, self.key)
        parsed_changes = [(int(l), c) for (l, _), c in zip(history, aligned)]
        # LSN stamp: every change in the post-commit history is folded into
        # the values this merge writes, so the files' unapplied tail is
        # exactly the changes with lsn > this stamp (late-arriving lower-LSN
        # control events land BELOW it and are never replayed onto values
        # that already reflect them — see the manifest docstring)
        change_lsn = max((int(l) for l, _ in history), default=-1)
        files: list[dict] = []
        rewritten, affected = 0, []
        appended = False

        mor = bool(cur.get("merge_on_read"))
        if strategy is None and mor:
            strategy = "append"
        if batch_df is not None and (strategy == "append") != mor:
            # COW strategies assume one stored row per key (their old-file
            # reads don't LWW-resolve), and appends on a COW table would
            # silently break that invariant the other way round
            raise ValueError(
                f"strategy='append' is exactly the merge-on-read commit "
                f"path (table merge_on_read={mor}, got {strategy!r})"
            )
        if batch_df is not None and strategy == "append":
            # O(batch) delta commit: no old file is read or rewritten. The
            # batch is key-range sharded + key-sorted so each delta file's
            # footer ranges are tight — later point-set reads skip deltas
            # whose range misses the probed keys. bucket -1 = "not
            # hash-bucketed" (see _files_for_key / files_for_key_values).
            b = batch_df.withColumn("_bucket", F.lit(-1).cast("int"))
            merged = b.repartitionByRange(
                max(1, int(self.append_shards)), F.col(self.key[0])
            ).sortWithinPartitions(*self.key)
            data_rel = f"data/v{new_version}-{uuid.uuid4().hex[:8]}"
            out_dir = os.path.join(self.root, data_rel)
            self._write_data(merged, out_dir)
            files = self._stat_written(out_dir, schema_id, change_lsn)
            rewritten = len(files)
            files.extend(cur["files"])
            appended = True
        elif batch_df is not None:
            b = batch_df.withColumn(
                "_bucket", bucket_expr(self.key, self.n_buckets)
            )
            if affected_buckets is not None:
                # caller already knows (e.g. from its lineage-metrics job) —
                # saves one job per batch
                affected = sorted(affected_buckets)
            else:
                # small driver-side control read: just the distinct bucket ids
                affected = sorted(
                    r[0] for r in b.select("_bucket").distinct().collect()
                )
        chunk_plan = None
        agg_buckets: list = []

        def _plan_over_budget() -> str:
            """Pick between chunked / mixed / agg for an over-budget batch:
            join-chunk every bucket that fits the broadcast budget, and
            shuffle (agg) ONLY the buckets that are individually too hot —
            the lake exchange is then bounded by the genuinely hot buckets
            instead of every touched one."""
            nonlocal chunk_plan, agg_buckets
            if not bucket_batch_rows:
                return "agg"
            small = {
                k: v for k, v in bucket_batch_rows.items()
                if v <= self.broadcast_max_rows
            }
            if not small:  # every bucket is hot: plain agg over all
                return "agg"
            agg_buckets = sorted(
                k for k, v in bucket_batch_rows.items()
                if v > self.broadcast_max_rows
            )
            chunk_plan = _pack_buckets(
                small, self.broadcast_max_rows, self.chunk_max_groups
            )
            if chunk_plan is None:  # too many chunks: plan-size guard
                agg_buckets = []
                return "agg"
            if agg_buckets:
                return "mixed"
            return "chunked"

        if strategy is None:
            if batch_rows is None or batch_rows <= self.broadcast_max_rows:
                strategy = "join"
                # batch ~ touched-lake-sized: the two key-set broadcasts
                # cost more than one shuffle of the union — take agg
                # (see join_min_lake_ratio; manifest row counts, no job)
                if batch_rows is not None and affected:
                    aset = set(affected)
                    touched_rows = sum(
                        f.get("rows") or 0
                        for f in cur["files"]
                        if f["bucket"] in aset
                    )
                    if (
                        touched_rows
                        and touched_rows
                        < batch_rows * self.join_min_lake_ratio
                    ):
                        strategy = "agg"
            else:
                strategy = _plan_over_budget()
        elif strategy in ("chunked", "mixed"):
            if not bucket_batch_rows:
                raise ValueError(
                    f"strategy={strategy!r} needs bucket_batch_rows"
                )
            strategy = _plan_over_budget()
        if affected and not appended:
            touched = [f for f in cur["files"] if f["bucket"] in affected]
            untouched = [f for f in cur["files"] if f["bucket"] not in affected]
            if bucket_key_ranges:
                # file skipping WITHIN an affected bucket: a file ALL of
                # whose key intervals (per-row-group, so a mixed hot+cold
                # file keeps its gap visible) are disjoint from the batch's
                # range for that bucket cannot contain any batch key (so no
                # LWW race either way) — leave it in place instead of
                # rewriting the hot bucket wholesale. ``bucket_key_ranges``
                # comes from the caller's existing lineage aggregation
                # (zero extra jobs)
                kept = []
                for f in touched:
                    rng = bucket_key_ranges.get(f["bucket"])
                    ranges = _file_ranges(f)
                    try:
                        # batch side: either a legacy (min, max) tuple or a
                        # round-4 interval list (per key-prefix block) —
                        # disjoint iff every (file, batch) interval pair is
                        if rng and not isinstance(rng[0], (list, tuple)):
                            rng = [rng]
                        disjoint = (
                            bool(rng)
                            and ranges is not None
                            and all(r0 is not None for r0, _ in rng)
                            and all(
                                fmax < r0 or fmin > r1
                                for fmin, fmax in ranges
                                for r0, r1 in rng
                            )
                        )
                    except TypeError:  # mixed-type stats: never skip
                        disjoint = False
                    (untouched if disjoint else kept).append(f)
                touched = kept
            key = list(self.key)

            def _load_old(file_list):
                o = self._read_files(
                    file_list, final_fields, changes=parsed_changes
                )
                if o is not None:
                    o = o.withColumn(
                        "_bucket", bucket_expr(self.key, self.n_buckets)
                    )
                    # rows killed by a truncate can be GC'd while we rewrite
                    o = o.filter(F.col("_lsn") > F.lit(truncate_lsn))
                return o

            def _join_merge(o, bb, n_parts):
                # broadcast the batch's (key, lsn) set; lake rows never
                # shuffle
                bk = F.broadcast(
                    bb.select(*key, F.col("_lsn").alias("_b_lsn"))
                )
                # old survivors: no batch row for the key, or batch is
                # stale (ties -> old wins: identical redeliveries)
                keep_old = (
                    o.join(bk, key, "left")
                    .filter(
                        F.col("_b_lsn").isNull()
                        | (F.col("_b_lsn") <= F.col("_lsn"))
                    )
                    .drop("_b_lsn")
                )
                # batch rows beaten by an existing newer/equal row
                # (map-side inner join over old; at most |batch| keys out)
                stale = (
                    o.join(bk, key, "inner")
                    .filter(F.col("_lsn") >= F.col("_b_lsn"))
                    .select(*key)
                )
                keep_batch = bb.join(F.broadcast(stale), key, "left_anti")
                return keep_old.unionByName(
                    keep_batch.repartition(max(n_parts, 1), "_bucket")
                ).sortWithinPartitions("_bucket", *key)

            def _agg_merge(o, bb, n_parts):
                m = o.unionByName(bb) if o is not None else bb
                payload = [c for c in m.columns if c not in key]
                return (
                    m.groupBy(*key)
                    .agg(
                        F.max_by(
                            F.struct(*payload), F.col("_lsn")
                        ).alias("_s")
                    )
                    .select(*key, F.col("_s.*"))
                    .repartition(max(n_parts, 1), "_bucket")
                    .sortWithinPartitions("_bucket", *key)
                )

            if strategy in ("chunked", "mixed") and chunk_plan is not None:
                # one broadcast join per broadcastable bucket chunk; under
                # 'mixed' the individually-over-budget buckets get their
                # own agg (shuffle bounded to the hot buckets); everything
                # unions into a single write + commit, and the join-side
                # lake rows still never cross an exchange
                merged = None
                planned = {bkt for grp in chunk_plan for bkt in grp}
                planned |= set(agg_buckets)
                groups = list(chunk_plan)
                for bkt in affected:
                    if bkt not in planned:
                        # caller stats missed this bucket: its batch size is
                        # UNKNOWN, so it cannot be proven broadcastable —
                        # route it to the agg (shuffle) group instead of
                        # defaulting to a possibly-over-budget broadcast
                        # join (the exact case broadcast_max_rows guards)
                        agg_buckets.append(bkt)
                for group in groups:
                    gset = set(group)
                    b_g = b.filter(F.col("_bucket").isin(group))
                    old_g = _load_old(
                        [f for f in touched if f["bucket"] in gset]
                    )
                    part = (
                        b_g.repartition(
                            max(len(group), 1), "_bucket"
                        ).sortWithinPartitions("_bucket", *key)
                        if old_g is None
                        else _join_merge(old_g, b_g, len(group))
                    )
                    merged = (
                        part if merged is None else merged.unionByName(part)
                    )
                if agg_buckets:
                    b_a = b.filter(F.col("_bucket").isin(agg_buckets))
                    old_a = _load_old(
                        [f for f in touched if f["bucket"] in set(agg_buckets)]
                    )
                    part = _agg_merge(old_a, b_a, len(agg_buckets))
                    merged = (
                        part if merged is None else merged.unionByName(part)
                    )
            else:
                old = _load_old(touched)
                if old is None:
                    merged = b.repartition(
                        max(len(affected), 1), "_bucket"
                    ).sortWithinPartitions("_bucket", *key)
                elif strategy == "join":
                    merged = _join_merge(old, b, len(affected))
                else:
                    # partial aggregation collapses per-key map-side before
                    # the single shuffle; sortWithinPartitions gives
                    # key-sorted files
                    merged = _agg_merge(old, b, len(affected))
            # per-attempt unique staging dir: a writer that loses the manifest
            # race must leave only orphan files, never clobber the winner's
            # already-published data (its files are GC'd by expire_snapshots)
            data_rel = f"data/v{new_version}-{uuid.uuid4().hex[:8]}"
            out_dir = os.path.join(self.root, data_rel)
            self._write_data(merged, out_dir)
            files.extend(
                self._stat_written(out_dir, schema_id, change_lsn)
            )
            rewritten = len(files)
            files.extend(untouched)
        elif not appended:
            files = list(cur["files"])

        meta = {
            "version": new_version,
            "table": cur["table"],
            "key": cur["key"],
            "n_buckets": cur["n_buckets"],
            "merge_on_read": mor,
            "schema_id": schema_id,
            "schemas": schemas,
            "schema_changes": (
                new_schema_changes
                if new_schema_changes is not None
                else cur.get("schema_changes", [])
            ),
            "files": files,
            "truncate_lsn": truncate_lsn,
            "last_batch": {"id": batch_id, "lsn_hwm": max(lsn_hwm, cur["last_batch"]["lsn_hwm"])},
            "parent": cur["version"],
            "committed_at": time.time(),
        }
        if extra_summary:
            meta["summary"] = extra_summary
        self._publish(self.root, meta)
        self._meta = meta
        return {
            "skipped": False,
            "version": new_version,
            "batch_id": batch_id,
            "affected_buckets": affected,
            "files_written": rewritten,
            "strategy": strategy if (affected or appended) else None,
            "chunks": len(chunk_plan) if chunk_plan else None,
            "agg_buckets": len(agg_buckets) if agg_buckets else None,
        }

    # ----------------------------------------------------------- compaction
    def compact(self, tombstone_watermark_lsn: int | None = None) -> dict:
        """Rewrite all buckets dropping truncated rows and tombstones whose
        LSN is below ``tombstone_watermark_lsn`` (only safe once the source
        guarantees no event older than that watermark can still arrive —
        the engine analog of advancing the reference's replication slot via
        ``send_feedback``, ``postgres_logical.py:186-198``)."""
        cur = self._meta
        fields = self.schema_fields()
        parsed_changes = self._parsed_changes()
        df = self._read_files(cur["files"], fields, changes=parsed_changes)
        if df is None:
            return {"version": cur["version"], "compacted": 0}
        df = df.filter(F.col("_lsn") > F.lit(cur["truncate_lsn"]))
        if cur.get("merge_on_read"):
            # fold the append deltas: resolve BEFORE the tombstone sweep —
            # dropping a tombstone first would resurrect an older live row
            # for the same key still sitting in an earlier delta
            df = self._lww_resolve(df)
        if tombstone_watermark_lsn is not None:
            df = df.filter(
                (~F.col("_deleted")) | (F.col("_lsn") > F.lit(tombstone_watermark_lsn))
            )
        new_version = cur["version"] + 1
        data_rel = f"data/v{new_version}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.root, data_rel)
        if cur.get("merge_on_read"):
            # MOR tables stay RANGE-clustered (bucket -1): their keys are
            # uniform hashes, so hash buckets would spread every file's
            # footer range across the whole keyspace and point-set pruning
            # would never skip a compacted file again
            out = (
                df.withColumn("_bucket", F.lit(-1).cast("int"))
                .repartitionByRange(
                    self.n_buckets, *[F.col(k) for k in self.key]
                )
                .sortWithinPartitions(*self.key)
            )
        else:
            out = (
                df.withColumn(
                    "_bucket", bucket_expr(self.key, self.n_buckets)
                )
                .repartition(self.n_buckets, "_bucket")
                .sortWithinPartitions("_bucket", *self.key)
            )
        self._write_data(out, out_dir)
        change_lsn = max((l for l, _ in parsed_changes), default=-1)
        files = self._stat_written(
            out_dir, cur["schema_id"], change_lsn
        )
        meta = dict(cur)
        meta.update(
            version=new_version, files=files, parent=cur["version"],
            committed_at=time.time(),
        )
        self._publish(self.root, meta)
        self._meta = meta
        return {"version": new_version, "compacted": len(files)}

    def expire_snapshots(
        self, keep_last: int = 2, orphan_grace_s: float = 3600.0
    ) -> dict:
        """Retention: drop manifests older than the newest ``keep_last`` and
        delete data files referenced only by them (Iceberg expire_snapshots
        semantics — the engine analog of the reference's WAL reclamation via
        ``send_feedback``, which lets Postgres discard acked segments).

        Also GCs ORPHAN data files — files under ``data/`` referenced by no
        manifest at all: the staging leftovers of crashed or
        concurrency-losing writers (each merge attempt stages under a unique
        dir, so a loser's files are guaranteed unreferenced). Only files
        older than ``orphan_grace_s`` are touched, so an in-flight writer's
        fresh staging dir is never swept from under it."""
        import time as _time

        mdir = os.path.join(self.root, "metadata")
        versions = sorted(
            int(f[1:-5])
            for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        )
        keep = set(versions[-keep_last:])
        drop = [v for v in versions if v not in keep]
        live_files = set()
        for v in keep:
            live_files.update(f["path"] for f in self._load_version(v)["files"])
        removed = 0
        for v in drop:
            for f in self._load_version(v)["files"]:
                if f["path"] not in live_files:
                    p = os.path.join(self.root, f["path"])
                    if os.path.exists(p):
                        os.unlink(p)
                        removed += 1
            os.unlink(os.path.join(mdir, f"v{v}.json"))
        # orphan sweep: anything on disk no remaining manifest references.
        # Eligibility is tied to COMMIT LINEAGE, not just mtime: a staging
        # dir is named data/v<N>-<attempt>, and the attempt at version N is
        # decided only once some vN manifest is published — so files under
        # dirs with N > the newest published version belong to an in-flight
        # writer and are NEVER swept, no matter how long its (huge/slow)
        # staging write has been running. The mtime grace remains as a
        # second guard for decided versions.
        referenced = set(live_files)
        newest = max(versions) if versions else -1
        data_root = os.path.join(self.root, "data")
        orphans_removed = 0
        cutoff = _time.time() - orphan_grace_s
        if os.path.isdir(data_root):
            for dirpath, _dirs, files in os.walk(data_root):
                dirname = os.path.relpath(dirpath, data_root).split(os.sep)[0]
                try:
                    dir_version = int(dirname.split("-")[0].lstrip("v"))
                except ValueError:
                    dir_version = -1  # unrecognized layout: mtime-only rule
                for fn in files:
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, self.root)
                    if rel in referenced or dir_version > newest:
                        continue
                    try:
                        if os.path.getmtime(full) <= cutoff:
                            os.unlink(full)
                            orphans_removed += 1
                    except OSError:
                        pass  # concurrent sweep / writer finishing up
        # sweep now-empty data dirs (same in-flight guard: only decided
        # versions — an active writer's staging/_temporary dirs hold no
        # .parquet direct children yet and must not be rmtree'd)
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                full = os.path.join(data_root, d)
                try:
                    if int(d.split("-")[0].lstrip("v")) > newest:
                        continue
                except ValueError:
                    pass
                for sub in sorted(os.listdir(full)):
                    subp = os.path.join(full, sub)
                    # emptiness must be checked RECURSIVELY: with
                    # file_block_prefix the parquet files live one level
                    # deeper (_bucket=K/_kblk=P/*.parquet), and a direct-
                    # children check would rmtree live data
                    if os.path.isdir(subp) and not any(
                        x.endswith(".parquet")
                        for _, _, fn in os.walk(subp)
                        for x in fn
                    ):
                        import shutil

                        shutil.rmtree(subp, ignore_errors=True)
                if not os.listdir(full):
                    os.rmdir(full)
        return {
            "expired_versions": drop,
            "files_removed": removed,
            "orphans_removed": orphans_removed,
        }

    def snapshot_log(self) -> list[dict]:
        """All manifests oldest-first (time travel / lineage audit)."""
        mdir = os.path.join(self.root, "metadata")
        out = []
        for f in sorted(
            (f for f in os.listdir(mdir) if f.startswith("v") and f.endswith(".json")),
            key=lambda f: int(f[1:-5]),
        ):
            with open(os.path.join(mdir, f)) as fh:
                out.append(json.load(fh))
        return out
