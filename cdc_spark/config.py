"""Engine configuration.

The reference wires components from jsonschema-validated YAML through a
registry (``cdc/utils/registry.py:9-14``, ``cdc/__main__.py:24-58``). Spark
needs far less wiring: one dataclass covering source dir, lake path,
checkpoint path, and the knobs that matter at scale (bucket count, salt,
trigger pacing).
"""

from __future__ import annotations

from dataclasses import dataclass, field


#: The fixed envelope of the change-log stream (FIXTURES.md §1). ``extra``
#: carries values for columns added by schema evolution (wal2json carries
#: them in its parallel arrays; we pre-split the fixed base columns for the
#: vectorized fast path).
ENVELOPE_DDL = (
    "lsn BIGINT, op STRING, `table` STRING, repo STRING, path STRING, "
    "`commit` STRING, lang STRING, content STRING, "
    "extra MAP<STRING,STRING>, schema_change STRING"
)

#: Base lake schema — exactly the BASELINE input_hint shape.
BASE_FIELDS: list[tuple[str, str]] = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]

#: Merge key (reference routes per-table; rows are keyed by repo+path).
KEY_COLUMNS: tuple[str, str] = ("repo", "path")

#: Data-modifying ops (wal2json kinds; reference test_parse_msg.py:18).
DML_OPS = ("insert", "update", "delete")

#: Supported column types for schema evolution (retype uses try_cast).
#: ``decimal`` requires explicit precision/scale — ``decimal(p,s)`` — a bare
#: 'decimal' is rejected by lake.evolve_fields (the change is skipped as
#: poison, mirrored by oracle.replay). The oracle (oracle.py
#: convert/cast_string) mirrors every cast rule per the reference type
#: fixture (tests/cdc/sources/backends/test_parse_msg.py:20).
EVOLUTION_TYPES = (
    "string", "long", "double", "boolean", "timestamp", "date",
    "decimal(p,s)",
)


@dataclass
class EngineConfig:
    """Tuning knobs for the apply pipeline.

    n_buckets: key-hash buckets for the lake layout. Copy-on-write merges
        rewrite only affected buckets, so this bounds write amplification;
        size it so one bucket's data fits an executor (thousands at 100 TB).
    salt: extra shuffle-salt fan-out for the LWW reduce. Catalyst's partial
        aggregation already collapses hot keys map-side for max_by, so 1
        (off) is the right default; raise for pathological single-key skew.
    shuffle_partitions: per-merge shuffle width; ~cores locally, ~2-3x total
        cores on a cluster.
    """

    lake_root: str = "/tmp/cdc_lake"
    checkpoint: str = "/tmp/cdc_checkpoint"
    n_buckets: int = 16
    salt: int = 1
    #: narrow LWW dedup: shuffle only (key, lsn), recover wide payloads via
    #: broadcast semi-join (+33% ingest at 0.5-1 KB payloads, measured).
    #: Default ON — the target workload is source-code content, where
    #: payload bytes dominate. Turn OFF for tiny payloads with mostly-unique
    #: keys per batch. Batches whose winner set exceeds
    #: ``dedup_broadcast_max_rows`` auto-fall back to the wide reduce.
    dedup_narrow: bool = True
    #: winner-set broadcast budget for the narrow dedup; above it the apply
    #: falls back to the wide max_by reduce (same guard as the merge's
    #: ``broadcast_max_rows``)
    dedup_broadcast_max_rows: int = 5_000_000
    #: winner-set size past which the narrow dedup stops paying even when
    #: it still FITS the broadcast budget: its costs (building+shipping the
    #: winner broadcast, a second source pass, the winner-row dropDuplicates
    #: shuffle) all scale with the winner count, while its saving (wide
    #: payload bytes kept out of the exchange) scales with the COLLAPSED
    #: row count x payload width. Measured at 20M events / 2.8M winners /
    #: ~0.1 KB payloads the wide one-shuffle max_by reduce beat narrow by
    #: ~30%; at KB-scale payloads with few winners narrow wins (the round-3
    #: measurement). Raise this for wide-payload workloads.
    dedup_narrow_max_winners: int = 1_000_000
    #: persist each microbatch's envelope frame for the duration of its
    #: apply. OFF by default: the batch is consumed by three jobs, but two
    #: of them prune to narrow columns, so pruned re-reads of the source
    #: beat materializing the wide batch into cache (measured; see
    #: apply_batch). All shipped sources recompute deterministically
    #: (files re-read, rate is offset-derived, pg-logical replays via
    #: readBetweenOffsets). Turn ON for a custom source whose recompute
    #: is expensive or side-effecting.
    persist_batches: bool = False
    #: key-prefix block width for the batch-side multi-interval range
    #: stats: the lineage job groups by (bucket, first key column's
    #: string-cast prefix of this length) so a batch spanning hot AND cold
    #: key clusters reports per-cluster intervals instead of one folded
    #: range (which defeats file skipping — the round-3 BENCH caveat).
    #: Cardinality bound of the driver-side collect: n_buckets x distinct
    #: prefixes actually present — real keyspaces cluster, so this stays
    #: small; intervals are then coalesced to <= lake.MAX_KEY_RANGES per
    #: bucket, and the width only affects pruning PRECISION, never
    #: correctness. 0 disables blocking (one folded interval per bucket,
    #: the round-3 behavior).
    key_block_prefix: int = 4
    #: Iceberg-style truncate-transform file partitioning: when > 0, lake
    #: data files are additionally split by this key prefix width, so hot
    #: and cold key clusters land in SEPARATE files with tight ranges and
    #: a later mixed merge rewrites only the intersecting cluster's files
    #: (a key-sorted mixed file can never be range-skipped: its row groups
    #: bridge the gap). Off by default — it multiplies file count by the
    #: blocks-per-bucket actually present; turn on for range-clustered
    #: CDC streams (the workload the round-3 soak modeled).
    file_block_prefix: int = 0
    #: streaming near-dup screening: when True, every applied batch ALSO
    #: updates a persistent MinHash band index (merge-on-read LakeTables
    #: under <lake_root>/_neardup_index/<table>) with exactly the rows it
    #: changed, and commits the batch's candidate pairs to the
    #: <lake_root>/_neardups/<table> lake (read via CdcApply.neardups()) —
    #: incremental dedup riding the CDC stream instead of re-shingling the
    #: corpus per batch. Off by default (extra jobs per batch).
    neardup_index: bool = False
    #: expected steady-state corpus size for the near-dup index: at index
    #: CREATION the LSH banding is auto-sized from this hint
    #: (functions.dedupe.minhash_autosize), so a 50M-doc stream gets scale
    #: banding by default. None = fixture banding (small corpora). The
    #: banding is pinned at creation (signatures must stay comparable);
    #: changing the hint later only affects NEW indexes.
    neardup_corpus_hint: int | None = None
    #: run lake maintenance every N committed batches (0 = off): compaction
    #: (drop dead rows, consolidate bucket files) + snapshot expiry keeping
    #: the newest ``expire_keep`` manifests. Cheap O(1) truncates and
    #: tombstones accumulate physically until this runs.
    compact_every: int = 0
    expire_keep: int = 8
    #: tombstones older than this many LSNs behind the high-watermark are
    #: dropped at compaction (the source's max out-of-orderness bound)
    tombstone_lag: int = 1_000_000
    shuffle_partitions: int = 32
    max_files_per_trigger: int | None = None
    key: tuple[str, ...] = KEY_COLUMNS
    base_fields: list[tuple[str, str]] = field(
        default_factory=lambda: list(BASE_FIELDS)
    )


#: jsonschema for the YAML config file — validated exactly like the
#: reference wires components (``cdc/__main__.py:24-58`` +
#: ``cdc/utils/registry.py:9-14``): a versioned document naming the source
#: backend (resolved through the sources registry) and the lake/apply knobs.
CONFIG_SCHEMA = {
    "type": "object",
    "properties": {
        "version": {"const": 1},
        "source": {
            "type": "object",
            "properties": {
                "backend": {"type": "string"},
                "path": {"type": "string"},
                "framed": {"type": "boolean"},
                "wire_format": {
                    "enum": ["envelope", "framed", "pgoutput"],
                },
                "relation_registry": {"type": "string"},
            },
            "required": ["backend"],
        },
        "lake": {
            "type": "object",
            "properties": {
                "root": {"type": "string"},
                "checkpoint": {"type": "string"},
                "buckets": {"type": "integer", "minimum": 1},
                "salt": {"type": "integer", "minimum": 1},
                "shuffle_partitions": {"type": "integer", "minimum": 1},
                "max_files_per_trigger": {"type": ["integer", "null"]},
            },
            "required": ["root", "checkpoint"],
        },
        "apply": {
            "type": "object",
            "properties": {
                "dedup_narrow": {"type": "boolean"},
                "dedup_broadcast_max_rows": {"type": "integer", "minimum": 1},
                "compact_every": {"type": "integer", "minimum": 0},
                "expire_keep": {"type": "integer", "minimum": 1},
                "tombstone_lag": {"type": "integer", "minimum": 0},
                "key_block_prefix": {"type": "integer", "minimum": 0},
                "file_block_prefix": {"type": "integer", "minimum": 0},
                "neardup_index": {"type": "boolean"},
                "neardup_corpus_hint": {
                    "type": ["integer", "null"], "minimum": 1,
                },
            },
        },
        "sink": {"type": "object"},
    },
    "required": ["version", "source", "lake"],
}


def load_config(path: str) -> tuple["EngineConfig", dict]:
    """Load + validate a YAML (or JSON — YAML superset) config file and map
    it onto an ``EngineConfig``. Returns ``(cfg, document)``; the document
    keeps the ``source``/``sink`` sections for the CLI to wire through the
    sources registry. Raises ``jsonschema.ValidationError`` on bad input."""
    import jsonschema
    import yaml

    with open(path) as fh:
        doc = yaml.safe_load(fh)
    jsonschema.validate(doc, CONFIG_SCHEMA)
    lake = doc["lake"]
    ap = doc.get("apply", {})
    cfg = EngineConfig(
        lake_root=lake["root"],
        checkpoint=lake["checkpoint"],
        n_buckets=lake.get("buckets", 16),
        salt=lake.get("salt", 1),
        shuffle_partitions=lake.get("shuffle_partitions", 32),
        max_files_per_trigger=lake.get("max_files_per_trigger"),
        dedup_narrow=ap.get("dedup_narrow", True),
        dedup_broadcast_max_rows=ap.get("dedup_broadcast_max_rows", 5_000_000),
        compact_every=ap.get("compact_every", 0),
        expire_keep=ap.get("expire_keep", 8),
        tombstone_lag=ap.get("tombstone_lag", 1_000_000),
        key_block_prefix=ap.get("key_block_prefix", 4),
        file_block_prefix=ap.get("file_block_prefix", 0),
        neardup_index=ap.get("neardup_index", False),
        neardup_corpus_hint=ap.get("neardup_corpus_hint"),
    )
    return cfg, doc
