"""Round-5 torture: the COMPOSED pipeline (CDC apply + incremental
MinHash index + exactly-once pairs lake) driven through a multi-batch
stream with truncate, schema evolution, deletes, duplicate deliveries —
and a crash injected into EVERY commit window: after the lake commit
(before the index), after the doc-lake commit (before postings), after
the postings commit (before pairs). Each crash is followed by the
engine's real recovery action (re-apply of the same batch). The end
state must match (a) the LSN oracle for the lake, (b) a full fingerprint
recompute for the index, and (c) a NEVER-CRASHED twin run for the pairs
table — bit-for-bit, exactly once."""

import os

import pytest
from pyspark.sql import functions as F

from cdc_spark.apply import CdcApply
from cdc_spark.config import EngineConfig
from cdc_spark.functions.dedupe import BANDS, K_MINHASH, minhash_bands
from cdc_spark.functions.dedupe_index import MinHashIndex
from cdc_spark.loggen import change_log
from cdc_spark.oracle import assert_matches, replay


class _Boom(RuntimeError):
    pass


def _mk_applier(spark, root):
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "_ckpt"),
        n_buckets=4, neardup_index=True, compact_every=2,
    )
    return CdcApply(spark, cfg)


def _pairs_set(applier):
    return {
        (r["doc_a"], r["doc_b"])
        for r in applier.neardups("repos").collect()
    }


def test_composed_pipeline_survives_every_crash_window(
    spark, tmpdir_factory_clean
):
    log = change_log(
        spark, 1500, n_repos=15, n_paths=4, delete_rate=0.12,
        dup_rate=0.05, truncate_lsns=(700,),
        schema_changes={400: {"action": "add", "column": "stars",
                              "type": "long"}},
        seed=17,
    )
    bounds = [(0, 300), (300, 600), (600, 900), (900, 1200), (1200, 1501)]
    batches = [
        log.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi))
        for lo, hi in bounds
    ]

    # twin: never crashes
    troot = tmpdir_factory_clean("t5_twin")
    twin = _mk_applier(spark, troot)
    for i, b in enumerate(batches):
        twin.apply_batch(b, i)

    # victim: one crash window per batch, then the engine's real recovery
    # (re-apply of the same batch id), plus a plain duplicate replay
    vroot = tmpdir_factory_clean("t5_victim")
    victim = _mk_applier(spark, vroot)

    def crash_after_lake_commit(b, i):
        # index never sees the batch: monkey-break _update_neardup_index
        real = victim._update_neardup_index
        victim._update_neardup_index = lambda *a, **k: (_ for _ in ()).throw(
            _Boom("crash before index")
        )
        try:
            with pytest.raises(_Boom):
                victim.apply_batch(b, i)
        finally:
            victim._update_neardup_index = real

    def crash_after_doc_commit(b, i):
        # doc-lake commit lands, postings commit does not
        idx = victim._neardup_idx.get("repos")
        if idx is None:
            idx = MinHashIndex(
                spark, os.path.join(vroot, "_neardup_index", "repos"),
                n_buckets=4,
            )
            victim._neardup_idx["repos"] = idx
        real = idx.post.merge

        def boom(*a, **k):
            raise _Boom("crash before postings")

        idx.post.merge = boom
        try:
            with pytest.raises(_Boom):
                victim.apply_batch(b, i)
        finally:
            idx.post.merge = real

    def crash_after_index_commit(b, i):
        # both index lakes commit, the pairs lake does not
        plake = victim._neardups_lake("repos")
        real = plake.merge

        def boom(*a, **k):
            raise _Boom("crash before pairs")

        plake.merge = boom
        try:
            with pytest.raises(_Boom):
                victim.apply_batch(b, i)
        finally:
            plake.merge = real

    crashes = [
        crash_after_index_commit,
        crash_after_lake_commit,
        # batch 2 carries the TRUNCATE: its rebuild path has no pairs
        # write, so its windows are lake->index and doc->postings
        crash_after_doc_commit,
        crash_after_index_commit,
        crash_after_doc_commit,
    ]
    for i, (b, crash) in enumerate(zip(batches, crashes)):
        crash(b, i)
        victim.apply_batch(b, i)   # recovery replay
        victim.apply_batch(b, i)   # plain duplicate replay (no-op)

    # (a) lake == LSN oracle
    lake = victim.lake_for("repos").refresh()
    assert_matches(
        lake.read().toPandas(),
        replay(log.toPandas(), victim.cfg.base_fields),
    )
    # (b) index == full fingerprint recompute over the live lake, and the
    # band-major postings mirror the doc-major bands
    live = lake.read().select(
        F.xxhash64("repo", "path").alias("doc_id"),
        F.col("content").cast("string").alias("text"),
    )
    want = {
        (r["doc_id"], r["band"], r["bkey"])
        for r in minhash_bands(live, K_MINHASH, BANDS).collect()
    }
    idx = MinHashIndex(
        spark, os.path.join(vroot, "_neardup_index", "repos")
    )
    assert {
        (r["doc_id"], r["band"], r["bkey"]) for r in idx.bands().collect()
    } == want
    assert {
        (r["doc_id"], r["band"], r["bkey"])
        for r in idx.postings().collect()
    } == want
    assert len(want) > 0
    # (c) pairs == the never-crashed twin's, exactly once
    got = applied = victim.neardups("repos")
    rows = applied.collect()
    assert len(rows) == len({(r["doc_a"], r["doc_b"]) for r in rows})
    assert _pairs_set(victim) == _pairs_set(twin)
    assert got.count() > 0