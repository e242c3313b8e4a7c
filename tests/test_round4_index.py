"""Round-4 VERDICT item 4: the incremental MinHash index — per-batch
signing of only new/changed docs, candidate pairs via the stored index,
LWW replacement of a changed doc's bands, tombstoned deletes, and
equivalence with the one-shot full recompute."""

import os

import pytest
from pyspark.sql import functions as F

from cdc_spark.functions.dedupe import BANDS, K_MINHASH, minhash_bands
from cdc_spark.functions.dedupe_index import MinHashIndex

LOREM = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)


def _doc(i: int, text: str):
    return (i, text)


def _frame(spark, rows, deleted=()):
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    if deleted:
        dead = spark.createDataFrame(
            [(i, "") for i in deleted], "doc_id BIGINT, text STRING"
        ).withColumn("_deleted", F.lit(True))
        df = df.withColumn("_deleted", F.lit(False)).unionByName(dead)
    return df


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_incremental_equals_full_recompute(spark, tmpdir_factory_clean):
    """Insert-only batches: union of per-batch pairs == one-shot pairs on
    the final corpus (the oracled contract, here on the sf0.001 corpus
    with 2 batches through the pytest surface)."""
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    idx = MinHashIndex(spark, tmpdir_factory_clean("mhidx"))
    got = set()
    for i in range(2):
        got |= _pairs(idx.update(d.filter(F.pmod("doc_id", F.lit(2)) == i),
                                 lsn=i + 1, batch_id=i))
    full = minhash_bands(d, K_MINHASH, BANDS)
    a, b = full.alias("a"), full.alias("b")
    want = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .collect()
    }
    assert got == want and len(want) > 0


def test_only_new_docs_are_signed(spark, tmpdir_factory_clean):
    """Batch 2 finds its cross pairs against batch-1 docs WITHOUT batch-1
    texts being available at all — only the stored index can supply them,
    so the signature job provably touches just the new docs."""
    idx = MinHashIndex(spark, tmpdir_factory_clean("mhidx2"))
    idx.update(
        _frame(spark, [_doc(1, LOREM), _doc(2, "totally unrelated words "
                                               "quux corge grault garply")]),
        lsn=1, batch_id=0,
    )
    # batch 2: a near-dup of doc 1; doc 1's text is NOT in this frame
    pairs = idx.update(
        _frame(spark, [_doc(3, LOREM + " extra")]), lsn=2, batch_id=1
    )
    assert (1, 3) in _pairs(pairs)


def test_update_replaces_bands_lww(spark, tmpdir_factory_clean):
    """A changed doc's new bands replace the old ones: a later doc matching
    the OLD text no longer pairs; one matching the NEW text does."""
    idx = MinHashIndex(spark, tmpdir_factory_clean("mhidx3"))
    idx.update(_frame(spark, [_doc(1, LOREM)]), lsn=1, batch_id=0)
    new_text = "fresh content entirely different words one two three four"
    idx.update(_frame(spark, [_doc(1, new_text)]), lsn=2, batch_id=1)
    p_old = idx.update(_frame(spark, [_doc(10, LOREM)]), lsn=3, batch_id=2)
    assert (1, 10) not in _pairs(p_old)
    p_new = idx.update(_frame(spark, [_doc(11, new_text)]), lsn=4, batch_id=3)
    assert (1, 11) in _pairs(p_new)


def test_delete_tombstones_bands(spark, tmpdir_factory_clean):
    idx = MinHashIndex(spark, tmpdir_factory_clean("mhidx4"))
    idx.update(_frame(spark, [_doc(1, LOREM), _doc(2, LOREM)]),
               lsn=1, batch_id=0)
    idx.update(_frame(spark, [], deleted=[1]).filter(F.col("_deleted")),
               lsn=2, batch_id=1)
    pairs = idx.update(_frame(spark, [_doc(3, LOREM)]), lsn=3, batch_id=2)
    got = _pairs(pairs)
    assert (2, 3) in got and (1, 3) not in got


def test_idempotent_and_reopenable(spark, tmpdir_factory_clean):
    """Replaying a batch_id is a no-op on the stored index (the LakeTable
    commit key), and a reopened index keeps its creation-time banding."""
    root = tmpdir_factory_clean("mhidx5")
    idx = MinHashIndex(spark, root, k=16, n_bands=4)
    idx.update(_frame(spark, [_doc(1, LOREM)]), lsn=1, batch_id=0)
    v = idx.lake.version
    idx.update(_frame(spark, [_doc(1, LOREM)]), lsn=1, batch_id=0)  # replay
    assert idx.lake.refresh().version == v
    re = MinHashIndex(spark, root, k=99, n_bands=9)  # args ignored: stored
    assert (re.k, re.n_bands) == (16, 4)
    assert re.bands().count() == 4  # one row per band for doc 1


def test_streaming_neardup_index_tracks_lake(spark, tmpdir_factory_clean):
    """The CDC<->dedup composition: with cfg.neardup_index on, each applied
    batch updates the persistent band index with exactly its changed rows.
    Invariant: after any batch sequence (inserts, updates, deletes), the
    index's live bands EQUAL minhash_bands recomputed over the lake's live
    content — and the per-batch candidate pairs land in a queryable
    _neardups table."""
    from cdc_spark.apply import CdcApply
    from cdc_spark.config import EngineConfig
    from cdc_spark.loggen import change_log

    root = tmpdir_factory_clean("ndidx")
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "_ckpt"), n_buckets=4,
        neardup_index=True,
    )
    applier = CdcApply(spark, cfg)
    # batch 2 carries a TRUNCATE: the index must rebuild from the lake's
    # post-merge live state (the one change row-by-row update can't see)
    log = change_log(spark, 1200, n_repos=12, n_paths=4, delete_rate=0.15,
                     dup_rate=0.03, truncate_lsns=(900,), seed=31)
    for i, (lo, hi) in enumerate([(0, 400), (400, 800), (800, 1201)]):
        applier.apply_batch(
            log.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi)), i
        )
    lake = applier.lake_for("repos")
    live_docs = lake.read().select(
        F.xxhash64("repo", "path").alias("doc_id"),
        F.col("content").alias("text"),
    )
    want = {
        (r["doc_id"], r["band"], r["bkey"])
        for r in minhash_bands(live_docs, K_MINHASH, BANDS).collect()
    }
    idx = MinHashIndex(spark, os.path.join(root, "_neardup_index", "repos"))
    got = {
        (r["doc_id"], r["band"], r["bkey"]) for r in idx.bands().collect()
    }
    assert got == want and len(want) > 0
    # the pairs table is queryable through the API, batch-keyed, and
    # pair-unique by construction
    nd = applier.neardups("repos")
    assert set(nd.columns) == {"doc_a", "doc_b", "batch_id"}
    assert nd.count() == nd.select("doc_a", "doc_b").distinct().count()


def test_index_catches_up_after_crash_between_commits(
    spark, tmpdir_factory_clean
):
    """Crash window: lake commit succeeded, index update did not. On
    replay the LAKE merge skips but the index update must still run (its
    own commit is idempotent), restoring the tracking invariant — and a
    plain duplicate replay must not duplicate _neardups pairs."""
    import shutil

    from cdc_spark.apply import CdcApply
    from cdc_spark.config import EngineConfig
    from cdc_spark.loggen import change_log

    root = tmpdir_factory_clean("ndcrash")
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "_ckpt"), n_buckets=2,
        neardup_index=True,
    )
    applier = CdcApply(spark, cfg)
    log = change_log(spark, 300, n_repos=8, n_paths=3, seed=5)
    applier.apply_batch(log, 0)
    want_pairs = {
        (r["doc_a"], r["doc_b"]) for r in applier.neardups("repos").collect()
    }
    n_pairs = applier.neardups("repos").count()
    # duplicate replay: lake skips, index skips, pairs NOT duplicated
    applier.apply_batch(log, 0)
    assert applier.neardups("repos").count() == n_pairs
    # crash simulation: the index never saw batch 0 (wipe it), lake did
    shutil.rmtree(os.path.join(root, "_neardup_index"))
    applier2 = CdcApply(spark, cfg)  # fresh process
    applier2.apply_batch(log, 0)  # replay: lake skips, index catches up
    # the recovery replay re-derives the SAME pairs and must not duplicate
    # or lose any (the pairs lake commit for batch 0 idempotently skips)
    got_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in applier2.neardups("repos").collect()
    }
    assert got_pairs == want_pairs
    idx = MinHashIndex(spark, os.path.join(root, "_neardup_index", "repos"))
    live = applier2.lake_for("repos").read().select(
        F.xxhash64("repo", "path").alias("doc_id"),
        F.col("content").alias("text"),
    )
    want = {
        (r["doc_id"], r["band"], r["bkey"])
        for r in minhash_bands(live, K_MINHASH, BANDS).collect()
    }
    got = {(r["doc_id"], r["band"], r["bkey"]) for r in idx.bands().collect()}
    assert got == want and len(want) > 0
