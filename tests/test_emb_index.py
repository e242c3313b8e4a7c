"""Incremental embedding index: tracking invariant, one-shot equivalence,
updates/deletes, replay idempotence, truncate rebuild, and pruning stats."""

import os
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdc_spark.functions.emb_index import EmbIndex, emb_bands
from cdc_spark.functions.similarity import MAX_BUCKET_DOCS, NEARDUP_COSINE, _cos

DIM, BITS, NB = 8, 6, 3


def _vec(i: int, variant: int = 0) -> list[float]:
    # deterministic pseudo-random direction per id; variant > 0 nudges one
    # coordinate slightly (a near-dup of variant 0)
    base = [((i * 31 + d * 7 + 3) % 13 - 6) / 6.0 for d in range(DIM)]
    if variant:
        base[0] += 0.01 * variant
    return base


def _vdf(spark, rows):
    """rows: list of (doc_id, vector[, deleted])"""
    data = [
        (int(r[0]), [float(x) for x in r[1]], bool(r[2]) if len(r) > 2 else False)
        for r in rows
    ]
    return spark.createDataFrame(
        data, "doc_id long, embedding array<double>, _deleted boolean"
    )


def _oneshot(idx, vecs):
    """The one-shot pair recompute with the index's exact parameters."""
    banded = emb_bands(vecs, idx.dim, idx.n_bands, idx.bits)
    ok = (
        banded.groupBy("band", "bkey")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= MAX_BUCKET_DOCS)
        .select("band", "bkey")
    )
    b = banded.join(ok, ["band", "bkey"])
    a = b.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
    c = b.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
    cand = (
        a.join(c, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    va = vecs.select(F.col("doc_id").alias("doc_a"), F.col("embedding").alias("_va"))
    vb = vecs.select(F.col("doc_id").alias("doc_b"), F.col("embedding").alias("_vb"))
    return (
        cand.join(va, ["doc_a"])
        .join(vb, ["doc_b"])
        .select(
            "doc_a", "doc_b", F.round(_cos("_va", "_vb"), 4).alias("cosine")
        )
        .filter(F.col("cosine") >= NEARDUP_COSINE)
        .distinct()
    )


def _pairs_set(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def _assert_tracks(idx, live_vecs):
    """postings lake == recomputed bands over the live corpus; vectors
    lake == the live corpus."""
    got = {
        (r["doc_id"], r["band"], r["bkey"])
        for r in idx.postings().collect()
    }
    want = {
        (r["doc_id"], r["band"], r["bkey"])
        for r in emb_bands(live_vecs, idx.dim, idx.n_bands, idx.bits).collect()
    }
    assert got == want
    lv = {
        r["doc_id"]: tuple(r["embedding"]) for r in idx.vectors().collect()
    }
    ev = {
        r["doc_id"]: tuple(r["embedding"]) for r in live_vecs.collect()
    }
    assert lv == ev


def test_insert_equivalence_and_tracking(spark, tmpdir_factory_clean):
    root = tmpdir_factory_clean("embidx")
    idx = EmbIndex(spark, root, bits=BITS, n_bands=NB, dim=DIM, n_buckets=4)
    # 40 docs; every 5th pair (i, i+1000) is a planted near-dup
    all_rows = []
    for i in range(40):
        all_rows.append((i, _vec(i)))
        if i % 5 == 0:
            all_rows.append((1000 + i, _vec(i, variant=1)))
    half = [r for r in all_rows if r[0] % 2 == 0]
    rest = [r for r in all_rows if r[0] % 2 == 1]
    got = _pairs_set(idx.update(_vdf(spark, half), lsn=1, batch_id=0))
    p2 = idx.update(_vdf(spark, rest), lsn=2, batch_id=1)
    got |= _pairs_set(p2)
    full = _vdf(spark, all_rows).drop("_deleted")
    want = _pairs_set(_oneshot(idx, full))
    assert got == want
    assert any(a % 5 == 0 and b == 1000 + a for a, b in want)  # non-trivial
    _assert_tracks(idx, full)


def test_update_delete_and_replay(spark, tmpdir_factory_clean):
    root = tmpdir_factory_clean("embidx2")
    idx = EmbIndex(spark, root, bits=BITS, n_bands=NB, dim=DIM, n_buckets=4)
    rows0 = [(i, _vec(i)) for i in range(20)]
    idx.update(_vdf(spark, rows0), lsn=20, batch_id=0)
    # batch 1: doc 3 moves to doc 7's direction (near-dup appears), doc 5
    # deleted, doc 20 inserted as near-dup of doc 11
    b1 = [
        (3, _vec(7, variant=2)),
        (5, [0.0] * DIM, True),
        (20, _vec(11, variant=1)),
    ]
    pairs = idx.update(_vdf(spark, b1), lsn=40, batch_id=1)
    ps = _pairs_set(pairs)
    assert (3, 7) in ps
    assert (11, 20) in ps
    assert not any(5 in p for p in ps)
    live = [(i, _vec(i)) for i in range(20) if i not in (3, 5)]
    live += [(3, _vec(7, variant=2)), (20, _vec(11, variant=1))]
    _assert_tracks(idx, _vdf(spark, live).drop("_deleted"))

    # replay of the latest batch returns the same pairs, state unchanged
    idx2 = EmbIndex(spark, root)
    assert (idx2.bits, idx2.n_bands, idx2.dim) == (BITS, NB, DIM)
    replay = _pairs_set(idx2.update(_vdf(spark, b1), lsn=40, batch_id=1))
    assert replay == ps
    _assert_tracks(idx2, _vdf(spark, live).drop("_deleted"))


def test_partial_create_recovers_and_bits_guarded(spark, tmpdir_factory_clean):
    import shutil

    import pytest

    root = tmpdir_factory_clean("embidx5")
    EmbIndex(spark, root, bits=BITS, n_bands=NB, dim=DIM, n_buckets=4)
    # crash window: meta + vectors committed, postings create never ran
    shutil.rmtree(os.path.join(root, "postings"))
    idx = EmbIndex(spark, root)
    assert (idx.bits, idx.n_bands, idx.dim) == (BITS, NB, DIM)
    pairs = idx.update(
        _vdf(spark, [(1, _vec(1)), (2, _vec(1, variant=1))]), lsn=1, batch_id=0
    )
    assert _pairs_set(pairs) == {(1, 2)}
    # bkey pad width caps bits at 24 — wider must refuse at creation
    with pytest.raises(ValueError):
        EmbIndex(spark, tmpdir_factory_clean("embidx6"), bits=28)


def test_truncate_rebuild(spark, tmpdir_factory_clean):
    root = tmpdir_factory_clean("embidx3")
    idx = EmbIndex(spark, root, bits=BITS, n_bands=NB, dim=DIM, n_buckets=4)
    idx.update(_vdf(spark, [(i, _vec(i)) for i in range(15)]), 15, 0)
    fresh = [(100 + i, _vec(i)) for i in range(6)]
    idx.rebuild(_vdf(spark, fresh), lsn=30, batch_id=1)
    _assert_tracks(idx, _vdf(spark, fresh).drop("_deleted"))


def test_small_batch_prunes_files(spark, tmpdir_factory_clean):
    root = tmpdir_factory_clean("embidx4")
    idx = EmbIndex(spark, root, bits=BITS, n_bands=NB, dim=DIM, n_buckets=4)
    for b in range(4):
        rows = [(b * 50 + i, _vec(b * 50 + i)) for i in range(50)]
        idx.update(_vdf(spark, rows), lsn=(b + 1) * 100, batch_id=b)
    idx.update(_vdf(spark, [(999, _vec(999))]), lsn=500, batch_id=4)
    st = idx.last_update_stats
    assert st["pruned"]
    pl = st["postings_lookup"]
    assert pl["files_read"] < pl["files_total"], pl
    # maintenance keeps both lakes compactable
    for lk in idx.maintenance_lakes():
        lk.compact()
    live = [(i, _vec(i)) for i in range(200)] + [(999, _vec(999))]
    _assert_tracks(idx, _vdf(spark, live).drop("_deleted"))
