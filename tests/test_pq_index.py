"""Incremental PQ index: the codes lake must always equal a fresh encode
of the live corpus against the FROZEN codebooks — through updates,
deletes, stale redelivery, replay, and truncate-rebuild."""

import pytest
from pyspark.sql import functions as F

from cdc_spark.functions.pq import PqIndex, _pq_assign, _subvectors

M, KSUB, DIM = 4, 8, 16


def _vecs(spark, ids, *, lsn=None, deleted=(), nudge=0.0):
    rows = []
    for i in ids:
        v = [((i * 31 + d * 7) % 997) / 997.0 + nudge for d in range(DIM)]
        rows.append((i, None if i in deleted else v, i in deleted,
                     (lsn if lsn is not None else i)))
    return spark.createDataFrame(
        rows,
        "doc_id BIGINT, embedding ARRAY<DOUBLE>, _deleted BOOLEAN, _lsn BIGINT",
    )


def _expected(idx, live_vecs):
    e = live_vecs.select(
        F.col("doc_id").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    enc = _pq_assign(_subvectors(e, idx.m, idx.dim // idx.m), idx.books())
    return {
        (r["vec_id"], r["sub"]): r["code"] for r in enc.collect()
    }


def _stored(idx):
    return {
        (r["doc_id"], r["sub"]): r["code"] for r in idx.codes().collect()
    }


def test_index_tracks_live_corpus(spark, tmp_path):
    root = str(tmp_path / "pq")
    idx = PqIndex(spark, root, m=M, ksub=KSUB, dim=DIM)

    b0 = _vecs(spark, range(0, 40), lsn=100)
    idx.update(b0, lsn=100, batch_id=0)
    assert idx.trained()

    # update batch: changes 5 docs (new lsn), deletes 3, adds 10
    b1 = _vecs(spark, list(range(35, 55)), lsn=200, deleted={36, 38, 40},
               nudge=0.01)
    idx.update(b1, lsn=200, batch_id=1)

    # expected live view: b1 rows win for 35..54, deletes gone
    current = (
        b0.filter(~F.col("doc_id").between(35, 54))
        .unionByName(b1)
        .filter(~F.col("_deleted"))
        .select("doc_id", "embedding")
    )
    assert _stored(idx) == _expected(idx, current)

    # STALE redelivery: doc 37 at an older lsn must NOT clobber b1's row
    stale = _vecs(spark, [37], lsn=150, nudge=0.3)
    idx.update(stale, lsn=150, batch_id=2)
    assert _stored(idx) == _expected(idx, current)

    # replay of batch 1 is a no-op (idempotent commit)
    idx.update(b1, lsn=200, batch_id=1)
    assert _stored(idx) == _expected(idx, current)

    # reopen from disk: books + codes persist
    idx2 = PqIndex(spark, root)
    assert (idx2.m, idx2.ksub, idx2.dim) == (M, KSUB, DIM)
    assert _stored(idx2) == _stored(idx)


def test_truncate_rebuild_keeps_books_frozen(spark, tmp_path):
    root = str(tmp_path / "pq")
    idx = PqIndex(spark, root, m=M, ksub=KSUB, dim=DIM)
    idx.update(_vecs(spark, range(0, 30), lsn=10), lsn=10, batch_id=0)
    books_before = sorted(
        (r["sub"], r["code"], tuple(r["cv"])) for r in idx.books().collect()
    )
    post = _vecs(spark, range(100, 120), lsn=50)
    idx.rebuild(post.filter(~F.col("_deleted")), lsn=50, batch_id=1)
    assert _stored(idx) == _expected(
        idx, post.select("doc_id", "embedding")
    )
    books_after = sorted(
        (r["sub"], r["code"], tuple(r["cv"])) for r in idx.books().collect()
    )
    assert books_before == books_after  # codes stay comparable


def test_search_runs_on_codes_only(spark, tmp_path):
    idx = PqIndex(spark, str(tmp_path / "pq"), m=M, ksub=KSUB, dim=DIM)
    b = _vecs(spark, range(0, 60), lsn=5)
    idx.update(b, lsn=5, batch_id=0)
    q = b.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    got = idx.search(q, k=5).toPandas()
    assert set(got["query_id"]) == {0, 1, 2}
    for qid, g in got.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == [1, 2, 3, 4, 5]
        assert g["adc_x1e6"].min() >= 0
        # query ids are EXTERNAL labels by default: the colliding doc is a
        # valid candidate — here the query IS corpus doc qid, and its own
        # codes are the per-subspace argmins for its own subvectors, so
        # self ranks first (at its quantization error, not 0 — ADC is
        # asymmetric)
        assert g.iloc[0]["cand_id"] == qid
    # corpus-member mode: exclude_self drops the collision
    ex = idx.search(q, k=5, exclude_self=True).toPandas()
    assert not ((ex["query_id"] == ex["cand_id"]).any())


def test_train_is_idempotent_and_explicit_train_wins(spark, tmp_path):
    root = str(tmp_path / "pq")
    idx = PqIndex(spark, root, m=M, ksub=KSUB, dim=DIM)
    corpus = _vecs(spark, range(0, 50), lsn=1).select("doc_id", "embedding")
    idx.train(corpus, n_vecs=50)
    books = sorted(
        (r["sub"], r["code"], tuple(r["cv"])) for r in idx.books().collect()
    )
    # later train calls are no-ops (stored books win)
    idx.train(
        _vecs(spark, range(500, 520), lsn=2).select("doc_id", "embedding"),
        n_vecs=20,
    )
    again = sorted(
        (r["sub"], r["code"], tuple(r["cv"])) for r in idx.books().collect()
    )
    assert books == again


def test_first_batch_without_live_rows_raises(spark, tmp_path):
    idx = PqIndex(spark, str(tmp_path / "pq"), m=M, ksub=KSUB, dim=DIM)
    dead_only = _vecs(spark, [1, 2, 3], lsn=10, deleted={1, 2, 3})
    with pytest.raises(ValueError, match="no live vectors"):
        idx.update(dead_only, lsn=10, batch_id=0)
    assert not idx.trained()  # nothing frozen; a later real batch can train
    idx.update(_vecs(spark, range(0, 20), lsn=20), lsn=20, batch_id=1)
    assert idx.trained()


def test_folded_delete_and_reinsert_in_one_batch(spark, tmp_path):
    """A batch carrying delete(doc, lsn=L) + re-insert(doc, lsn>L) must
    collapse to the re-insert — not stamp both versions and leave the
    read-side LWW to tie-break a code against a tombstone."""
    idx = PqIndex(spark, str(tmp_path / "pq"), m=M, ksub=KSUB, dim=DIM)
    idx.update(_vecs(spark, range(0, 30), lsn=100), lsn=100, batch_id=0)
    folded = _vecs(spark, [5], lsn=110, nudge=0.02).unionByName(
        _vecs(spark, [5], lsn=105, deleted={5})
    )
    idx.update(folded, lsn=110, batch_id=1)
    reinserted = _vecs(spark, [5], lsn=110, nudge=0.02).select(
        "doc_id", "embedding"
    )
    got = {
        (r["doc_id"], r["sub"]): r["code"]
        for r in idx.codes().filter(F.col("doc_id") == 5).collect()
    }
    assert got == _expected(idx, reinserted)
    # and the reverse fold (insert then delete at a higher lsn) deletes
    folded2 = _vecs(spark, [6], lsn=115, nudge=0.05).unionByName(
        _vecs(spark, [6], lsn=120, deleted={6})
    )
    idx.update(folded2, lsn=120, batch_id=2)
    assert idx.codes().filter(F.col("doc_id") == 6).count() == 0


def test_rebuild_watermark_respects_per_row_lsns(spark, tmp_path):
    """Rebuild rows carrying per-row _lsn BELOW the batch hwm must
    survive the default truncate watermark."""
    idx = PqIndex(spark, str(tmp_path / "pq"), m=M, ksub=KSUB, dim=DIM)
    idx.update(_vecs(spark, range(0, 20), lsn=10), lsn=10, batch_id=0)
    # post-truncate corpus re-delivered with row lsns 60..79, hwm 100
    post = _vecs(spark, range(60, 80)).withColumn(
        "_lsn", F.col("doc_id")
    ).filter(~F.col("_deleted"))
    idx.rebuild(post, lsn=100, batch_id=1)
    assert idx.codes().count() == 20 * M  # nothing self-killed
    assert set(
        r["doc_id"] for r in idx.codes().select("doc_id").distinct().collect()
    ) == set(range(60, 80))


def test_reopen_with_conflicting_params_raises(spark, tmp_path):
    root = str(tmp_path / "pq")
    idx = PqIndex(spark, root, m=M, ksub=KSUB, dim=DIM)
    idx.update(_vecs(spark, range(0, 20), lsn=1), lsn=1, batch_id=0)
    with pytest.raises(ValueError, match="conflicts with requested"):
        PqIndex(spark, root, dim=DIM * 2)
    # omitted params adopt the stored meta
    ok = PqIndex(spark, root)
    assert (ok.m, ok.ksub, ok.dim) == (M, KSUB, DIM)
