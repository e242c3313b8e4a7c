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
    live = {i: b0 for i in range(40)}

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
    for _, g in got.groupby("query_id"):
        assert list(g.sort_values("rank")["rank"]) == [1, 2, 3, 4, 5]
        assert g["adc_x1e6"].min() >= 0
    # a query must not return itself
    assert not ((got["query_id"] == got["cand_id"]).any())


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
