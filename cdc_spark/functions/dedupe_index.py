"""Incremental MinHash near-dup index — the band-fingerprint index
persisted as a :class:`~cdc_spark.lake.LakeTable`, so each ingest batch
signs ONLY its new/changed documents and candidate pairs come from an
equi-join against the stored index.

This is the shape a production 100 TB training-data pipeline actually
runs: nobody re-shingles the whole corpus per batch. It also composes the
engine's two halves — the CDC apply side (LWW merge, idempotent commits,
tombstones, time travel all come free from LakeTable, keyed here by
``(doc_id, band)``) and the dedup side (the same ``minhash_bands``
fingerprints the one-shot ``q_minhash_lsh_pairs`` uses) — into the product
the north rule describes.

Equivalence contract (oracled as ``minhash_incremental``): for insert-only
batches whose band buckets stay under MAX_BAND_DOCS, the UNION of per-batch
candidate pairs equals the one-shot full-recompute pairs on the final
corpus — every pair's later doc finds the earlier doc's bands already in
the index. Above the cap the two diverge by construction (the incremental
run emitted pairs while the bucket was still small; the full recompute
drops the bucket wholesale) — the cap is a degenerate-bucket guard, and an
already-emitted candidate is not retractable from a streaming pipeline.

Updates and deletes: a changed document's new bands REPLACE its old ones
(LWW on (doc_id, band) by LSN), and a deleted document tombstones all its
bands, so neither stale fingerprints nor dead docs generate future pairs.
A corpus TRUNCATE — the one change no per-row batch can express — has the
:meth:`MinHashIndex.rebuild` path: one merge carrying the new corpus'
bands plus a truncate watermark that kills every older index row in O(1).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake import LakeTable
from .dedupe import BANDS, K_MINHASH, MAX_BAND_DOCS, minhash_bands

#: index row schema: one row per (doc, band) carrying the band fingerprint
INDEX_FIELDS = [("doc_id", "long"), ("band", "int"), ("bkey", "string")]
INDEX_KEY = ("doc_id", "band")


class MinHashIndex:
    """Persistent band-fingerprint index over a document corpus.

    The banding parameters are fixed at CREATION (persisted in
    ``minhash_meta.json``): signatures must be comparable across batches,
    so an index never re-sizes itself — resizing is a rebuild. The
    auto-sizing rule (:func:`~cdc_spark.functions.dedupe.minhash_autosize`)
    applies at creation time, against the corpus size the index is being
    built for.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        k: int = K_MINHASH,
        n_bands: int = BANDS,
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.root = root
        self._meta_path = os.path.join(root, "minhash_meta.json")
        lake_root = os.path.join(root, "bands")
        if LakeTable.exists(lake_root):
            with open(self._meta_path) as fh:
                stored = json.load(fh)
            self.k, self.n_bands = stored["k"], stored["n_bands"]
            self.lake = LakeTable(spark, lake_root).refresh()
        else:
            self.k, self.n_bands = k, n_bands
            os.makedirs(root, exist_ok=True)
            with open(self._meta_path, "w") as fh:
                json.dump({"k": k, "n_bands": n_bands}, fh)
            self.lake = LakeTable.create(
                spark,
                lake_root,
                fields=list(INDEX_FIELDS),
                key=INDEX_KEY,
                n_buckets=n_buckets,
                table="minhash_bands",
            )

    def bands(self) -> DataFrame:
        """The live index: (doc_id, band, bkey), tombstones filtered."""
        return self.lake.read()

    def update(
        self, docs: DataFrame, lsn: int, batch_id: int
    ) -> DataFrame | None:
        """Apply one batch of corpus changes and return its candidate
        pairs.

        ``docs`` carries (doc_id, text[, _deleted]) for the NEW / CHANGED
        / DELETED documents only — the signature job runs over exactly this
        frame, never the corpus (the point of the index). Steps:

        1. band-fingerprint the non-deleted docs (``minhash_bands``);
        2. LWW-merge them into the index lake (idempotent per batch_id;
           deleted docs become tombstones for every band slot);
        3. candidate pairs = the batch's bands equi-joined against the
           post-merge live index on (band, bkey) — new x old AND new x new
           in one join — with the MAX_BAND_DOCS occupancy cap evaluated
           against CURRENT index occupancy.

        Returns (doc_a, doc_b) with doc_a < doc_b, distinct — or ``None``
        when the index had ALREADY applied this batch_id (idempotent
        replay): the caller must not re-append pairs it already emitted.
        """
        has_del = "_deleted" in docs.columns
        live = docs.filter(~F.col("_deleted")) if has_del else docs
        # lineage-free snapshot of this batch's fingerprints: consumed by
        # the merge write AND the pair join (without it the shingle explode
        # would run twice)
        new_bands = minhash_bands(
            live.select("doc_id", "text"), self.k, self.n_bands
        ).localCheckpoint(eager=False)
        batch = new_bands.select(
            "doc_id", "band", "bkey",
            F.lit(lsn).cast("long").alias("_lsn"),
            F.lit(False).alias("_deleted"),
            F.lit(None).cast("map<string,string>").alias("_extra"),
        )
        if has_del:
            dead = (
                docs.filter(F.col("_deleted"))
                .select("doc_id")
                .crossJoin(
                    self.spark.range(self.n_bands).select(
                        F.col("id").cast("int").alias("band")
                    )
                )
                .select(
                    "doc_id", "band",
                    F.lit(None).cast("string").alias("bkey"),
                    F.lit(lsn).cast("long").alias("_lsn"),
                    F.lit(True).alias("_deleted"),
                    F.lit(None).cast("map<string,string>").alias("_extra"),
                )
            )
            batch = batch.unionByName(dead)
        info = self.lake.merge(batch, batch_id=batch_id, lsn_hwm=lsn)
        self.lake.refresh()
        if info.get("skipped"):
            return None  # replayed batch: pairs were already emitted
        idx = self.bands()
        ok = (
            idx.groupBy("band", "bkey")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= MAX_BAND_DOCS)
            .select("band", "bkey")
        )
        idx_ok = idx.join(ok, ["band", "bkey"])
        return (
            new_bands.select(
                F.col("doc_id").alias("_new_doc"), "band", "bkey"
            )
            .join(idx_ok, ["band", "bkey"])
            .filter(F.col("_new_doc") != F.col("doc_id"))
            .select(
                F.least("_new_doc", "doc_id").alias("doc_a"),
                F.greatest("_new_doc", "doc_id").alias("doc_b"),
            )
            .distinct()
        )

    def rebuild(self, docs: DataFrame, lsn: int, batch_id: int) -> None:
        """Full re-index — the recovery path after a table TRUNCATE (the
        one corpus change ``update`` cannot express row-by-row). One merge
        publishes the new corpus' bands together with a truncate watermark
        at ``lsn - 1``: every older index row dies logically in O(1) (the
        lake's truncate semantics), physical space is reclaimed by normal
        lake maintenance, and the index is exactly the new corpus' bands.
        Idempotent per ``batch_id`` like any lake commit."""
        new_bands = minhash_bands(
            docs.select("doc_id", "text"), self.k, self.n_bands
        )
        batch = new_bands.select(
            "doc_id", "band", "bkey",
            F.lit(lsn).cast("long").alias("_lsn"),
            F.lit(False).alias("_deleted"),
            F.lit(None).cast("map<string,string>").alias("_extra"),
        )
        self.lake.merge(
            batch, batch_id=batch_id, lsn_hwm=lsn, new_truncate_lsn=lsn - 1
        )
        self.lake.refresh()


def q_minhash_incremental(spark, sf_dir):
    """The oracled equivalence instance: the documents table arrives as 3
    deterministic insert-only batches (doc_id % 3) into a fresh index; the
    union of per-batch candidate pairs must equal the one-shot
    full-recompute LSH pairs (``sql_minhash_lsh_pairs`` is the oracle,
    fixture banding — the driver fixture's buckets sit far under the
    occupancy cap, where the equivalence is exact)."""
    import tempfile

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    root = tempfile.mkdtemp(prefix="cdc_mh_index_")
    idx = MinHashIndex(spark, root, k=K_MINHASH, n_bands=BANDS)
    out = None
    for i in range(3):
        pairs = idx.update(
            d.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i),
            lsn=i + 1,
            batch_id=i,
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct().orderBy("doc_a", "doc_b")


def registry() -> dict:
    from .dedupe import sql_minhash_lsh_pairs

    return {
        "minhash_incremental": (
            q_minhash_incremental,
            sql_minhash_lsh_pairs(),
        ),
    }
