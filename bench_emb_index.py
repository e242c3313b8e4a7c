#!/usr/bin/env python
"""Incremental EMBEDDING-index growth probe (one-off, NOT the driver
bench) — the vector-modality mirror of bench_index.py: per-batch
``EmbIndex.update`` cost must stay FLAT while the indexed corpus grows
10x, because every per-batch job (signing, old-vector lookup, both MOR
deltas, candidate join, cosine confirm) is O(batch + files containing
batch keys), never O(index).

Fixed-size batches of NEW vectors are applied to one growing index (with
the production maintenance cadence folding the merge-on-read deltas);
each batch records wall seconds and the point-set file-pruning stats.
~2% planted near-dups per ODD batch (a copy of the previous batch's slot
with a small nudge) keep confirmed-pair volume constant per batch, so any
time growth is the index's.

Prints one JSON line. Env: EIDX_BATCH_VECS (default 20_000), EIDX_BATCHES
(10), EIDX_COMPACT_EVERY (4), EIDX_DIM (64 = the production EMB_DIM;
lower dims inflate noise pairs — sign-agreeing random vectors correlate
hard in few dimensions), SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    per = int(os.environ.get("EIDX_BATCH_VECS", 20_000))
    n_batches = int(os.environ.get("EIDX_BATCHES", 10))
    compact_every = int(os.environ.get("EIDX_COMPACT_EVERY", 4))
    dim = int(os.environ.get("EIDX_DIM", 64))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cdc-spark-emb-index-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_spark.functions.emb_index import EmbIndex

    def vecs(batch: int):
        """Deterministic pseudo-random unit-free vectors: coordinate d of
        doc i = (xxhash64(i, d) % 2001 - 1000)/1000. ODD batches plant a
        ~2% near-dup of the previous batch's slot (same direction, one
        coordinate nudged) — originals never chain, so confirmed-pair
        volume per batch is constant."""
        rng = spark.range(batch * per, (batch + 1) * per)
        planted = (F.col("id") % 50 == 7) & (
            ((F.col("id") / per) % 2).cast("int") == 1
        )
        src = F.when(planted, F.col("id") - per).otherwise(F.col("id"))
        coords = [
            (
                F.pmod(
                    F.xxhash64(src.cast("string"), F.lit(f"d{d}")),
                    F.lit(2001),
                ).cast("double")
                - 1000.0
            )
            / 1000.0
            for d in range(dim)
        ]
        # nudge the first coordinate of planted copies so they are
        # near-dups, not exact dups
        coords[0] = coords[0] + F.when(planted, F.lit(0.013)).otherwise(
            F.lit(0.0)
        )
        return rng.select(
            F.col("id").alias("doc_id"), F.array(*coords).alias("embedding")
        )

    work = tempfile.mkdtemp(prefix="cdc_eidx_probe_")
    try:
        idx = EmbIndex(
            spark, os.path.join(work, "idx"),
            dim=dim, corpus_hint=per * n_batches, n_buckets=16,
        )
        for lake in idx.maintenance_lakes():
            lake.append_shards = max(4, cpus // 4)
        w = EmbIndex(spark, os.path.join(work, "warm"), dim=dim)
        w.update(vecs(0).limit(2000), lsn=1, batch_id=0)

        secs, reads, pairs_n = [], [], []
        for i in range(n_batches):
            t0 = time.time()
            pairs = idx.update(vecs(i), lsn=i + 1, batch_id=i)
            n = pairs.count()
            secs.append(round(time.time() - t0, 2))
            st = idx.last_update_stats
            reads.append(
                {
                    "vec": [
                        st["vector_lookup"]["files_read"],
                        st["vector_lookup"]["files_total"],
                    ],
                    "post": [
                        st["postings_lookup"]["files_read"],
                        st["postings_lookup"]["files_total"],
                    ],
                }
            )
            pairs_n.append(n)
            if compact_every and (i + 1) % compact_every == 0:
                for lake in idx.maintenance_lakes():
                    lake.refresh().compact()
                    lake.expire_snapshots(keep_last=2)
        for lake in idx.maintenance_lakes():
            lake.refresh().compact()
        small = vecs(n_batches).limit(3)
        t0 = time.time()
        idx.update(small, lsn=n_batches + 1, batch_id=n_batches).count()
        small_sec = round(time.time() - t0, 2)
        sel = {
            "batch_vecs": 3,
            "sec": small_sec,
            "vec": [
                idx.last_update_stats["vector_lookup"]["files_read"],
                idx.last_update_stats["vector_lookup"]["files_total"],
            ],
            "post": [
                idx.last_update_stats["postings_lookup"]["files_read"],
                idx.last_update_stats["postings_lookup"]["files_total"],
            ],
        }
        head_s, tail_s = secs[1:4] or secs[:1], secs[-3:]
        head = sum(head_s) / len(head_s)
        tail = sum(tail_s) / len(tail_s)
        print(
            json.dumps(
                {
                    "metric": "emb_index_update_sec_per_batch",
                    "value": round(sum(secs) / len(secs), 2),
                    "unit": "sec",
                    "batch_vecs": per,
                    "batches": n_batches,
                    "dim": dim,
                    "batch_secs": secs,
                    "pairs": pairs_n,
                    "file_reads": reads,
                    "tail_over_head": round(tail / head, 2) if head else None,
                    "small_batch_selectivity": sel,
                    "corpus_final": per * n_batches,
                    "banding": [idx.bits, idx.n_bands],
                    "cpus": cpus,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
