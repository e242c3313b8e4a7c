#!/usr/bin/env python
"""Incremental-index growth probe (one-off, NOT the driver bench) — the
round-5 'done' evidence for VERDICT #1: per-batch ``MinHashIndex.update``
cost must stay FLAT while the indexed corpus grows 10x, because every
per-batch job is O(batch + files containing batch keys), never O(index).

Fixed-size batches of NEW documents are applied to one growing index
(with the production maintenance cadence folding the merge-on-read
deltas); each batch records wall seconds and the point-set file-pruning
stats of both lakes. A linear-in-corpus regression would show as
monotonically growing batch_secs; the flat profile plus files_read <<
files_total is the scale evidence.

Prints one JSON line. Env: IDX_BATCH_DOCS (default 20_000), IDX_BATCHES
(10), IDX_COMPACT_EVERY (4), SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    per = int(os.environ.get("IDX_BATCH_DOCS", 20_000))
    n_batches = int(os.environ.get("IDX_BATCHES", 10))
    compact_every = int(os.environ.get("IDX_COMPACT_EVERY", 4))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cdc-spark-index-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_spark.functions.dedupe_index import MinHashIndex

    def docs(batch: int):
        """Deterministic unique pseudo-text (~40 tokens), plus ~2% planted
        exact dups: docs in ODD batches copy the same slot of the previous
        (even) batch — originals never chain, so planted pair volume per
        batch is CONSTANT and any growth in batch time is the index's."""
        rng = spark.range(batch * per, (batch + 1) * per)
        tid = F.when(
            (F.col("id") % 50 == 7) & (((F.col("id") / per) % 2).cast("int") == 1),
            F.col("id") - per,
        ).otherwise(F.col("id"))
        # md5-derived tokens: unrelated docs share essentially no
        # character shingles, so pair volume is the planted dups plus
        # near-zero noise (digit-pattern tokens measurably collided)
        return rng.select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.substring(
                        F.md5(F.concat(tid.cast("string"), F.lit(f"_{j}"))),
                        1,
                        8,
                    )
                    for j in range(40)
                ],
            ).alias("text"),
        )

    work = tempfile.mkdtemp(prefix="cdc_idx_probe_")
    try:
        idx = MinHashIndex(
            spark, os.path.join(work, "idx"),
            corpus_hint=per * n_batches, n_buckets=16,
        )
        for lake in idx.maintenance_lakes():
            lake.append_shards = max(4, cpus // 4)
        # warmup: codegen/JIT on a throwaway index
        w = MinHashIndex(spark, os.path.join(work, "warm"))
        w.update(docs(0).limit(2000), lsn=1, batch_id=0)

        secs, reads, pairs_n = [], [], []
        for i in range(n_batches):
            t0 = time.time()
            pairs = idx.update(docs(i), lsn=i + 1, batch_id=i)
            n = pairs.count()
            secs.append(round(time.time() - t0, 2))
            st = idx.last_update_stats
            reads.append(
                {
                    "doc": [
                        st["doc_lookup"]["files_read"],
                        st["doc_lookup"]["files_total"],
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
        # selectivity spot-check: after a final compaction (many tight
        # range shards), a SMALL batch must touch a strict subset of each
        # lake's files — the 100-TB shape, where batches are tiny relative
        # to the index
        for lake in idx.maintenance_lakes():
            lake.refresh().compact()
        # 3 docs x n_bands probes vs ~n_buckets range shards per lake:
        # few enough probes that untouched shards must exist
        small = docs(n_batches).limit(3)
        t0 = time.time()
        idx.update(small, lsn=n_batches + 1, batch_id=n_batches).count()
        small_sec = round(time.time() - t0, 2)
        sel = {
            "batch_docs": 3,
            "sec": small_sec,
            "doc": [
                idx.last_update_stats["doc_lookup"]["files_read"],
                idx.last_update_stats["doc_lookup"]["files_total"],
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
                    "metric": "index_update_sec_per_batch",
                    "value": round(sum(secs) / len(secs), 2),
                    "unit": "sec",
                    "batch_docs": per,
                    "batches": n_batches,
                    "batch_secs": secs,
                    "pairs": pairs_n,
                    "file_reads": reads,
                    "tail_over_head": round(tail / head, 2)
                    if head
                    else None,
                    "small_batch_selectivity": sel,
                    "corpus_final": per * n_batches,
                    "banding": [idx.k, idx.n_bands],
                    "cpus": cpus,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
