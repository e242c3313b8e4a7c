#!/usr/bin/env python
"""Benchmark harness: headline CDC ingest throughput + representative
queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline is the end-to-end WAL-tail -> lake-commit replay (generate a
change log scaled to sf, apply it in batches through the full dedup + merge
pipeline, including commit protocol), reported both as total seconds and
events/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession

    # 16g heap: an oversized heap page-faults its way through first touch and
    # stalls 32-thread runs; shuffle on tmpfs removes disk-seek noise
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cdc-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark_local", exist_ok=True)
        builder = builder.config("spark.local.dir", "/dev/shm/spark_local")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_spark.config import EngineConfig
    from cdc_spark.loggen import change_log
    from cdc_spark.queries import registry
    from cdc_spark.stream import replay_batches

    timings: dict[str, float] = {}

    # ---- headline: end-to-end CDC ingest (events -> lake commits)
    n_events = max(200_000, int(sf * 40_000_000))
    n_batches = 2
    work = tempfile.mkdtemp(prefix="cdc_bench_")
    try:
        cfg = EngineConfig(
            lake_root=os.path.join(work, "lake"),
            checkpoint=os.path.join(work, "ckpt"),
            n_buckets=max(cpus, 16),
            shuffle_partitions=cpus,
        )
        per = n_events // n_batches
        batches = [
            change_log(
                spark,
                per,
                n_repos=2000,
                n_paths=200,
                delete_rate=0.05,
                dup_rate=0.01,
                start_lsn=1 + i * per,
                seed=42,
            )
            for i in range(n_batches)
        ]
        # full-size JIT/codegen warmup batch, untimed (sustained throughput
        # is the metric; first-batch compilation isn't)
        warm_cfg = EngineConfig(
            lake_root=os.path.join(work, "wl"),
            checkpoint=os.path.join(work, "wc"),
            n_buckets=cfg.n_buckets,
        )
        replay_batches(spark, [batches[0]], warm_cfg)
        t0 = time.time()
        replay_batches(spark, batches, cfg)
        ingest_sec = time.time() - t0
        timings["ingest"] = round(ingest_sec, 3)
        events_per_sec = n_events / ingest_sec
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # ---- representative operator queries at the sf dir
    reg = registry()
    for name in (
        "cdc_materialize",
        "lww_dedup",
        "minhash_lsh_pairs",
        "simhash",
        "ngram_jaccard_pairs",
        "cosine_topk",
        "token_count",
        "content_sha256",
    ):
        fn = reg[name][0]
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "cdc_e2e_plus_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "ingest_events": n_events,
                "ingest_events_per_sec": round(events_per_sec, 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
