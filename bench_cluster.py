"""Scale probe for the alternating-star connected-components operator:
per-shape edge graphs at growing sizes, measuring wall seconds and rounds
to convergence. The claims under test, at 10x edge growth:

- rounds grow (at most) logarithmically — including on the adversarial
  long-chain graph whose DIAMETER grows 10x (naive label propagation
  would need diameter rounds);
- wall time grows ~linearly with edge count (every round is a constant
  number of key-partitioned jobs over the current edge set).

Graphs are synthesized deterministically with spark.range + xxhash64 —
no driver-side edge lists.

    SPARK_GRAFT_CPUS=32 python bench_cluster.py

Prints one JSON line per (shape, size).
"""

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_spark.functions import cluster as C  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SIZES = [int(s) for s in os.environ.get("CC_SIZES", "100000,1000000").split(",")]


def graph(spark, shape: str, n: int):
    """n-edge graph of the given shape, deterministic."""
    ids = spark.range(n)
    if shape == "chain":
        # one path of length n: worst-case diameter
        return ids.select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
    if shape == "neardup":
        # realistic dedup graph: ~20% of nodes pair into small clusters
        # (avg 5 members) spread over a 2n-doc id space, 80% isolated
        e = ids.select(
            (F.col("id") * 2).alias("doc_a"),
            ((F.col("id") - F.pmod(F.col("id"), F.lit(5))) * 2).alias(
                "doc_b"
            ),
        ).filter(F.pmod(F.xxhash64("doc_a"), F.lit(100)) < 20)
        return e.filter(F.col("doc_a") != F.col("doc_b"))
    if shape == "attach":
        # random-attachment graph: node i links to a uniform earlier node
        # — few giant components with high-degree hubs (skew stress)
        return ids.filter(F.col("id") > 0).select(
            F.col("id").alias("doc_a"),
            F.pmod(F.xxhash64("id"), F.col("id")).alias("doc_b"),
        )
    raise ValueError(shape)


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-cluster")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for shape in ("neardup", "chain", "attach"):
        for n in SIZES:
            g = graph(spark, shape, n)
            t0 = time.time()
            out = C.connected_components(g)
            n_docs = out.count()
            n_clusters = out.select("cluster_id").distinct().count()
            dt = time.time() - t0
            print(
                json.dumps(
                    {
                        "shape": shape,
                        "edges": C.LAST_CC_STATS.get("input_edges"),
                        "rounds": C.LAST_CC_STATS.get("rounds"),
                        "docs": n_docs,
                        "clusters": n_clusters,
                        "sec": round(dt, 2),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
