"""Connected-components dedup clustering: algorithm vs a union-find
reference on adversarial graph shapes, plus the dedup_clusters API
contract (the query itself is additionally DuckDB-oracled end-to-end in
test_entry_contract)."""

import os
import random

import pytest
from pyspark.sql import functions as F

from cdc_spark.functions.cluster import (
    connected_components,
    dedup_clusters,
)


def _uf_labels(edges):
    """Reference: union-find min-label components."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def _cc_dict(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    out = connected_components(df)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


CASES = {
    # long path: worst case for naive label propagation (diameter = n);
    # alternating-star must still converge inside the round budget
    "path_120": [(i, i + 1) for i in range(120)],
    # descending path: min at the far end, edges oriented against it
    "path_desc": [(i + 1, i) for i in range(80, 0, -1)],
    "star": [(50, i) for i in range(51, 90)],
    "two_components": [(1, 2), (2, 3), (10, 11), (12, 11)],
    "dups_reversed_selfloops": [(5, 6), (6, 5), (5, 6), (7, 7), (6, 8)],
    "binary_tree": [(i, 2 * i) for i in range(1, 64)]
    + [(i, 2 * i + 1) for i in range(1, 64)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_cc_matches_union_find(spark, name):
    edges = [(a, b) for a, b in CASES[name] if a != b]
    got = _cc_dict(spark, CASES[name])
    assert got == _uf_labels(edges)


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 150
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(40, 160))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _cc_dict(spark, edges)
        assert got == _uf_labels(edges), f"trial {trial}"


def test_cc_empty(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_contract(spark):
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (7, 8)], "doc_a long, doc_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    # every doc present; singletons self-cluster and are canonical
    assert set(rows) == set(range(10))
    assert rows[1] == (1, 1) and rows[3] == (1, 0) and rows[5] == (1, 0)
    assert rows[7] == (7, 1) and rows[8] == (7, 0)
    for d in (0, 2, 4, 6, 9):
        assert rows[d] == (d, 1)
    # exactly one canonical per cluster
    canon = [d for d, (c, k) in rows.items() if k == 1]
    assert len(canon) == len({c for c, _ in rows.values()})


def _partition(rows):
    """cluster rows -> frozenset of frozensets (label-space independent)."""
    by = {}
    for doc, cid in rows:
        by.setdefault(cid, set()).add(doc)
    return frozenset(frozenset(s) for s in by.values())


def test_streaming_clusters_match_oneshot(spark, tmpdir_factory_clean):
    """The composed surface: a CDC insert stream with neardup_index=True,
    then CdcApply.neardup_clusters() — the partition over live docs must
    equal the one-shot dedup_clusters over the final corpus's LSH pairs
    (same insert-only equivalence contract as neardup_stream, extended
    through the clustering), and a delete batch must drop the dead doc
    from the clustering without disturbing the rest."""
    from cdc_spark.apply import CdcApply
    from cdc_spark.config import EngineConfig
    from cdc_spark.functions.dedupe import q_minhash_lsh_pairs

    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    env = d.select(
        (F.col("doc_id") + 1).cast("long").alias("lsn"),
        F.lit("insert").alias("op"),
        F.lit("docs").alias("table"),
        F.col("doc_id").cast("string").alias("repo"),
        F.lit("p").alias("path"),
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.col("text").alias("content"),
        F.lit(None).cast("map<string,string>").alias("extra"),
        F.lit(None).cast("string").alias("schema_change"),
        F.pmod(F.col("doc_id"), F.lit(3)).alias("_b"),
    )
    root = tmpdir_factory_clean("cdc_cluster_stream")
    cfg = EngineConfig(
        lake_root=root,
        checkpoint=os.path.join(root, "_ckpt"),
        n_buckets=4,
        neardup_index=True,
        neardup_corpus_hint=1,
    )
    applier = CdcApply(spark, cfg)
    for i in range(3):
        applier.apply_batch(env.filter(F.col("_b") == i).drop("_b"), i)

    ids = {
        r["doc_id"]: r["_h"]
        for r in d.select(
            "doc_id",
            F.xxhash64(F.col("doc_id").cast("string"), F.lit("p")).alias(
                "_h"
            ),
        ).collect()
    }
    inv = {h: doc for doc, h in ids.items()}

    got_rows = applier.neardup_clusters("docs").collect()
    got = _partition((inv[r["doc_id"]], r["cluster_id"]) for r in got_rows)
    want_rows = dedup_clusters(d, q_minhash_lsh_pairs(spark, sf_dir)).collect()
    want = _partition((r["doc_id"], r["cluster_id"]) for r in want_rows)
    assert got == want
    assert sum(r["is_canonical"] for r in got_rows) == len(got)

    # delete one doc that participates in a pair; it must vanish from the
    # clustering and everything else must stay partitioned identically
    victim = next(
        doc
        for doc, cid in (
            (r["doc_id"], r["cluster_id"]) for r in want_rows
        )
        if doc != cid  # non-canonical member of a real cluster
    )
    dele = spark.createDataFrame(
        [(2000, "delete", "docs", str(victim), "p")],
        "lsn long, op string, table string, repo string, path string",
    ).select(
        "lsn", "op", "table", "repo", "path",
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("content"),
        F.lit(None).cast("map<string,string>").alias("extra"),
        F.lit(None).cast("string").alias("schema_change"),
    )
    applier.apply_batch(dele, 3)
    after_rows = applier.neardup_clusters("docs").collect()
    after_docs = {inv[r["doc_id"]] for r in after_rows}
    assert victim not in after_docs and len(after_rows) == len(got_rows) - 1
    after = _partition((inv[r["doc_id"]], r["cluster_id"]) for r in after_rows)
    want_after = _partition(
        (doc, cid)
        for doc, cid in (
            (r["doc_id"], r["cluster_id"])
            for r in dedup_clusters(
                d.filter(F.col("doc_id") != victim),
                q_minhash_lsh_pairs(spark, sf_dir)
                .filter(F.col("doc_a") != victim)
                .filter(F.col("doc_b") != victim),
            ).collect()
        )
    )
    assert after == want_after


def test_cluster_canonical_keeps_highest_quality(spark):
    """Survivor election: the canonical member is the cluster's
    highest-quality_x1e3 doc (NOT the min id), ties break to the smaller
    doc_id, and exactly one member per cluster has keep=1."""
    from cdc_spark.functions.cluster import cluster_canonical, quality_int

    # doc 2 is long fluent prose (high quality), doc 0/1 are stubs in the
    # same cluster; docs 5 and 6 are identical text (quality tie)
    rich = "the quick brown fox jumps over the lazy dog and runs on " * 6
    rows = [
        (0, "tiny"),
        (1, "also tiny"),
        (2, rich),
        (5, "same text here of the and"),
        (6, "same text here of the and"),
        (9, "a lonely singleton document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r
        for r in cluster_canonical(docs, pairs).collect()
    }
    q = {
        r["doc_id"]: r["quality_x1e3"]
        for r in quality_int(docs).select("doc_id", "quality_x1e3").collect()
    }
    assert q[2] > q[0] and q[2] > q[1]
    # cluster {0,1,2}: canonical is the high-quality doc 2, not min-id 0
    for d in (0, 1, 2):
        assert got[d]["canonical_id"] == 2
        assert got[d]["keep"] == (1 if d == 2 else 0)
    # quality tie in {5,6}: smaller doc_id wins
    assert q[5] == q[6]
    assert got[5]["canonical_id"] == 5 and got[5]["keep"] == 1
    assert got[6]["canonical_id"] == 5 and got[6]["keep"] == 0
    # singleton keeps itself
    assert got[9]["canonical_id"] == 9 and got[9]["keep"] == 1
    # exactly one keep per cluster
    by_cluster = {}
    for r in got.values():
        by_cluster.setdefault(r["cluster_id"], []).append(r["keep"])
    assert all(sum(ks) == 1 for ks in by_cluster.values())


def test_leakage_safe_split_never_splits_a_cluster(spark):
    """The invariant the operator exists for: every member of a near-dup
    cluster lands in the SAME split, and over many singleton clusters the
    bucket arithmetic realizes all three splits."""
    from cdc_spark.functions.cluster import (
        dedup_clusters,
        leakage_safe_split,
    )

    n = 3000
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    # chain pairs inside blocks of 3: clusters {0,1,2}, {3,4,5}, ...
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, n - 2, 3)]
        + [(i + 1, i + 2) for i in range(0, n - 2, 3)],
        "doc_a long, doc_b long",
    )
    out = leakage_safe_split(dedup_clusters(docs, pairs))
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .agg(F.max("n_splits").alias("mx"))
        .head()["mx"]
    )
    assert per_cluster == 1
    frac = {
        r["split"]: r["c"]
        for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert set(frac) == {"train", "validation", "test"}
    assert frac["train"] > frac["validation"] > frac["test"] > 0
