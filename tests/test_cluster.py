"""Connected-components dedup clustering: algorithm vs a union-find
reference on adversarial graph shapes, plus the dedup_clusters API
contract (the query itself is additionally DuckDB-oracled end-to-end in
test_entry_contract)."""

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
