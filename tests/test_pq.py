"""Product-quantization semantics: codes are deterministic and complete,
and ADC top-k actually approximates exact L2 search (recall) — the
cross-engine value equality itself is covered by the entry contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_spark.functions.pq import (
    PQ_KSUB,
    PQ_M,
    PQ_TOP_K,
    pq_adc_topk,
    pq_codes,
)
from cdc_spark.functions.similarity import EMB_DIM, N_QUERIES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def vecs(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


def test_codes_complete_and_deterministic(spark, vecs):
    n = vecs.count()
    codes, books = pq_codes(vecs, n)
    pdf = codes.toPandas()
    # every vector gets exactly one code per subspace, all in range
    assert len(pdf) == n * PQ_M
    assert set(pdf["sub"]) == set(range(PQ_M))
    assert pdf["code"].between(0, PQ_KSUB - 1).all()
    assert pdf.groupby("vec_id")["sub"].nunique().eq(PQ_M).all()
    # codebooks: one centroid per (sub, code), subvector-width arrays
    bdf = books.toPandas()
    assert bdf.groupby(["sub", "code"]).size().eq(1).all()
    assert bdf["cv"].map(len).eq(EMB_DIM // PQ_M).all()
    # re-run is bit-identical (deterministic Lloyd)
    again, _ = pq_codes(vecs, n)
    a = pdf.sort_values(["vec_id", "sub"]).reset_index(drop=True)
    b = again.toPandas().sort_values(["vec_id", "sub"]).reset_index(drop=True)
    assert (a["code"].to_numpy() == b["code"].to_numpy()).all()


def test_adc_topk_recall_vs_exact_l2(spark, vecs):
    """ADC over the shipped (PQ_M=16, PQ_KSUB=64) codes must place most of the exact-L2
    top-k in its own top-k on the fixture — the measured evidence that the
    compressed index is a usable ANN, not just a hash-matched artifact."""
    n = vecs.count()
    rows = vecs.collect()
    by_id = {r["vec_id"]: np.array(r["v"]) for r in rows}
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    got = pq_adc_topk(vecs, q, n).toPandas()
    recalls = []
    for qid in range(N_QUERIES):
        qv = by_id[qid]
        exact = sorted(
            ((np.sum((qv - v) ** 2), cid) for cid, v in by_id.items()
             if cid != qid)
        )[:PQ_TOP_K]
        exact_ids = {cid for _, cid in exact}
        approx_ids = set(got[got.query_id == qid]["cand_id"])
        recalls.append(len(exact_ids & approx_ids) / PQ_TOP_K)
    assert np.mean(recalls) >= 0.5, recalls
    # ranks are 1..k and adc is non-decreasing within a query
    for qid, g in got.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, PQ_TOP_K + 1))
        assert g["adc_x1e6"].is_monotonic_increasing


def test_refine_topk_recovers_exact_neighbors(spark, vecs):
    """The two-stage search (ADC shortlist -> exact re-rank) must recover
    most of the exact top-k the pure-ADC stage misses."""
    from cdc_spark.functions.pq import pq_refine_topk

    n = vecs.count()
    rows = vecs.collect()
    by_id = {r["vec_id"]: np.array(r["v"]) for r in rows}
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    got = pq_refine_topk(vecs, q, n).toPandas()
    recalls = []
    for qid in range(N_QUERIES):
        qv = by_id[qid]
        exact = sorted(
            ((float(np.sum((qv - v) ** 2)), cid) for cid, v in by_id.items()
             if cid != qid)
        )[:PQ_TOP_K]
        approx_ids = set(got[got.query_id == qid]["cand_id"])
        recalls.append(len({c for _, c in exact} & approx_ids) / PQ_TOP_K)
    assert np.mean(recalls) >= 0.85, recalls


def test_codebooks_survive_the_sampling_regime(spark):
    """Above the training-sample cap, seeds must come from the SAMPLE
    (seeding by `vec_id < ksub` would filter most seeds away and collapse
    the codebooks — the round-5 review finding). Probe with a tiny cap via
    small (m, ksub) on a corpus far above it."""
    from cdc_spark.functions.pq import pq_codebooks
    from cdc_spark.functions.similarity import IVF_TRAIN_PER_CENT

    m, ksub, dim = 2, 4, 8
    n = IVF_TRAIN_PER_CENT * ksub * m * 20  # 20x over the sampling cap
    vecs = spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {dim}), "
        "i -> CAST(pmod(xxhash64(id, i), 997) AS DOUBLE) / 997.0) AS v",
    )
    books = pq_codebooks(vecs, n, m=m, ksub=ksub, dim=dim).toPandas()
    # every subspace keeps (close to) ksub live codes — Lloyd may drop an
    # empty cluster, but a collapsed seeding would leave ~0-1
    per_sub = books.groupby("sub").size()
    assert set(per_sub.index) == set(range(m))
    assert (per_sub >= ksub - 1).all(), per_sub


def test_adc_topk_accepts_prebuilt_index(spark, vecs):
    """`index=` must reuse stored codes/books (the production search
    shape) and produce exactly the in-line result."""
    from cdc_spark.functions.pq import pq_codes

    n = vecs.count()
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    inline = pq_adc_topk(vecs, q, n).toPandas()
    stored = pq_codes(vecs, n)
    reused = pq_adc_topk(vecs, q, n, index=stored).toPandas()
    cols = ["query_id", "rank"]
    a = inline.sort_values(cols).reset_index(drop=True)
    b = reused.sort_values(cols).reset_index(drop=True)
    assert (a["cand_id"].to_numpy() == b["cand_id"].to_numpy()).all()
    assert (a["adc_x1e6"].to_numpy() == b["adc_x1e6"].to_numpy()).all()


def test_ivfpq_topk_probes_beat_random_and_respect_probe_budget(spark, vecs):
    """IVFPQ scans only nprobe/nlist of the codes yet must stay close to
    the full-scan PQ recall — the evidence the residual composition works
    (fixture: 0.54 at 2/16 cells probed vs 0.60 full-scan ADC)."""
    from cdc_spark.functions.pq import IVFPQ_NPROBE, ivfpq_topk
    from cdc_spark.functions.similarity import N_CENTROIDS

    n = vecs.count()
    rows = vecs.collect()
    by_id = {r["vec_id"]: np.array(r["v"]) for r in rows}
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    got = ivfpq_topk(vecs, q, n).toPandas()
    recalls = []
    for qid in range(N_QUERIES):
        qv = by_id[qid]
        exact = sorted(
            ((float(np.sum((qv - v) ** 2)), cid) for cid, v in by_id.items()
             if cid != qid)
        )[:PQ_TOP_K]
        approx_ids = set(got[got.query_id == qid]["cand_id"])
        recalls.append(len({c for _, c in exact} & approx_ids) / PQ_TOP_K)
    # scanning nprobe/nlist of the corpus: far above random (10/500), in
    # reach of the full-scan ADC's 0.60
    assert IVFPQ_NPROBE / N_CENTROIDS <= 0.25
    assert np.mean(recalls) >= 0.4, recalls
    for qid, g in got.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, PQ_TOP_K + 1))
        assert g["adc_x1e6"].is_monotonic_increasing
