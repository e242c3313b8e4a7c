"""Round-4 VERDICT items 1-2: the LSH/IVF sizing rules are the DEFAULTS
(derived from a corpus count), not knobs — and the IVF quantizer scales
via deterministic sampled training + a two-level (coarse -> sub) tree.

The rules must (a) reproduce the oracle-pinned fixture configs inside the
driver's correctness regime (so hash-exactness is untouched), (b) hit the
measured scale configs beyond it, and (c) give results identical to the
explicit-parameter calls they replace."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_spark.functions.dedupe import (
    AUTOSIZE_BASE,
    BANDS,
    K_MINHASH,
    corpus_size,
    minhash_autosize,
    q_minhash_lsh_pairs,
)
from cdc_spark.functions.similarity import (
    EMB_BAND_BITS,
    IVF_MAX_NLIST,
    IVF_TRAIN_PER_CENT,
    IVF_TWO_LEVEL_MIN,
    N_CENTROIDS,
    N_PROBE,
    N_QUERIES,
    _train_sample,
    emb_autosize_bits,
    ivf_autoprobe,
    ivf_autosize,
    ivf_centroids_two_level,
    ivf_index,
    ivf_search,
    q_embedding_neardup_pairs,
)

SF001 = "/root/testdata/sf0.001"


# ------------------------------------------------------------- the rules
def test_minhash_rule_regimes():
    # fixture regime == the oracle-pinned config (driver runs at sf0.01)
    for n in (1, 500, AUTOSIZE_BASE):
        assert minhash_autosize(n) == (K_MINHASH, BANDS, K_MINHASH // BANDS)
    # the measured scale config (BENCH.md: 444x candidate cut, recall 1.0)
    assert minhash_autosize(50_000) == (24, 3, 8)
    assert minhash_autosize(500_000) == (36, 3, 12)
    # r grows with log10(n): collision odds per pair keep tracking ~1/n
    for n in (5_001, 49_999, 50_001, 5_000_000, 10**9):
        k, b, r = minhash_autosize(n)
        assert k == b * r
        s_star = (1 / b) ** (1 / r)
        assert 0.7 < s_star < 0.97


def test_emb_bits_rule():
    assert emb_autosize_bits(500) == EMB_BAND_BITS  # oracle-pinned fixture
    assert emb_autosize_bits(50_000) == 15
    assert emb_autosize_bits(1) == 4  # floor
    assert emb_autosize_bits(10**12) == 24  # ceiling


def test_ivf_rule():
    assert ivf_autosize(500) == N_CENTROIDS
    assert ivf_autosize(5_000) == N_CENTROIDS  # sf0.1 stays flat/comparable
    assert ivf_autosize(50_000) == 224  # ~sqrt(n)
    assert ivf_autosize(10**9) == IVF_MAX_NLIST  # broadcastable cap
    assert ivf_autoprobe(N_CENTROIDS) == N_PROBE  # fixture unchanged
    assert ivf_autoprobe(224) == math.ceil(224 / 8)


# ------------------------------------- auto == explicit on a real corpus
def test_minhash_auto_equals_explicit_fixture(spark):
    n = corpus_size(spark, SF001)
    assert n <= AUTOSIZE_BASE  # this corpus is in the fixture regime
    auto = q_minhash_lsh_pairs(spark, SF001).collect()
    explicit = q_minhash_lsh_pairs(
        spark, SF001, k=K_MINHASH, n_bands=BANDS
    ).collect()
    assert auto == explicit and len(auto) > 0


def test_embedding_auto_equals_explicit_fixture(spark):
    bits = emb_autosize_bits(corpus_size(spark, SF001, table="embeddings"))
    auto = q_embedding_neardup_pairs(spark, SF001).collect()
    explicit = q_embedding_neardup_pairs(spark, SF001, bits=bits).collect()
    assert auto == explicit


# ----------------------------------------------------- two-level IVF tree
DIM = 16
N_VECS = 2_000
N_CLUSTERS = 40


def _clustered(spark):
    """Deterministic clustered vectors: cluster centers on sha-derived
    corners, members = center + small per-vector perturbation."""
    import hashlib

    rows = []
    for i in range(N_VECS):
        c = i % N_CLUSTERS
        v = []
        for d in range(DIM):
            base = 1.0 if hashlib.sha256(f"{c}:{d}".encode()).digest()[0] & 1 else -1.0
            jig = (hashlib.sha256(f"{i}:{d}".encode()).digest()[1] % 100) / 1000.0
            v.append(base + jig)
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id BIGINT, v ARRAY<DOUBLE>")


def test_train_sample_deterministic_and_bounded(spark):
    e = _clustered(spark)
    t1 = _train_sample(e, N_VECS, nlist=100)
    t2 = _train_sample(e, N_VECS, nlist=100)
    ids1 = sorted(r["vec_id"] for r in t1.select("vec_id").collect())
    assert ids1 == sorted(r["vec_id"] for r in t2.select("vec_id").collect())
    # ~cap +/- hash noise; strictly smaller than the corpus
    cap = IVF_TRAIN_PER_CENT * 100
    assert 0 < len(ids1) <= max(cap, N_VECS)
    # below the cap the sample IS the corpus (fixture regime untouched)
    assert _train_sample(e, 500, nlist=N_CENTROIDS) is e


def test_two_level_quantizer_shape(spark):
    e = _clustered(spark)
    nlist = 100
    coarse, subs, nsub = ivf_centroids_two_level(
        e, N_VECS, nlist, dim=DIM
    )
    ncoarse = math.ceil(math.sqrt(nlist))
    assert nsub == math.ceil(nlist / ncoarse)
    assert coarse.count() <= ncoarse
    assert subs.count() <= ncoarse * nsub
    # global cell ids are unique
    cents, assign = ivf_index(e, nlist, N_VECS, dim=DIM)
    cvals = [r["cent_id"] for r in cents.select("cent_id").collect()]
    assert len(cvals) == len(set(cvals))
    # every vector lands in exactly one existing cell
    a = assign.collect()
    assert len(a) == N_VECS
    assert {r["cell"] for r in a} <= set(cvals)


def test_two_level_search_recall_vs_exact(spark):
    """The tree is approximate; on clustered vectors its recall@5 against
    exact brute-force must stay high with the auto probe count."""
    e = _clustered(spark)
    nlist = 100
    assert nlist > IVF_TWO_LEVEL_MIN  # exercises the two-level path
    res = ivf_search(e, nlist, N_VECS, dim=DIM).collect()
    per_q = {}
    for r in res:
        per_q.setdefault(r["query_id"], []).append(r["cand_id"])
    assert set(per_q) == set(range(N_QUERIES))
    # exact oracle in numpy
    rows = sorted(
        ((r["vec_id"], r["v"]) for r in e.collect()), key=lambda t: t[0]
    )
    m = np.array([v for _, v in rows])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn[: N_QUERIES] @ mn.T
    hits = tot = 0
    for q in range(N_QUERIES):
        s = sims[q].copy()
        s[q] = -np.inf
        exact5 = set(np.argsort(-s)[:5].tolist())
        hits += len(exact5 & set(per_q[q]))
        tot += 5
    assert hits / tot >= 0.8


def test_flat_path_untouched_in_fixture_regime(spark):
    """nlist <= IVF_TWO_LEVEL_MIN routes through the round-3 flat Lloyd
    quantizer — the exact plan the DuckDB oracle mirrors."""
    e = _clustered(spark)
    cents, assign = ivf_index(e, N_CENTROIDS, N_VECS, dim=DIM)
    assert cents.count() <= N_CENTROIDS
    assert assign.count() == N_VECS
