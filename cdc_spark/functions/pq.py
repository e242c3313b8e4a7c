"""Product quantization (PQ) ANN: compressed codes + asymmetric-distance
top-k — the memory-bound complement to the IVF path.

At 100 TB the raw vectors (n x dim doubles) dominate storage and scan
cost; PQ (Jegou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) replaces each vector with ``m`` small codes — one
per dim/m-wide subspace, each quantized against its own ``ksub``-centroid
codebook — so the search-time candidate table is n x m BYTES-scale
integers and the full vectors are only ever touched by the one encode
pass. Search scores a query against candidates ASYMMETRICALLY (ADC): the
exact query subvector against each candidate's subspace centroid, via a
per-query lookup table of m x ksub distances.

Spark-first shape (every step mirrors the IVF discipline in
``similarity.py``):

- ALL subspaces train in ONE Lloyd chain: the corpus explodes into
  (vec_id, sub, sv) subvector rows once, and assign/update are a single
  broadcast-join + partial-aggregated groupBy keyed (sub, code) — m
  codebooks for the price of one plan, no per-subspace driver loop over
  data-sized frames.
- Codebook means are computed EXACTLY (floor-scaled BIGINT sums,
  floor-division) and distances ranked on rounded/integerized values, so
  codes and ranks are bit-reproducible across engines and partitionings
  (the ``_ivf_update`` / integer-space discipline).
- ADC search is a broadcast of the per-query LUT (q x m x ksub rows —
  KB-scale) against the codes table, one partial-aggregated sum per
  (query, candidate): the codes table never shuffles its payload, and no
  per-query window exists (two-phase salted rank).
- Training runs on the same deterministic hash sample rule as IVF
  (``_train_sample``); the oracled fixture sits below the cap, where
  sample == corpus and the DuckDB mirror (Lloyd unrolled, one UNION-free
  subspace frame via ``unnest(range(m))``) is exact.

Production sizing note: real deployments use ksub=256 (byte codes) and
m=dim/4..dim/8; the fixture pins (m=8, ksub=16) so the oracle's unrolled
SQL stays tractable — the PLAN is identical at any (m, ksub), only the
broadcast LUT grows (256 x m doubles per query, still KB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .similarity import (
    _CSCALE,
    _train_sample,
    EMB_DIM,
    IVF_LLOYD_ITERS,
    N_QUERIES,
    _topk_two_phase,
)

#: subspace count (fixture: 16 subspaces x 4 dims over EMB_DIM=64).
#: Measured on the fixture corpus: recall@10 vs exact L2 is 0.41 at m=8
#: and 0.60 at m=16 (ksub=64) — narrower subspaces lose less cross-dim
#: correlation. The oracle's per-iteration update CTE shrinks with dsub.
PQ_M = 16
#: codes per subspace codebook (fixture; production uses 256 = byte codes).
#: 64 (not 16) because the fixture embeddings form ~16 strong clusters —
#: at ksub=16 each subspace codebook collapses a whole cluster to one
#: centroid and ADC cannot rank WITHIN a cluster (measured recall@10
#: 0.35); 64 sub-centroids resolve intra-cluster structure (128 adds only
#: +0.04). The oracle's unrolled SQL is unaffected by ksub (only the seed
#: predicate changes). Production systems additionally refine: exact-score
#: the ADC top-k' (k' ~ 4k) from the raw vectors — a per-query k'-row
#: point lookup, cheap at any scale.
PQ_KSUB = 64
#: ADC results per query
PQ_TOP_K = 10
#: LUT distances are floored into integer micro-units so the per-candidate
#: ADC sum is a BIGINT — float addition order never decides a rank.
_DSCALE = 1_000_000


def _l2(a, b):
    """Squared L2 distance between two equal-length array columns (left
    fold, same accumulation order as the DuckDB mirror)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subvectors(e, m: int, dsub: int, keys=("vec_id",)):
    """(keys..., v) -> (keys..., sub, sv): one row per subspace, sliced
    JVM-side. The explode multiplies row COUNT by m but total floats are
    unchanged (each dimension appears once). ``keys`` are passed through
    (e.g. ("query_id", "cell") for the ivfpq query-side LUT)."""
    subs = F.array(*[
        F.struct(
            F.lit(s).cast("bigint").alias("sub"),
            F.slice("v", s * dsub + 1, dsub).alias("sv"),
        )
        for s in range(m)
    ])
    return e.select(*keys, F.explode(subs).alias("x")).select(
        *keys, F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv")
    )


def _pq_assign(sub, books, sim_round: int = 6):
    """Nearest codebook entry per (vec_id, sub) — value-identical to the
    canonical broadcast-join x ksub explode + ``round(_l2, 6)`` +
    ``min_by(code, struct(d, code))``, computed as an Arrow-batched NumPy
    kernel (guide §4.2: the per-candidate ``_l2`` fold is an interpreted
    lambda, and the join multiplies every subvector row ksub times).

    Exactness: distances accumulate in the canonical left-fold order
    ((x-y)*(x-y) then add, no FMA), so raw doubles match the JVM's bit
    for bit. The rounded comparison is reproduced without rounding
    everything: the rounded-min winner must lie within 1e-6 of the raw
    min (round(.,6) moves a value by at most 5e-7 and is monotone), so
    only candidates inside that window are decided by exact decimal
    HALF_UP rounding — ``Decimal(repr(x))`` uses the same
    shortest-decimal representation as the JVM's
    ``BigDecimal.valueOf(double)``, so the tie rule is identical. The
    winner's rounded distance is emitted so the (pass-through for unique
    vec_ids) min_by aggregate keeps merging duplicate vec_id rows exactly
    as before. The codebooks are an m x ksub control-plane read — the
    same rows the broadcast shipped."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    import numpy as np

    brows = books.collect()
    by_sub: dict = {}
    for r in brows:
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["code"]), list(r["cv"]))
        )
    bk = {
        s: (
            np.array([c for c, _ in sorted(entries)], dtype=np.int64),
            np.array([cv for _, cv in sorted(entries)], dtype=np.float64),
        )
        for s, entries in by_sub.items()
    }
    id_t = sub.schema["vec_id"].dataType
    sub_t = sub.schema["sub"].dataType
    out_schema = StructType(
        [
            StructField("vec_id", id_t, True),
            StructField("sub", sub_t, True),
            StructField("code", LongType(), True),
            StructField("d", DoubleType(), True),
        ]
    )

    def gen(batches):
        from decimal import ROUND_HALF_UP, Decimal

        import pyarrow as pa

        quant = Decimal(1).scaleb(-sim_round)

        def dec_round(x: float) -> float:
            return float(
                Decimal(repr(x)).quantize(quant, rounding=ROUND_HALF_UP)
            )

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            vid = rb.column(0)
            subs = rb.column(1).to_numpy(zero_copy_only=False)
            sv = rb.column(2).flatten().to_numpy(zero_copy_only=False)
            dsub = sv.size // n
            SV = sv.reshape(n, dsub)
            code_out = np.zeros(n, dtype=np.int64)
            d_out = np.zeros(n, dtype=np.float64)
            for s in np.unique(subs):
                rows = np.nonzero(subs == s)[0]
                codes, CV = bk[int(s)]
                S = SV[rows]
                D = np.zeros((rows.size, codes.size), dtype=np.float64)
                for j in range(codes.size):
                    acc = np.zeros(rows.size, dtype=np.float64)
                    cvj = CV[j]
                    for t in range(dsub):
                        diff = S[:, t] - cvj[t]
                        acc = acc + diff * diff
                    D[:, j] = acc
                dmin = D.min(axis=1)
                cand = D <= (dmin + 2e-6)[:, None]
                ncand = cand.sum(axis=1)
                easy = ncand == 1
                ei = np.argmax(cand, axis=1)  # the single candidate
                code_out[rows[easy]] = codes[ei[easy]]
                for ri in np.nonzero(easy)[0]:
                    d_out[rows[ri]] = dec_round(float(D[ri, ei[ri]]))
                for ri in np.nonzero(~easy)[0]:
                    cs = np.nonzero(cand[ri])[0]
                    best = min(
                        (Decimal(repr(float(D[ri, j]))).quantize(
                            quant, rounding=ROUND_HALF_UP
                        ), int(codes[j]))
                        for j in cs
                    )
                    code_out[rows[ri]] = best[1]
                    d_out[rows[ri]] = float(best[0])
            yield pa.RecordBatch.from_arrays(
                [
                    vid,
                    rb.column(1),
                    pa.array(code_out),
                    pa.array(d_out),
                ],
                names=["vec_id", "sub", "code", "d"],
            )

    per_row = sub.select("vec_id", "sub", "sv").mapInArrow(gen, out_schema)
    return per_row.groupBy("vec_id", "sub").agg(
        F.min_by(F.col("code"), F.struct(F.col("d"), F.col("code"))).alias(
            "code"
        )
    )


def _pq_update(sub, assign, dsub: int):
    """Lloyd update keyed (sub, code): exact integer means, one
    partial-aggregated groupBy (the ``_ivf_update`` arithmetic) — but
    UNSCALED back to vector units: IVF leaves its centroids x_CSCALE
    because cosine is scale-invariant; PQ's L2 is absolute, so a scaled
    codebook would rank every candidate by centroid norm instead of
    query distance (same-integer / same-divisor division is deterministic
    and identical across engines)."""
    sums = [
        F.sum(F.floor(F.element_at("sv", d + 1) * _CSCALE)).alias(f"s{d}")
        for d in range(dsub)
    ]
    g = sub.join(assign, ["vec_id", "sub"]).groupBy("sub", "code").agg(
        F.count("*").alias("n"), *sums
    )
    means = [
        F.expr(
            f"CAST((s{d} - (((s{d} % n) + n) % n)) DIV n AS DOUBLE)"
            f" / {_CSCALE}"
        )
        for d in range(dsub)
    ]
    return g.select("sub", "code", F.array(*means).alias("cv"))


def pq_codebooks(e, n_vecs: int, m: int = PQ_M, ksub: int = PQ_KSUB,
                 dim: int = EMB_DIM, iters: int = IVF_LLOYD_ITERS):
    """(sub, code, cv): ``m`` codebooks trained together by deterministic
    Lloyd on the hash-sampled training set. Seeds are the first ``ksub``
    vectors' subvectors (code = vec_id), same convention as
    ``ivf_centroids``. Each stage is localCheckpointed — the codebooks
    feed both the next iteration and the final assign, and without the cut
    every consumer re-runs the training chain."""
    dsub = dim // m
    t = (
        _subvectors(_train_sample(e, n_vecs, ksub * m), m, dsub)
        .localCheckpoint(eager=False)
    )
    # seeds = the first ksub vectors OF THE TRAINING SAMPLE, with dense
    # codes assigned by a ksub-row control-plane read (the same O(1)
    # driver-read budget as the corpus count). NOT `vec_id < ksub`: above
    # the sampling cap most of those ids are filtered out of the sample
    # and the codebooks silently collapse (at 1M vectors ~4 of 64 seeds
    # would survive; beyond that, zero — an empty codes frame with no
    # error). In the oracled fixture regime (no sampling, contiguous ids)
    # the two rules coincide, so the DuckDB mirror keeps the simple
    # predicate.
    ids = [
        r["vec_id"]
        for r in t.select("vec_id").distinct().orderBy("vec_id")
        .limit(ksub).collect()
    ]
    spark = t.sparkSession
    seed_ids = spark.createDataFrame(
        [(int(v), c) for c, v in enumerate(ids)], "vec_id BIGINT, code BIGINT"
    )
    books = t.join(F.broadcast(seed_ids), "vec_id").select(
        "sub", "code", F.col("sv").alias("cv")
    )
    for _ in range(iters):
        books = _pq_update(t, _pq_assign(t, books), dsub).localCheckpoint(
            eager=False
        )
    return books


def pq_codes(e, n_vecs: int, m: int = PQ_M, ksub: int = PQ_KSUB,
             dim: int = EMB_DIM):
    """Encode the corpus: (vec_id, sub, code) — n x m rows of small ints,
    the compressed index a 100 TB deployment actually stores. One encode
    pass over the full corpus (broadcast codebooks, map-side scoring,
    partial-aggregated min_by)."""
    books = pq_codebooks(e, n_vecs, m=m, ksub=ksub, dim=dim)
    return _pq_assign(_subvectors(e, m, dim // m), books), books


def pq_adc_topk(e, queries, n_vecs: int, k: int = PQ_TOP_K, m: int = PQ_M,
                ksub: int = PQ_KSUB, dim: int = EMB_DIM, index=None,
                exclude_self: bool = True):
    """Asymmetric-distance top-k: per-query LUT (exact query subvector vs
    every codebook centroid, floored to integer micro-units) broadcast
    against the codes table; score = one partial-aggregated BIGINT sum per
    (query, candidate); ranking is the two-phase salted reduce. The n x m
    codes are the ONLY corpus-sized input — raw vectors are never touched
    at search time.

    ``index`` = a prebuilt ``(codes, books)`` pair (e.g. codes read back
    from their stored parquet — the production shape, where encode runs
    once and every search reuses it); when None, the index is trained and
    encoded in-line (the oracled driver-query form)."""
    codes, books = index if index is not None else pq_codes(
        e, n_vecs, m=m, ksub=ksub, dim=dim
    )
    qsub = _subvectors(
        queries.select(F.col("query_id").alias("vec_id"), "v"), m, dim // m
    ).select(F.col("vec_id").alias("query_id"), "sub", "sv")
    lut = qsub.join(F.broadcast(books), "sub").select(
        "query_id", "sub", "code",
        F.floor(_l2(F.col("sv"), F.col("cv")) * _DSCALE)
        .cast("long")
        .alias("d"),
    )
    scored = codes.withColumnRenamed("vec_id", "cand_id").join(
        F.broadcast(lut), ["sub", "code"]
    )
    if exclude_self:
        # only meaningful when the queries ARE corpus members sharing the
        # id space (the oracled driver queries); external query labels
        # must not silently lose the colliding candidate
        scored = scored.filter(F.col("cand_id") != F.col("query_id"))
    scored = scored.groupBy("query_id", "cand_id").agg(
        F.sum("d").alias("adc_x1e6")
    )
    return _topk_two_phase(
        scored, k, [F.asc("adc_x1e6"), F.asc("cand_id")],
        part_col="query_id",
    ).select("query_id", "cand_id", "adc_x1e6", "rank")


#: refine shortlist multiplier: ADC keeps k * PQ_REFINE_FACTOR candidates,
#: the exact re-rank scores only those (per-query point lookups into the
#: raw vectors — k' rows per query at any corpus size).
PQ_REFINE_FACTOR = 4


def pq_refine_topk(e, queries, n_vecs: int, k: int = PQ_TOP_K,
                   m: int = PQ_M, ksub: int = PQ_KSUB, dim: int = EMB_DIM,
                   factor: int = PQ_REFINE_FACTOR):
    """The production two-stage search: ADC over the compressed codes
    keeps a k*factor shortlist (cheap, codes-only), then the shortlist —
    and ONLY the shortlist — is re-ranked by exact L2 against the raw
    vectors. Per query that second stage reads k*factor vectors, so the
    raw-vector access stays a bounded point lookup at any corpus size
    while recall approaches exact search (measured on the fixture:
    0.60 ADC-only -> 0.93 refined at factor=4).

    Distances are floored to integer micro-units (BIGINT) before ranking
    — same discipline as the ADC stage."""
    short = pq_adc_topk(e, queries, n_vecs, k=k * factor, m=m, ksub=ksub,
                        dim=dim).select("query_id", "cand_id")
    cand = e.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    qv = queries.select("query_id", F.col("v").alias("qv"))
    scored = (
        short.join(cand, "cand_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "cand_id",
            F.floor(_l2(F.col("qv"), F.col("cv")) * _DSCALE)
            .cast("long")
            .alias("l2_x1e6"),
        )
    )
    return _topk_two_phase(
        scored, k, [F.asc("l2_x1e6"), F.asc("cand_id")], part_col="query_id"
    ).select("query_id", "cand_id", "l2_x1e6", "rank")


# ---------------------------------------------------------------------------
# oracled driver queries
# ---------------------------------------------------------------------------


def q_pq_codes(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()
    codes, _books = pq_codes(e, n)
    return codes.select("vec_id", "sub", "code").orderBy("vec_id", "sub")


def q_pq_topk(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    return pq_adc_topk(e, q, n).orderBy("query_id", "rank")


def q_pq_refine_topk(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    return pq_refine_topk(e, q, n).orderBy("query_id", "rank")


def _duck_l2(xv: str, yv: str) -> str:
    """DuckDB squared-L2 with the same left-fold accumulation order as
    ``_l2`` (prepend 0.0 so the fold starts identically)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"range(1, len({xv})+1), "
        f"i -> ({xv}[i] - {yv}[i]) * ({xv}[i] - {yv}[i]))), (a, x) -> a + x)"
    )


def _sql_pq_ctes(m: int = PQ_M, ksub: int = PQ_KSUB, dim: int = EMB_DIM,
                 iters: int = IVF_LLOYD_ITERS, src: str | None = None) -> str:
    """Shared CTE chain: subvector frame + Lloyd unrolled + final assign
    (``codes``). Mirrors the Spark training exactly in the fixture regime
    (n below the sampling cap). ``src`` names an existing (vec_id, v) CTE
    to quantize (e.g. the IVF residual frame); None reads the embeddings
    view and emits the ``e`` CTE itself."""
    dsub = dim // m

    def assign(name: str, books: str) -> str:
        d = _duck_l2("t.sv", "c.cv")
        return f"""{name} AS (
  SELECT vec_id, sub, code FROM (
    SELECT t.vec_id, t.sub, c.code,
           row_number() OVER (PARTITION BY t.vec_id, t.sub
                              ORDER BY round({d}, 6) ASC, c.code ASC) rn
    FROM sub t JOIN {books} c USING (sub)) z WHERE rn = 1)"""

    def update(name: str, assign_t: str) -> str:
        sums = ", ".join(
            f"sum(CAST(floor(sv[{d + 1}] * {_CSCALE}) AS BIGINT)) AS s{d}"
            for d in range(dsub)
        )
        means = ", ".join(
            f"CAST((s{d} - (((s{d} % n) + n) % n)) // n AS DOUBLE)"
            f" / {_CSCALE}"
            for d in range(dsub)
        )
        return f"""{name} AS (
  SELECT sub, code, [{means}] AS cv FROM (
    SELECT a.sub, a.code, count(*) AS n, {sums}
    FROM sub t JOIN {assign_t} a ON t.vec_id = a.vec_id AND t.sub = a.sub
    GROUP BY a.sub, a.code) g)"""

    lloyd = []
    books = "b0"
    for i in range(iters):
        lloyd.append(assign(f"t{i + 1}", books))
        lloyd.append(update(f"b{i + 1}", f"t{i + 1}"))
        books = f"b{i + 1}"
    chain = ",\n".join(lloyd)
    if src is None:
        head = """e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
"""
        src = "e"
    else:
        head = ""
    return f"""{head}sub AS (
  SELECT vec_id, s.sub, list_slice(v, s.sub * {dsub} + 1,
                                   s.sub * {dsub} + {dsub}) AS sv
  FROM {src}, (SELECT unnest(range({m})) AS sub) s),
b0 AS (
  SELECT sub, vec_id AS code, sv AS cv FROM sub WHERE vec_id < {ksub}),
{chain},
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT t.vec_id, t.sub, c.code,
           row_number() OVER (PARTITION BY t.vec_id, t.sub
                              ORDER BY round({_duck_l2("t.sv", "c.cv")}, 6)
                                       ASC, c.code ASC) rn
    FROM sub t JOIN {books} c USING (sub)) z WHERE rn = 1),
books AS (SELECT * FROM {books})"""


def sql_pq_codes() -> str:
    return f"""
WITH {_sql_pq_ctes()}
SELECT vec_id, sub, code FROM codes ORDER BY vec_id, sub
"""


def sql_pq_topk(k: int = PQ_TOP_K) -> str:
    d = _duck_l2("q.sv", "c.cv")
    return f"""
WITH {_sql_pq_ctes()},
qsub AS (
  SELECT vec_id AS query_id, sub, sv FROM sub WHERE vec_id < {N_QUERIES}),
lut AS (
  SELECT q.query_id, q.sub, c.code,
         CAST(floor({d} * {_DSCALE}) AS BIGINT) AS d
  FROM qsub q JOIN books c USING (sub)),
scored AS (
  SELECT l.query_id, cd.vec_id AS cand_id, sum(l.d) AS adc_x1e6
  FROM codes cd JOIN lut l ON cd.sub = l.sub AND cd.code = l.code
  WHERE cd.vec_id <> l.query_id
  GROUP BY l.query_id, cd.vec_id),
r AS (
  SELECT query_id, cand_id, CAST(adc_x1e6 AS BIGINT) AS adc_x1e6,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_x1e6 ASC, cand_id ASC)
              AS BIGINT) AS rank
  FROM scored)
SELECT query_id, cand_id, adc_x1e6, rank FROM r
WHERE rank <= {k} ORDER BY query_id, rank
"""


def sql_pq_refine_topk(k: int = PQ_TOP_K,
                       factor: int = PQ_REFINE_FACTOR) -> str:
    d = _duck_l2("q.sv", "c.cv")
    exact = _duck_l2("qe.v", "ce.v")
    return f"""
WITH {_sql_pq_ctes()},
qsub AS (
  SELECT vec_id AS query_id, sub, sv FROM sub WHERE vec_id < {N_QUERIES}),
lut AS (
  SELECT q.query_id, q.sub, c.code,
         CAST(floor({d} * {_DSCALE}) AS BIGINT) AS d
  FROM qsub q JOIN books c USING (sub)),
adc AS (
  SELECT l.query_id, cd.vec_id AS cand_id, sum(l.d) AS adc
  FROM codes cd JOIN lut l ON cd.sub = l.sub AND cd.code = l.code
  WHERE cd.vec_id <> l.query_id
  GROUP BY l.query_id, cd.vec_id),
short AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc ASC, cand_id ASC) AS rn
    FROM adc) z WHERE rn <= {k * factor}),
ex AS (
  SELECT s.query_id, s.cand_id,
         CAST(floor({exact} * {_DSCALE}) AS BIGINT) AS l2_x1e6
  FROM short s
  JOIN e ce ON ce.vec_id = s.cand_id
  JOIN e qe ON qe.vec_id = s.query_id),
r AS (
  SELECT query_id, cand_id, l2_x1e6,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY l2_x1e6 ASC, cand_id ASC)
              AS BIGINT) AS rank
  FROM ex)
SELECT query_id, cand_id, l2_x1e6, rank FROM r
WHERE rank <= {k} ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells + PQ over RESIDUALS (the FAISS IVFPQ composition)
# ---------------------------------------------------------------------------

#: cells probed per query by the ivfpq search (fixture; the same
#: ivf_autoprobe rule as plain IVF applies at scale)
IVFPQ_NPROBE = 2


def _unscale(cents):
    """IVF centroids come out of the integer-mean Lloyd x_CSCALE (cosine
    is scale-invariant there); residual arithmetic needs true units."""
    return cents.select(
        "cent_id",
        F.transform("cv", lambda x: x / F.lit(float(_CSCALE))).alias("cv"),
    )


def _residuals(e, cu, assign):
    """(vec_id, cell, v = vector - its cell's TRUE centroid); ``cu`` is
    the unscaled (cell, cv) centroid frame (built once by the caller)."""
    return (
        e.join(assign, "vec_id")
        .join(F.broadcast(cu), "cell")
        .select(
            "vec_id", "cell",
            F.zip_with("v", "cv", lambda x, y: x - y).alias("v"),
        )
    )


def ivfpq_topk(e, queries, n_vecs: int, k: int = PQ_TOP_K,
               nlist: int | None = None, nprobe: int | None = None,
               m: int = PQ_M, ksub: int = PQ_KSUB, dim: int = EMB_DIM):
    """The production ANN composition (FAISS-style IVFPQ): vectors are
    bucketed into IVF cells and PQ-encoded as RESIDUALS from their cell
    centroid (residuals are tighter than raw vectors, so the same ksub
    quantizes them better); a query probes its ``nprobe`` nearest cells
    and scores ONLY those cells' candidates, by ADC against a per-(query,
    cell) residual LUT.

    100 TB shape: the scan cost is nprobe/nlist of the codes table
    (cell-partitioned, prunable), the LUT is q x nprobe x m x ksub
    integerized rows (KB-scale, broadcast), scoring is one
    partial-aggregated BIGINT sum per (query, candidate), ranking is the
    two-phase salted reduce — the raw vectors are touched by nothing.

    Cell assignment/probing reuse the oracled IVF convention (rounded
    cosine, deterministic tie-breaks); the residual codebooks are shared
    across cells (one m x ksub table, the standard IVFPQ layout)."""
    from pyspark.sql import Window

    from .similarity import (
        _cos,
        ivf_autoprobe,
        ivf_autosize,
        ivf_index,
    )

    if nlist is None:
        # same corpus rule as plain IVF (fixture regime resolves to the
        # oracle-pinned flat N_CENTROIDS quantizer; beyond it ivf_index
        # trains the sampled two-level tree — coarse training never runs
        # full-corpus Lloyd at scale)
        nlist = ivf_autosize(n_vecs)
    if nprobe is None:
        nprobe = max(IVFPQ_NPROBE, ivf_autoprobe(nlist)) \
            if nlist > IVFPQ_NPROBE else IVFPQ_NPROBE
    cents, assign = ivf_index(e, nlist, n_vecs, dim=dim)
    cents = cents.localCheckpoint(eager=False)
    assign = assign.localCheckpoint(eager=False)
    cu = _unscale(cents).withColumnRenamed("cent_id", "cell")
    res = _residuals(e, cu, assign)
    books = pq_codebooks(res.select("vec_id", "v"), n_vecs, m=m, ksub=ksub,
                         dim=dim)
    codes = _pq_assign(_subvectors(res.select("vec_id", "v"), m, dim // m),
                       books).join(assign, "vec_id")

    # probes: top-nprobe cells per query (window partitioned per query —
    # N_QUERIES partitions of nlist rows, never corpus-sized)
    scored_cells = F.broadcast(queries).crossJoin(cents).select(
        "query_id", "cent_id", "v",
        F.round(_cos(F.col("v"), F.col("cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("cent_id").asc()
    )
    probes = (
        scored_cells.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", F.col("cent_id").alias("cell"), "v")
    )
    # per-(query, probed cell) residual -> subvectors -> integerized LUT
    # (same cu frame and the same _subvectors slicing as the corpus side —
    # one implementation, so codes and LUT can never desynchronize)
    qres = probes.join(F.broadcast(cu), "cell").select(
        "query_id", "cell",
        F.zip_with("v", "cv", lambda x, y: x - y).alias("v"),
    )
    qsub = _subvectors(qres, m, dim // m, keys=("query_id", "cell"))
    lut = qsub.join(F.broadcast(books), "sub").select(
        "query_id", "cell", "sub", "code",
        F.floor(_l2(F.col("sv"), F.col("cv")) * _DSCALE)
        .cast("long")
        .alias("d"),
    )
    scored = (
        codes.withColumnRenamed("vec_id", "cand_id")
        .join(F.broadcast(lut), ["cell", "sub", "code"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.sum("d").alias("adc_x1e6"))
    )
    return _topk_two_phase(
        scored, k, [F.asc("adc_x1e6"), F.asc("cand_id")],
        part_col="query_id",
    ).select("query_id", "cand_id", "adc_x1e6", "rank")


def q_ivfpq_topk(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = e.count()
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    return ivfpq_topk(e, q, n).orderBy("query_id", "rank")


def sql_ivfpq_topk(k: int = PQ_TOP_K, nprobe: int = IVFPQ_NPROBE,
                   m: int = PQ_M, ksub: int = PQ_KSUB,
                   dim: int = EMB_DIM) -> str:
    """DuckDB mirror: IVF Lloyd unrolled (same text as sql_ivf_topk's
    builder) -> unscaled centroids -> residual frame -> the PQ CTE chain
    over it -> probed ADC."""
    from .similarity import (
        N_CENTROIDS,
        _duck_cos_expr,
        sql_ivf_assign_cte,
        sql_ivf_lloyd_ctes,
    )

    def assign_cte(name: str, cents: str) -> str:
        return sql_ivf_assign_cte(name, cents, dim)

    lloyd_sql, cents = sql_ivf_lloyd_ctes(dim)
    sim_q = _duck_cos_expr("q.v", "c.cv", 6)
    d_lut = _duck_l2("qs.sv", "bk.cv")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
{lloyd_sql},
{assign_cte("assign", cents)},
cu AS (SELECT cent_id AS cell,
              list_transform(cv, x -> x / {float(_CSCALE)}) AS cv
       FROM {cents}),
res AS (
  SELECT e.vec_id, a.cell,
         list_transform(range(1, {dim} + 1),
                        i -> e.v[i] - cu.cv[i]) AS v
  FROM e JOIN assign a USING (vec_id) JOIN cu ON cu.cell = a.cell),
{_sql_pq_ctes(m=m, ksub=ksub, dim=dim, src="res")},
cellcodes AS (
  SELECT c.vec_id, a.cell, c.sub, c.code
  FROM codes c JOIN assign a USING (vec_id)),
probes AS (
  SELECT query_id, cell, v FROM (
    SELECT q.vec_id AS query_id, c.cent_id AS cell, q.v,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {sim_q} DESC, c.cent_id ASC) rn
    FROM e q, {cents} c WHERE q.vec_id < {N_QUERIES}) z
  WHERE rn <= {nprobe}),
qres AS (
  SELECT p.query_id, p.cell,
         list_transform(range(1, {dim} + 1),
                        i -> p.v[i] - cu.cv[i]) AS v
  FROM probes p JOIN cu USING (cell)),
qsub AS (
  SELECT query_id, cell, s.sub,
         list_slice(v, s.sub * {dim // m} + 1,
                    s.sub * {dim // m} + {dim // m}) AS sv
  FROM qres, (SELECT unnest(range({m})) AS sub) s),
lut AS (
  SELECT qs.query_id, qs.cell, qs.sub, bk.code,
         CAST(floor({d_lut} * {_DSCALE}) AS BIGINT) AS d
  FROM qsub qs JOIN books bk USING (sub)),
scored AS (
  SELECT l.query_id, cc.vec_id AS cand_id, sum(l.d) AS adc_x1e6
  FROM cellcodes cc
  JOIN lut l ON cc.cell = l.cell AND cc.sub = l.sub AND cc.code = l.code
  WHERE cc.vec_id <> l.query_id
  GROUP BY l.query_id, cc.vec_id),
r AS (
  SELECT query_id, cand_id, CAST(adc_x1e6 AS BIGINT) AS adc_x1e6,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_x1e6 ASC, cand_id ASC)
              AS BIGINT) AS rank
  FROM scored)
SELECT query_id, cand_id, adc_x1e6, rank FROM r
WHERE rank <= {k} ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# incremental PQ index: streaming-maintained compressed ANN
# ---------------------------------------------------------------------------


class PqIndex:
    """Persistent PQ codes over a changing vector corpus — the compressed
    twin of :class:`~cdc_spark.functions.emb_index.EmbIndex`: each batch
    encodes ONLY its changed vectors against a FROZEN codebook and
    LWW-merges the (doc_id, sub) -> code rows into a merge-on-read
    LakeTable, so per-batch cost is O(batch), search reads only the
    codes lake, and the raw vectors need not be stored here at all.

    Codebooks are trained ONCE (from an explicit :meth:`train` corpus, or
    lazily from the first update batch) and persisted atomically to
    ``pq_books.json`` BEFORE any codes commit — on crash/replay the
    stored books are reused, so codes stay comparable forever; re-sizing
    is a rebuild, the same contract as the MinHash/embedding indexes'
    banding. Exact-float round-trip through JSON is lossless (Python
    serializes doubles shortest-round-trip).

    Simpler than EmbIndex by construction: a doc's index rows are exactly
    its m (doc_id, sub) keys, so an update REPLACES them by per-key LWW
    (no superseded-posting tombstones, no pre-batch version lookup), a
    stale redelivery loses at read time on its lower ``_lsn``, and a
    delete tombstones exactly m known keys."""

    FIELDS = [("doc_id", "long"), ("sub", "long"), ("code", "long")]
    KEY = ("doc_id", "sub")

    def __init__(self, spark, root: str, m: int | None = None,
                 ksub: int | None = None, dim: int | None = None,
                 n_buckets: int = 8):
        import json
        import os

        from ..lake import LakeTable

        self.spark = spark
        self.root = root
        self._books_path = os.path.join(root, "pq_books.json")
        self._books: list | None = None
        if os.path.exists(self._books_path):
            with open(self._books_path) as fh:
                stored = json.load(fh)
            # stored meta is the source of truth; an EXPLICIT conflicting
            # argument is a caller error (silently using the stored dim
            # would slice only a prefix of wider vectors — no error, wrong
            # codes), not a preference to honor
            for name, arg in (("m", m), ("ksub", ksub), ("dim", dim)):
                if arg is not None and arg != stored[name]:
                    raise ValueError(
                        f"PqIndex at {root}: stored {name}={stored[name]} "
                        f"conflicts with requested {name}={arg} — "
                        f"re-sizing is a rebuild under a new root"
                    )
            self.m, self.ksub, self.dim = (
                stored["m"], stored["ksub"], stored["dim"],
            )
            self._books = stored["books"]
        else:
            m = PQ_M if m is None else m
            ksub = PQ_KSUB if ksub is None else ksub
            dim = EMB_DIM if dim is None else dim
            if dim % m:
                raise ValueError(f"dim={dim} must divide into m={m}")
            self.m, self.ksub, self.dim = m, ksub, dim
        codes_root = os.path.join(root, "codes")
        if LakeTable.exists(codes_root):
            self.codes_lake = LakeTable(spark, codes_root).refresh()
        else:
            self.codes_lake = LakeTable.create(
                spark, codes_root, fields=list(self.FIELDS),
                key=self.KEY, n_buckets=n_buckets, table="pq_codes",
                merge_on_read=True,
            )
        self.last_update_stats: dict = {}

    # -- codebooks ---------------------------------------------------------

    def trained(self) -> bool:
        return self._books is not None

    def train(self, vecs, n_vecs: int) -> None:
        """Train and FREEZE the codebooks from ``vecs`` (doc_id,
        embedding). Idempotent: stored books always win (a replay after a
        crash mid-first-batch reuses them instead of retraining on a
        possibly different frame)."""
        import json
        import os

        if self._books is not None:
            return
        e = vecs.select(
            "doc_id",
            F.col("embedding").cast("array<double>").alias("v"),
        ).withColumnRenamed("doc_id", "vec_id")
        books = pq_codebooks(e, n_vecs, m=self.m, ksub=self.ksub,
                             dim=self.dim)
        rows = books.collect()  # m x ksub rows — control-plane sized
        if not rows:
            # freezing empty codebooks would make trained() True forever
            # and every later assign an empty inner join — the index
            # would silently never index anything
            raise ValueError(
                "PqIndex.train: empty training corpus — cannot freeze "
                "codebooks (train on a non-empty bootstrap, or let the "
                "first non-empty update batch train lazily)"
            )
        payload = sorted(
            (int(r["sub"]), int(r["code"]), [float(x) for x in r["cv"]])
            for r in rows
        )
        os.makedirs(self.root, exist_ok=True)
        tmp = self._books_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"m": self.m, "ksub": self.ksub, "dim": self.dim,
                 "books": payload},
                fh,
            )
        os.replace(tmp, self._books_path)
        self._books = payload

    def books(self):
        """The frozen codebooks as a (sub, code, cv) frame."""
        if self._books is None:
            raise RuntimeError("PqIndex: codebooks not trained yet")
        return self.spark.createDataFrame(
            [(s, c, cv) for s, c, cv in self._books],
            "sub BIGINT, code BIGINT, cv ARRAY<DOUBLE>",
        )

    # -- updates -----------------------------------------------------------

    def codes(self):
        """The live compressed index: (doc_id, sub, code)."""
        return self.codes_lake.read()

    def update(self, vecs, lsn: int, batch_id: int,
               new_truncate_lsn: int | None = None) -> None:
        """Apply one batch of vector changes: (doc_id, embedding
        [, _deleted][, _lsn]) for the NEW / CHANGED / DELETED docs only.
        Encodes the live rows against the frozen books (training them
        first if this is the very first batch — raising if that batch has
        no live rows to train on), tombstones m rows per delete, and
        commits idempotently per ``batch_id``. The batch is LWW-collapsed
        to one row per doc first (a folded delete + re-insert would
        otherwise stamp both versions and blend both embeddings)."""
        from .emb_index import collapse_batch, stamp_rows

        vecs = collapse_batch(vecs, lsn)
        has_del = "_deleted" in vecs.columns
        live = vecs.filter(~F.col("_deleted")) if has_del else vecs
        if not self.trained():
            n_live = live.count()
            if n_live == 0:
                raise ValueError(
                    "PqIndex.update: first batch has no live vectors to "
                    "train the codebooks on — call train() with a "
                    "bootstrap corpus first, or start with a batch that "
                    "inserts rows"
                )
            self.train(live.select("doc_id", "embedding"), n_vecs=n_live)
        if "_lsn" in vecs.columns:
            lsn_map = vecs.select(
                "doc_id",
                F.coalesce(F.col("_lsn").cast("long"),
                           F.lit(lsn).cast("long")).alias("_row_lsn"),
            ).distinct()
        else:
            lsn_map = vecs.select("doc_id").distinct().withColumn(
                "_row_lsn", F.lit(lsn).cast("long")
            )
        e = live.select(
            F.col("doc_id").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        enc = _pq_assign(
            _subvectors(e, self.m, self.dim // self.m), self.books()
        ).withColumnRenamed("vec_id", "doc_id")

        def _stamped(df, deleted=False):
            return stamp_rows(df, lsn_map, deleted=deleted)

        batch = _stamped(enc.select("doc_id", "sub", "code"))
        if has_del:
            dead = vecs.filter(F.col("_deleted")).select("doc_id").distinct()
            subs = self.spark.range(self.m).select(
                F.col("id").alias("sub")
            )
            batch = batch.unionByName(
                _stamped(
                    dead.crossJoin(F.broadcast(subs)).select(
                        "doc_id", "sub",
                        F.lit(None).cast("long").alias("code"),
                    ),
                    deleted=True,
                )
            )
        info = self.codes_lake.merge(
            batch, batch_id=batch_id, lsn_hwm=lsn,
            new_truncate_lsn=new_truncate_lsn,
        )
        self.codes_lake.refresh()
        self.last_update_stats = {"merge": info}

    def rebuild(self, vecs, lsn: int, batch_id: int,
                truncate_lsn: int | None = None) -> None:
        """Full re-encode after a corpus TRUNCATE: same pipeline fed the
        post-truncate corpus, committed with a truncate watermark that
        kills every older code row in O(1). The codebooks stay frozen —
        codes remain comparable across the truncate.

        With no explicit ``truncate_lsn`` the watermark defaults to one
        below the batch's SMALLEST row LSN (one small agg job) — NOT
        ``lsn - 1``: rebuild rows carrying per-row ``_lsn`` values below
        the batch high-watermark would otherwise be killed by the very
        watermark that publishes them."""
        if truncate_lsn is None:
            if "_lsn" in vecs.columns:
                lo = vecs.agg(
                    F.min(
                        F.coalesce(F.col("_lsn").cast("long"),
                                   F.lit(lsn).cast("long"))
                    )
                ).head()[0]
                t = (int(lo) if lo is not None else lsn) - 1
            else:
                t = lsn - 1
        else:
            t = truncate_lsn
        self.update(vecs, lsn, batch_id, new_truncate_lsn=t)

    # -- search ------------------------------------------------------------

    def search(self, queries, k: int = PQ_TOP_K,
               exclude_self: bool = False):
        """ADC top-k per query over the LIVE codes (no raw-vector access):
        ``queries`` is (query_id, v). Query ids are EXTERNAL labels here —
        by default nothing is excluded from the candidates (a doc_id that
        happens to equal a query_id is still a valid neighbor); pass
        ``exclude_self=True`` only when the queries ARE corpus members
        sharing the doc_id space."""
        return pq_adc_topk(
            None, queries, 0, k=k, m=self.m, ksub=self.ksub, dim=self.dim,
            index=(self.codes().withColumnRenamed("doc_id", "vec_id"),
                   self.books()),
            exclude_self=exclude_self,
        )


def registry() -> dict:
    return {
        "pq_codes": (q_pq_codes, sql_pq_codes()),
        "pq_topk": (q_pq_topk, sql_pq_topk()),
        "pq_refine_topk": (q_pq_refine_topk, sql_pq_refine_topk()),
        "ivfpq_topk": (q_ivfpq_topk, sql_ivfpq_topk()),
    }
