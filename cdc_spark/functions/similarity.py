"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (tiny) query
set against all candidates, dot products via zip_with/aggregate (codegen).
Scale path: LSH sign-projection buckets — candidates only within a bucket,
so the shuffle is by bucket key and cost scales with bucket occupancy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_QUERIES = 8
TOP_K = 10
ANN_BITS = 8


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _cos(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    )
    nb = F.sqrt(
        F.aggregate(F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot / (na * nb)


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k per query vector (queries = vec_id <
    N_QUERIES, broadcast against all candidates)."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = e.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(cand)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(_cos(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


SQL_COSINE_TOPK = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT query_id, c.vec_id AS cand_id,
         round(list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i] * c.v[i]),
                           (acc, x) -> acc + x)
               / (sqrt(list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i] * qv[i]), (acc, x) -> acc + x))
                  * sqrt(list_reduce(list_transform(range(1, len(c.v)+1), i -> c.v[i] * c.v[i]), (acc, x) -> acc + x))),
               4) AS cosine
  FROM q, e c WHERE c.vec_id <> query_id)
SELECT query_id, cand_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _proj_sign(d: int, j: int) -> int:
    """Deterministic pseudo-random ±1 projection component (shared rule)."""
    return 1 if ((d * 31 + j * 17) % 7) < 3 else -1


def q_ann_lsh_buckets(spark, sf_dir, dim: int = 64):
    """ANN scale path: sign-projection LSH bucket per vector (ANN_BITS sign
    bits of deterministic ±1 projections). Search = equi-join on bucket, so
    at 100 TB candidates shuffle by bucket key instead of all-pairs. ``dim``
    is part of the operator config (EMB_DIM for the testdata) — never
    discovered with a driver-side read."""
    e = _emb(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    bucket = F.lit(0)
    for j in range(ANN_BITS):
        terms = [
            F.element_at(v, d + 1) * F.lit(float(_proj_sign(d, j)))
            for d in range(dim)
        ]
        dot = sum(terms[1:], terms[0])
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return e.select(
        "vec_id", bucket.cast("int").alias("bucket")
    ).orderBy("vec_id")


def sql_ann_lsh_buckets(dim: int) -> str:
    bits = []
    for j in range(ANN_BITS):
        dot = " + ".join(
            f"v[{d + 1}] * ({_proj_sign(d, j)})" for d in range(dim)
        )
        bits.append(f"CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END")
    expr = " + ".join(bits)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_id, CAST({expr} AS INT) AS bucket FROM e ORDER BY vec_id
"""


#: the driver testdata embeddings are fixed 64-wide at every sf
EMB_DIM = 64

# ---------------------------------------------------------------------- IVF

N_CENTROIDS = 16
N_PROBE = 2
IVF_TOP_K = 5


def q_ivf_topk(spark, sf_dir):
    """IVF (inverted-file) ANN: 'centroids' are the first N_CENTROIDS
    vectors (deterministic training stand-in); every vector is assigned to
    its nearest centroid (one broadcast crossJoin + argmin — at 100 TB this
    is a map-side pass, centroids are tiny); queries probe the N_PROBE
    nearest cells and rank candidates by exact cosine within them. The
    search join is an equi-join on cell id — cost scales with cell
    occupancy, not with the corpus."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    scored = F.broadcast(cents).crossJoin(e).select(
        "vec_id", "cent_id", F.round(_cos(F.col("v"), F.col("cv")), 6).alias("sim")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    assign = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"))
    )
    # queries probe their N_PROBE nearest cells
    probes = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("cent_id").alias("cell"))
    )
    cand = assign.join(e, "vec_id").select(
        F.col("vec_id").alias("cand_id"), "cell", F.col("v").alias("cv2")
    )
    qv = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    pairs = (
        probes.join(cand, "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .join(qv, "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(_cos(F.col("qv"), F.col("cv2")), 4).alias("cosine"),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= IVF_TOP_K)
        .orderBy("query_id", "rank")
    )


SQL_IVF_TOPK = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT e.vec_id, cent_id,
         round(list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * cv[i]), (a, x) -> a + x)
               / (sqrt(list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * v[i]), (a, x) -> a + x))
                  * sqrt(list_reduce(list_transform(range(1, len(cv)+1), i -> cv[i] * cv[i]), (a, x) -> a + x))),
               6) AS sim
  FROM cents, e),
assign AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id ASC) rn
    FROM scored) WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id ASC) rn
    FROM scored WHERE vec_id < {N_QUERIES}) WHERE rn <= {N_PROBE}),
cand AS (SELECT a.vec_id AS cand_id, a.cell, e.v AS cv2 FROM assign a JOIN e ON e.vec_id = a.vec_id),
pairs AS (
  SELECT DISTINCT p.query_id, c.cand_id,
         round(list_reduce(list_transform(range(1, len(q.v)+1), i -> q.v[i] * c.cv2[i]), (a, x) -> a + x)
               / (sqrt(list_reduce(list_transform(range(1, len(q.v)+1), i -> q.v[i] * q.v[i]), (a, x) -> a + x))
                  * sqrt(list_reduce(list_transform(range(1, len(c.cv2)+1), i -> c.cv2[i] * c.cv2[i]), (a, x) -> a + x))),
               4) AS cosine
  FROM probes p JOIN cand c ON c.cell = p.cell
  JOIN e q ON q.vec_id = p.query_id
  WHERE c.cand_id <> p.query_id)
SELECT query_id, cand_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
FROM pairs
QUALIFY rank <= {IVF_TOP_K}
ORDER BY query_id, rank
"""

# ----------------------------------------------- embedding-cosine near-dup

#: tuned so the fixture corpora actually produce confirmations (max blocked
#: cosine is ~0.46 at sf0.01 / ~0.55 at sf0.1) — a threshold the data never
#: crosses would make the oracle check vacuous (0 == 0)
NEARDUP_COSINE = 0.4


def q_embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, LSH-blocked: candidates must
    share a sign-projection bucket (equi-join, no all-pairs), then exact
    cosine confirms. The 100 TB shape: shuffle by bucket key only."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    b = q_ann_lsh_buckets(spark, sf_dir, dim=EMB_DIM)
    eb = e.join(b, "vec_id")
    a = eb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket"
    )
    c = eb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket"
    )
    return (
        a.join(c, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_cos(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= NEARDUP_COSINE)
        .orderBy("vec_a", "vec_b")
    )


def sql_embedding_neardup_pairs(dim: int) -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (
  SELECT vec_id, CAST({_bucket_sql_expr(dim)} AS INT) AS bucket FROM e)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       round(list_reduce(list_transform(range(1, len(av.v)+1), i -> av.v[i] * cv.v[i]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(range(1, len(av.v)+1), i -> av.v[i] * av.v[i]), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(range(1, len(cv.v)+1), i -> cv.v[i] * cv.v[i]), (x, y) -> x + y))),
             4) AS cosine
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
JOIN e av ON av.vec_id = a.vec_id
JOIN e cv ON cv.vec_id = c.vec_id
WHERE round(list_reduce(list_transform(range(1, len(av.v)+1), i -> av.v[i] * cv.v[i]), (x, y) -> x + y)
            / (sqrt(list_reduce(list_transform(range(1, len(av.v)+1), i -> av.v[i] * av.v[i]), (x, y) -> x + y))
               * sqrt(list_reduce(list_transform(range(1, len(cv.v)+1), i -> cv.v[i] * cv.v[i]), (x, y) -> x + y))),
            4) >= {NEARDUP_COSINE}
ORDER BY vec_a, vec_b
"""


def _bucket_sql_expr(dim: int) -> str:
    bits = []
    for j in range(ANN_BITS):
        dot = " + ".join(f"v[{d + 1}] * ({_proj_sign(d, j)})" for d in range(dim))
        bits.append(f"CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END")
    return " + ".join(bits)


def registry() -> dict:
    return {
        "cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
        "ann_lsh_buckets": (
            lambda spark, sf_dir: q_ann_lsh_buckets(spark, sf_dir, dim=EMB_DIM),
            sql_ann_lsh_buckets(EMB_DIM),
        ),
        "ivf_topk": (q_ivf_topk, SQL_IVF_TOPK),
        "embedding_neardup_pairs": (
            q_embedding_neardup_pairs,
            sql_embedding_neardup_pairs(EMB_DIM),
        ),
    }
