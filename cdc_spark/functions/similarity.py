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


def q_ann_lsh_buckets(spark, sf_dir, dim: int | None = None):
    """ANN scale path: sign-projection LSH bucket per vector (ANN_BITS sign
    bits of deterministic ±1 projections). Search = equi-join on bucket, so
    at 100 TB candidates shuffle by bucket key instead of all-pairs."""
    e = _emb(spark, sf_dir)
    if dim is None:
        dim = len(e.select("embedding").first()[0])
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


def registry() -> dict:
    return {
        "cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
        "ann_lsh_buckets": (
            lambda spark, sf_dir: q_ann_lsh_buckets(spark, sf_dir, dim=EMB_DIM),
            sql_ann_lsh_buckets(EMB_DIM),
        ),
    }
