"""Deterministic corpus sampling for training-data mixes.

A training run rarely takes a corpus whole: sources are re-weighted
(up/down-sampled) to a target mixture. The operator must be DETERMINISTIC
(same corpus -> same sample, for reproducible runs and resumable pipelines)
and engine-independent, so membership is decided by the portable polynomial
hash — never ``rand()``. Everything is integer arithmetic, so the DuckDB
oracle is hash-exact.

The 100 TB shape: a sample is one map-side filter (no shuffle at all); the
per-source report is one partial-aggregated groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._portable import duck_poly_hash, spark_poly_hash

#: membership granularity (basis points of 10^4)
SAMPLE_MOD = 10_000


def _rate_x1e4_spark(source_col: str):
    """Per-source keep-rate in [2500, 7450] basis points, derived from the
    portable hash of the source name (integer space end-to-end)."""
    h = F.expr(spark_poly_hash(source_col))
    return (F.lit(2500) + F.lit(50) * F.pmod(h, F.lit(100))).cast("long")


def _rate_x1e4_duck(expr: str) -> str:
    return f"CAST(2500 + 50 * ({duck_poly_hash(expr)} % 100) AS BIGINT)"


def _member_hash_spark():
    """Per-row coin: portable hash of 'source:doc_id'."""
    key = "concat(source, ':', CAST(doc_id AS STRING))"
    return F.pmod(F.expr(spark_poly_hash(key)), F.lit(SAMPLE_MOD))


def stratified_sample(docs):
    """Rows kept by the per-source deterministic rate — a pure map-side
    filter usable as a pipeline stage."""
    return docs.filter(sample_member())


def sample_member():
    """Boolean keep-column (for frames carrying doc_id + source) — the ONE
    membership rule ``stratified_sample`` and the report both read."""
    return _member_hash_spark() < _rate_x1e4_spark("source")


def q_sample_stratified(spark, sf_dir):
    """Per-source sampling report: total docs, kept docs, the configured
    rate, and the kept token mass (whitespace tokens) — the numbers a
    mixture designer actually reads. Derives membership from the same
    expression ``stratified_sample`` filters with."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = sample_member().cast("int")
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.max(_rate_x1e4_spark("source")).alias("rate_x1e4"),
            F.sum(kept * ntok).cast("long").alias("kept_tokens"),
        )
        .orderBy("source")
    )


def sql_sample_stratified() -> str:
    key = "source || ':' || CAST(doc_id AS VARCHAR)"
    member = f"{duck_poly_hash(key)} % {SAMPLE_MOD}"
    rate = _rate_x1e4_duck("source")
    return rf"""
WITH d AS (
  SELECT source,
         CASE WHEN ({member}) < ({rate}) THEN 1 ELSE 0 END AS kept,
         len(string_split_regex(trim(text), '\s+')) AS ntok,
         {rate} AS rate_x1e4
  FROM documents)
SELECT source, count(*) AS n_docs,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       max(rate_x1e4) AS rate_x1e4,
       CAST(sum(kept * ntok) AS BIGINT) AS kept_tokens
FROM d GROUP BY source ORDER BY source
"""


def q_mixture_plan(spark, sf_dir):
    """Temperature-scaled source mixture planning (the multilingual /
    multi-source re-weighting rule, alpha = 0.5): each source's sampling
    weight is proportional to sqrt(its token mass), flattening the natural
    distribution so small sources are up-weighted. All integer space —
    isqrt per source, then basis-point weights and per-source token
    targets by integer division — so the DuckDB oracle is hash-exact.

    Plan shape: ONE partial-aggregated groupBy(source); the two corpus
    totals are an O(sources) control-plane read folded back as literals
    (never a single-partition exchange or a corpus-wide window)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    per = (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ntok).alias("n_tokens"),
        )
        .withColumn(
            "isqrt_tokens",
            F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long"),
        )
    )
    tot = per.agg(
        F.sum("isqrt_tokens").alias("s"), F.sum("n_tokens").alias("t")
    ).head()
    isq_tot, tok_tot = int(tot["s"]), int(tot["t"])
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        "isqrt_tokens",
        F.expr(f"isqrt_tokens * 1000000 DIV {isq_tot}")
        .cast("long")
        .alias("weight_x1e6"),
        F.expr(
            f"(isqrt_tokens * 1000000 DIV {isq_tot}) * {tok_tot} DIV 1000000"
        )
        .cast("long")
        .alias("target_tokens"),
    ).orderBy("source")


def sql_mixture_ctes() -> str:
    """The mixture-plan pipeline as a CTE chain ending in
    ``plan(source, n_docs, n_tokens, isqrt_tokens, weight_x1e6,
    target_tokens)`` — shared by the plan query's oracle and the
    mixture-sample oracle."""
    return r"""per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
             AS n_tokens
  FROM documents GROUP BY source),
w AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
             AS isqrt_tokens FROM per),
tot AS (SELECT CAST(sum(isqrt_tokens) AS BIGINT) AS s,
               CAST(sum(n_tokens) AS BIGINT) AS t FROM w),
plan AS (
  SELECT source, n_docs, n_tokens, isqrt_tokens,
         CAST(isqrt_tokens * 1000000 // s AS BIGINT) AS weight_x1e6,
         CAST((isqrt_tokens * 1000000 // s) * t // 1000000 AS BIGINT)
             AS target_tokens
  FROM w, tot)"""


def sql_mixture_plan() -> str:
    return f"""
WITH {sql_mixture_ctes()}
SELECT * FROM plan ORDER BY source
"""


def q_mixture_sample(spark, sf_dir):
    """Materialize the mixture plan as a deterministic sampler: each
    source is replayed ``n_epochs = target_tokens DIV n_tokens`` full
    times (up-weighted small sources repeat, DoReMi-style), plus one
    FRACTIONAL pass in which a doc is kept iff the portable hash of
    ``'mix:' || source || ':' || doc_id`` lands under the per-source
    remainder rate — so ``achieved_tokens`` tracks ``target_tokens``
    without replacement randomness or ``rand()``.

    Plan shape: the plan side is O(sources) rows broadcast onto the doc
    scan; membership is a map-side integer predicate; the report is one
    partial-aggregated groupBy. Nothing new shuffles at 100 TB."""
    plan = q_mixture_plan(spark, sf_dir).select(
        "source",
        "n_tokens",
        "target_tokens",
        F.expr("target_tokens DIV n_tokens").cast("long").alias("n_epochs"),
        F.expr("(target_tokens % n_tokens) * 1000000 DIV n_tokens")
        .cast("long")
        .alias("frac_rate_x1e6"),
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = "concat('mix:', source, ':', CAST(doc_id AS STRING))"
    member = F.pmod(F.expr(spark_poly_hash(key)), F.lit(1_000_000))
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    j = d.select("doc_id", "source", ntok.alias("ntok")).join(
        F.broadcast(plan), "source"
    )
    kept = (member < F.col("frac_rate_x1e6")).cast("long")
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_epochs").alias("n_epochs"),
            F.max("frac_rate_x1e6").alias("frac_rate_x1e6"),
            F.sum(kept).alias("frac_docs"),
            (
                F.max("n_epochs") * F.max("n_tokens") + F.sum(kept * F.col("ntok"))
            )
            .cast("long")
            .alias("achieved_tokens"),
            F.max("target_tokens").alias("target_tokens"),
        )
        .orderBy("source")
    )


def sql_mixture_sample() -> str:
    key = "'mix:' || source || ':' || CAST(doc_id AS VARCHAR)"
    member = f"{duck_poly_hash(key)} % 1000000"
    return rf"""
WITH {sql_mixture_ctes()},
p2 AS (SELECT source, n_tokens, target_tokens,
              target_tokens // n_tokens AS n_epochs,
              (target_tokens % n_tokens) * 1000000 // n_tokens
                  AS frac_rate_x1e6
       FROM plan),
d AS (SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS ntok,
             CASE WHEN ({member}) < p2.frac_rate_x1e6 THEN 1 ELSE 0 END
                 AS kept,
             p2.n_epochs, p2.frac_rate_x1e6, p2.n_tokens, p2.target_tokens
      FROM documents JOIN p2 USING (source))
SELECT source, count(*) AS n_docs,
       CAST(max(n_epochs) AS BIGINT) AS n_epochs,
       CAST(max(frac_rate_x1e6) AS BIGINT) AS frac_rate_x1e6,
       CAST(sum(kept) AS BIGINT) AS frac_docs,
       CAST(max(n_epochs) * max(n_tokens) + sum(kept * ntok) AS BIGINT)
           AS achieved_tokens,
       CAST(max(target_tokens) AS BIGINT) AS target_tokens
FROM d GROUP BY source ORDER BY source
"""


def registry() -> dict:
    return {
        "sample_stratified": (q_sample_stratified, sql_sample_stratified()),
        "mixture_plan": (q_mixture_plan, sql_mixture_plan()),
        "mixture_sample": (q_mixture_sample, sql_mixture_sample()),
    }
