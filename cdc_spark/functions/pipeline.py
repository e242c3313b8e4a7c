"""A composed training-data prep pipeline — the operators chained the way a
real corpus-preparation job uses them:

    documents
      -> quality filter         (quality_score >= QUALITY_MIN)
      -> exact dedup            (keep min doc_id per md5(text))
      -> near-dup removal       (MinHash-LSH pairs among survivors; drop the
                                 higher doc_id of every candidate pair)
      -> decontamination        (drop docs whose shingle overlap with the
                                 held-out eval set reaches DECON_OVERLAP)
      -> per-source corpus stats (docs kept, total whitespace tokens,
                                  mean quality)

Every stage reuses the already-oracled building blocks, and the whole
composition is itself DuckDB-oracled — proving the operators compose without
engine-specific drift. All joins are equi-joins on doc ids / hashes; the
only pair-shaped work is the (bounded) LSH candidate set."""

from __future__ import annotations

from pyspark.sql import functions as F

from .dedupe import (
    decontaminate_pairs,
    q_minhash_lsh_pairs,
    sql_minhash_lsh_pairs,
)
from .text import q_quality_score, q_token_count, SQL_TOKEN_COUNT, sql_quality_score

QUALITY_MIN = 0.4


def q_training_pipeline(spark, sf_dir):
    from .dedupe import N_EVAL_DOCS

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quality = q_quality_score(spark, sf_dir).select("doc_id", "quality")
    tokens = q_token_count(spark, sf_dir).select("doc_id", "n_tokens")

    # the eval HOLDOUT never enters the training corpus — excluding only
    # docs that overlap it while shipping the eval docs themselves would
    # be 100% contamination of the set the stage protects
    kept = (
        d.select("doc_id", "source", "text")
        .filter(F.col("doc_id") >= N_EVAL_DOCS)
        .join(quality, "doc_id")
        .filter(F.col("quality") >= QUALITY_MIN)
    )
    # exact dedup: canonical = min doc_id per content hash
    canon = (
        kept.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = kept.join(canon, "doc_id", "left_semi")

    # near-dup removal: LSH candidate pairs restricted to survivors; the
    # higher id of each pair goes (deterministic, engine-independent)
    ids_a = kept.select(F.col("doc_id").alias("doc_a"))
    ids_b = kept.select(F.col("doc_id").alias("doc_b"))
    pairs = (
        q_minhash_lsh_pairs(spark, sf_dir)
        .join(ids_a, "doc_a", "left_semi")
        .join(ids_b, "doc_b", "left_semi")
    )
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # the decon branch below references `final` twice in one action (the
    # anti-join's both sides descend from it); localCheckpoint makes the
    # single evaluation of the expensive upstream (quality + LSH pair join)
    # explicit instead of relying on the optimizer's exchange reuse
    final = kept.join(drop, "doc_id", "left_anti").localCheckpoint(eager=False)

    # decontamination: drop survivors contaminated against the eval holdout.
    # Only the SURVIVORS are shingled (decontaminate_pairs takes the corpus
    # as a frame) — shingling docs the earlier stages already discarded is
    # the dominant wasted cost at scale; the eval side always comes from
    # the full table (the holdout is never quality-filtered away).
    contaminated = decontaminate_pairs(
        d.select("doc_id", "text").filter(F.col("doc_id") < N_EVAL_DOCS),
        final.select("doc_id", "text"),
    ).select("doc_id").distinct()
    final = final.join(contaminated, "doc_id", "left_anti")

    # mean quality is aggregated in INTEGER space (quality is already
    # rounded to 4 decimals, so x1e4 is exact): a float avg rounds
    # differently across engines on .00005 boundaries — measured at sf0.01
    q_int = F.round(F.col("quality") * 10000).cast("long")
    return (
        final.join(tokens, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.floor(F.sum(q_int) / F.count("*")).cast("long").alias(
                "mean_quality_x1e4"
            ),
        )
        .orderBy("source")
    )


def sql_training_pipeline() -> str:
    from .dedupe import N_EVAL_DOCS, sql_decontaminate

    quality = sql_quality_score().strip()
    tokens = SQL_TOKEN_COUNT.strip()
    pairs = sql_minhash_lsh_pairs().strip()
    return f"""
WITH q AS ({quality}),
tok AS ({tokens}),
kept0 AS (
  SELECT d.doc_id, d.source, d.text, q.quality
  FROM documents d JOIN q USING (doc_id)
  WHERE q.quality >= {QUALITY_MIN} AND d.doc_id >= {N_EVAL_DOCS}),
canon AS (SELECT min(doc_id) AS doc_id FROM kept0 GROUP BY md5(text)),
kept AS (SELECT kept0.* FROM kept0 JOIN canon USING (doc_id)),
pairs AS ({pairs}),
surv_pairs AS (
  SELECT p.doc_a, p.doc_b FROM pairs p
  JOIN kept a ON a.doc_id = p.doc_a
  JOIN kept b ON b.doc_id = p.doc_b),
dropped AS (SELECT DISTINCT doc_b AS doc_id FROM surv_pairs),
decon AS (SELECT DISTINCT doc_id FROM ({sql_decontaminate().strip()})),
final AS (SELECT kept.* FROM kept
          WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
            AND doc_id NOT IN (SELECT doc_id FROM decon))
SELECT source, count(*) AS n_docs,
       CAST(sum(tok.n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CAST(round(quality * 10000) AS BIGINT)) // count(*) AS BIGINT)
         AS mean_quality_x1e4
FROM final JOIN tok USING (doc_id)
GROUP BY source ORDER BY source
"""


def q_training_pipeline_packed(spark, sf_dir):
    """Round-5 capstone composition — the corpus-to-training-batches
    pipeline using the CLUSTER form of near-dup dedup and the sequence
    packer:

        documents
          -> quality filter + eval-holdout exclusion   (as v1)
          -> exact dedup                               (as v1)
          -> near-dup CLUSTER dedup   (connected components over the
             survivor-restricted LSH pair graph; keep each cluster's
             canonical doc — the principled version of v1's
             drop-the-higher-pair-id rule: transitive near-dup chains
             collapse to ONE survivor instead of whichever pair
             orientation happened to fire)
          -> sequence packing         (two-phase prefix sum into
             SEQ_LEN-token training windows)

    Output: one row per surviving doc with its training-window layout
    (doc_id, n_tokens, seq_id, seq_offset). Fully DuckDB-oracled — the
    oracle chains the same quality/dedup CTEs into a recursive-CTE
    min-label clustering and an ANSI window cumsum."""
    from .cluster import dedup_clusters
    from .dedupe import N_EVAL_DOCS
    from .packing import pack_sequences

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quality = q_quality_score(spark, sf_dir).select("doc_id", "quality")
    kept = (
        d.select("doc_id", "text")
        .filter(F.col("doc_id") >= N_EVAL_DOCS)
        .join(quality, "doc_id")
        .filter(F.col("quality") >= QUALITY_MIN)
    )
    canon = (
        kept.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = kept.join(canon, "doc_id", "left_semi")

    ids_a = kept.select(F.col("doc_id").alias("doc_a"))
    ids_b = kept.select(F.col("doc_id").alias("doc_b"))
    pairs = (
        q_minhash_lsh_pairs(spark, sf_dir)
        .join(ids_a, "doc_a", "left_semi")
        .join(ids_b, "doc_b", "left_semi")
    )
    survivors = dedup_clusters(kept, pairs).filter(
        F.col("is_canonical") == 1
    )
    final = kept.join(survivors.select("doc_id"), "doc_id", "left_semi")
    return pack_sequences(final.select("doc_id", "text")).orderBy("doc_id")


def sql_training_pipeline_packed() -> str:
    from .dedupe import N_EVAL_DOCS, sql_lsh_pairs_ctes
    from .packing import SEQ_LEN

    quality = sql_quality_score().strip()
    return rf"""
WITH RECURSIVE q AS ({quality}),
kept0 AS (
  SELECT d.doc_id, d.text, q.quality
  FROM documents d JOIN q USING (doc_id)
  WHERE q.quality >= {QUALITY_MIN} AND d.doc_id >= {N_EVAL_DOCS}),
canon AS (SELECT min(doc_id) AS doc_id FROM kept0 GROUP BY md5(text)),
kept AS (SELECT kept0.* FROM kept0 JOIN canon USING (doc_id)),
{sql_lsh_pairs_ctes()},
surv_pairs AS (
  SELECT p.doc_a, p.doc_b FROM pairs p
  JOIN kept a ON a.doc_id = p.doc_a
  JOIN kept b ON b.doc_id = p.doc_b),
edges AS (SELECT doc_a AS u, doc_b AS v FROM surv_pairs
          UNION SELECT doc_b, doc_a FROM surv_pairs),
walk(u, lab) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) seeds
    UNION
    SELECT e.v, w.lab FROM walk w JOIN edges e ON e.u = w.u
    WHERE w.lab < e.v
),
lab AS (SELECT u AS doc_id, MIN(lab) AS cluster_id FROM walk GROUP BY u),
final AS (
  SELECT k.doc_id, k.text FROM kept k LEFT JOIN lab l USING (doc_id)
  WHERE COALESCE(l.cluster_id, k.doc_id) = k.doc_id),
t AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
      FROM final),
c AS (SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM t)
SELECT doc_id, n_tokens,
       CAST(cb // {SEQ_LEN} AS BIGINT) AS seq_id,
       CAST(cb % {SEQ_LEN} AS BIGINT) AS seq_offset
FROM c ORDER BY doc_id
"""


def q_curation_funnel(spark, sf_dir):
    """(stage, n_docs, n_tokens): the survival funnel through the prep
    pipeline — raw corpus, quality+holdout gate, exact dedup, near-dup
    cluster dedup, decontamination — the report a curation team reads to
    see where its tokens went.

    Each stage frame feeds two consumers (its own aggregate + the next
    stage), so stages are localCheckpointed: the corpus is scanned once
    and every later stage works on the previous stage's materialized
    survivor set (monotonically shrinking — at 100 TB the expensive
    shingle/cluster work runs only on quality-surviving exact-uniques).
    Decontamination is a per-doc predicate against the eval holdout, so
    filtering the stage-d survivors with the full-corpus contaminated
    set is exactly the survivor-restricted check."""
    from .cluster import dedup_clusters
    from .dedupe import N_EVAL_DOCS, decontaminate_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    base = d.select("doc_id", "text", ntok.alias("ntok"))

    def tally(stage, frame):
        return frame.agg(
            F.lit(stage).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("ntok"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select("stage", "n_docs", "n_tokens")

    quality = q_quality_score(spark, sf_dir).select("doc_id", "quality")
    s2 = (
        base.filter(F.col("doc_id") >= N_EVAL_DOCS)
        .join(quality, "doc_id")
        .filter(F.col("quality") >= QUALITY_MIN)
        .select("doc_id", "text", "ntok")
        .localCheckpoint(eager=True)
    )
    canon = (
        s2.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s3 = s2.join(canon, "doc_id", "left_semi").localCheckpoint(eager=True)
    pairs = (
        q_minhash_lsh_pairs(spark, sf_dir)
        .join(s3.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi")
        .join(s3.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi")
    )
    survivors = dedup_clusters(s3, pairs).filter(F.col("is_canonical") == 1)
    s4 = s3.join(
        survivors.select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint(eager=True)
    contaminated = decontaminate_pairs(
        d.select("doc_id", "text").filter(F.col("doc_id") < N_EVAL_DOCS),
        s4.select("doc_id", "text"),
    ).select("doc_id").distinct()
    s5 = s4.join(contaminated, "doc_id", "left_anti")

    out = (
        tally("a_raw", base)
        .unionByName(tally("b_quality_holdout", s2))
        .unionByName(tally("c_exact_dedup", s3))
        .unionByName(tally("d_neardup_dedup", s4))
        .unionByName(tally("e_decontaminated", s5))
    )
    return out.orderBy("stage")


def sql_curation_funnel() -> str:
    from .dedupe import N_EVAL_DOCS, sql_decontaminate, sql_lsh_pairs_ctes

    quality = sql_quality_score().strip()
    nt = r"CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)"
    return rf"""
WITH RECURSIVE q AS ({quality}),
base AS (SELECT doc_id, text, {nt} AS ntok FROM documents),
s2 AS (
  SELECT b.doc_id, b.text, b.ntok
  FROM base b JOIN q USING (doc_id)
  WHERE q.quality >= {QUALITY_MIN} AND b.doc_id >= {N_EVAL_DOCS}),
canon AS (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY md5(text)),
s3 AS (SELECT s2.* FROM s2 JOIN canon USING (doc_id)),
{sql_lsh_pairs_ctes()},
surv_pairs AS (
  SELECT p.doc_a, p.doc_b FROM pairs p
  JOIN s3 a ON a.doc_id = p.doc_a
  JOIN s3 b ON b.doc_id = p.doc_b),
edges AS (SELECT doc_a AS u, doc_b AS v FROM surv_pairs
          UNION SELECT doc_b, doc_a FROM surv_pairs),
walk(u, lab) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) seeds
    UNION
    SELECT e.v, w.lab FROM walk w JOIN edges e ON e.u = w.u
    WHERE w.lab < e.v
),
lab AS (SELECT u AS doc_id, MIN(lab) AS cluster_id FROM walk GROUP BY u),
s4 AS (SELECT s3.* FROM s3 LEFT JOIN lab l USING (doc_id)
       WHERE COALESCE(l.cluster_id, s3.doc_id) = s3.doc_id),
decon AS (SELECT DISTINCT doc_id FROM ({sql_decontaminate().strip()})),
s5 AS (SELECT s4.* FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM decon))
SELECT stage, n_docs, n_tokens FROM (
  SELECT 'a_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(sum(ntok), 0) AS BIGINT) AS n_tokens FROM base
  UNION ALL
  SELECT 'b_quality_holdout', CAST(count(*) AS BIGINT),
         CAST(COALESCE(sum(ntok), 0) AS BIGINT) FROM s2
  UNION ALL
  SELECT 'c_exact_dedup', CAST(count(*) AS BIGINT),
         CAST(COALESCE(sum(ntok), 0) AS BIGINT) FROM s3
  UNION ALL
  SELECT 'd_neardup_dedup', CAST(count(*) AS BIGINT),
         CAST(COALESCE(sum(ntok), 0) AS BIGINT) FROM s4
  UNION ALL
  SELECT 'e_decontaminated', CAST(count(*) AS BIGINT),
         CAST(COALESCE(sum(ntok), 0) AS BIGINT) FROM s5)
ORDER BY stage
"""


def registry() -> dict:
    return {
        "training_pipeline": (q_training_pipeline, sql_training_pipeline()),
        "training_pipeline_packed": (
            q_training_pipeline_packed,
            sql_training_pipeline_packed(),
        ),
        "curation_funnel": (q_curation_funnel, sql_curation_funnel()),
    }
