"""Dedup clustering: connected components over near-dup candidate pairs.

Pair emission (MinHash / SimHash / embedding LSH) finds EDGES; an actual
dedup pass needs the transitive closure — groups of mutually-near docs —
so it can keep one canonical document per group. At 100 TB the component
graph does not fit one machine and its diameter is unbounded (chains of
gradually-mutated documents), so naive min-label propagation (O(diameter)
rounds) is the wrong shape. This module implements the alternating
**large-star / small-star** algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014): every round is two
key-partitioned aggregations + equi-joins over the current edge set —
no driver-side graph state, no broadcast of anything corpus-sized — and
it converges in O(log^2 n) rounds regardless of diameter. Each round's
frame is eagerly checkpointed to keep lineage (and thus planning time)
constant across iterations.

Output labels are deterministic: every node's ``cluster_id`` is the
MINIMUM doc_id in its component, so "keep the canonical doc" is simply
``doc_id == cluster_id`` — stable across runs, partitionings, and
cluster sizes, which is what makes the result oracle-able in ANSI SQL
(a recursive CTE computing min-reachable-label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

#: alternating-star round budget. The algorithm converges in
#: O(log^2 n) rounds; 40 covers any corpus that could physically exist
#: (2^(sqrt(40)) docs is already beyond 10^18). Non-convergence within the
#: budget therefore indicates a bug, and raises rather than returning a
#: silently-partial clustering.
MAX_CC_ROUNDS = 40

_LABEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("cluster_id", LongType(), False),
    ]
)

#: stats of the most recent connected_components() call (same pattern as
#: LakeTable.last_scan_stats): rounds to convergence + edge counts —
#: consumed by bench_cluster.py's scale probe and available for plan
#: assertions in tests
LAST_CC_STATS: dict = {}


def _edge_stats(e: DataFrame) -> tuple[int, int]:
    """Order-independent fingerprint of an edge set (count + xor of row
    hashes; xor cannot overflow under ANSI mode and the set is distinct,
    so no self-cancellation) — one partial-aggregated job, used as the
    convergence test."""
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).head()
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = MAX_CC_ROUNDS,
) -> DataFrame:
    """(doc_id, cluster_id) for every node appearing in ``pairs``;
    ``cluster_id`` is the component's minimum doc_id.

    Alternating large-star / small-star on the undirected edge set:

    - **large-star**: every node connects its strictly-LARGER neighbors to
      its minimum incident node ``m = min({u} U neighbors(u))``;
    - **small-star**: edges oriented larger->smaller; every node connects
      its smaller neighbors AND ITSELF to that minimum.

    Both steps preserve connectivity and never create an edge to a larger
    node, so the edge set monotonically "falls" toward each component's
    minimum; at fixpoint every component is a star centered on it. Each
    step is groupBy(min) + equi-join over the edges — partial aggregation
    handles the high-degree star roots map-side, and nothing is collected
    to the driver. Isolated docs (no pairs) are absent from the result by
    construction; callers left-join and coalesce to the doc's own id.
    """
    spark = pairs.sparkSession
    half = pairs.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    # canonical undirected form (hi -> lo); star-steps below maintain it
    e = (
        half.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _edge_stats(e)
    LAST_CC_STATS.clear()
    LAST_CC_STATS.update(input_edges=prev[0], rounds=0)
    if prev[0] == 0:
        return spark.createDataFrame([], _LABEL_SCHEMA)

    for rnd in range(max_rounds):
        # ---- large-star: for each u, attach strictly-larger neighbors to
        # m = min(u, min(neighbors)). Work on the symmetric view so every
        # node sees its full neighborhood.
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
        )
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e = (
            ls.filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # ---- small-star: edges already oriented hi -> lo; attach each
        # node's smaller neighbors and the node itself to its minimum.
        smins = e.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            e.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select(F.col("u"), F.col("m").alias("v")))
        )
        e = (
            ss.filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _edge_stats(e)
        LAST_CC_STATS.update(rounds=rnd + 1, final_edges=cur[0])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # fixpoint is a star forest: every edge is (leaf, root). Roots appear
    # only on the v side; they label themselves.
    return (
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
        .unionByName(
            e.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id"))
        )
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def dedup_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Full-corpus dedup verdict: (doc_id, cluster_id, is_canonical) for
    EVERY doc — singletons cluster with themselves, and exactly one doc
    per cluster (the minimum id) is canonical. ``docs`` needs a ``doc_id``
    column; ``pairs`` is any (doc_a, doc_b) near-dup pair frame. The
    survivors of a dedup pass are ``is_canonical = 1``."""
    cc = connected_components(pairs)
    lab = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            lab.alias("cluster_id"),
            (lab == F.col("doc_id")).cast("int").alias("is_canonical"),
        )
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled instance: cluster the MinHash LSH pair graph on the
    documents table and emit every doc's cluster + canonical flag. The
    oracle computes the same min-label components with a recursive CTE
    over the identical pair SQL."""
    from .dedupe import q_minhash_lsh_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    return dedup_clusters(d, pairs).orderBy("doc_id")


def sql_dedup_clusters() -> str:
    """Recursive min-label propagation over the LSH pair CTEs: seed every
    node with its own id, propagate labels along edges (pruned to labels
    smaller than the target — larger ones can never win the MIN), take the
    per-node minimum. The component minimum reaches every member because
    each hop's target is larger than it."""
    from .dedupe import sql_lsh_pairs_ctes

    return f"""
WITH RECURSIVE {sql_lsh_pairs_ctes()},
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
walk(u, lab) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) seeds
    UNION
    SELECT e.v, w.lab FROM walk w JOIN edges e ON e.u = w.u
    WHERE w.lab < e.v
),
lab AS (SELECT u AS doc_id, MIN(lab) AS cluster_id FROM walk GROUP BY u)
SELECT d.doc_id,
       COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
       CAST(CASE WHEN COALESCE(l.cluster_id, d.doc_id) = d.doc_id
            THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM documents d LEFT JOIN lab l USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# keep-best survivor selection + leakage-safe splits (built on the clusters)
# ---------------------------------------------------------------------------

#: leakage-safe split fractions, in tenths of a percent of the hash space:
#: h < 50 -> test (5%), h < 150 -> validation (10%), else train (85%).
SPLIT_TEST_LT = 50
SPLIT_VAL_LT = 150
#: bounded mixing arithmetic: (cluster_id % 1000003) * 131 + 7 stays under
#: ~1.3e8, so the expression never overflows BIGINT in either engine.
_SPLIT_PRIME = 1_000_003
_SPLIT_MULT = 131
_SPLIT_ADD = 7


def quality_int(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``quality_x1e3`` — an INTEGER (0..1000) replica of
    ``text.q_quality_score``'s three signals (length, stopword density,
    mean token length), scaled x1000 and kept in BIGINT space end to end
    so a ranking decided by it is bit-reproducible across engines and
    partitionings (the same integer-space discipline as
    ``corpus.tfidf_topk`` / ``cleaning.lm_surprisal``):

    - length:    ``least(toks, 100) * 4``                      (0..400)
    - stopwords: ``least((stops * 1500) div toks, 300)``       (0..300)
    - mean tok:  ``300 if 3*toks <= chars <= 8*toks else 0``   (0|300)

    ``toks >= 1`` always (both engines split empty text into one empty
    token), so the integer division is total. Pure column expressions —
    whole-stage codegen, no shuffle."""
    from .text import _STOPWORDS, _hits, _padded

    col = F.col(text_col)
    p = _padded(col)
    toks = F.size(F.split(F.trim(col), r"\s+")).cast("long")
    stops = sum(
        [_hits(p, w) for ws in _STOPWORDS.values() for w in ws],
        F.lit(0).cast("long"),
    )
    chars = F.length(F.regexp_replace(col, r"\s+", "")).cast("long")
    staged = docs.withColumns(
        {"_toks": toks, "_stops": stops, "_chars": chars}
    )
    q = (
        F.least(F.col("_toks"), F.lit(100)) * 4
        + F.least(F.expr("(_stops * 1500) div _toks"), F.lit(300))
        + F.when(
            (F.col("_chars") >= 3 * F.col("_toks"))
            & (F.col("_chars") <= 8 * F.col("_toks")),
            300,
        ).otherwise(0)
    )
    return staged.withColumn("quality_x1e3", q.cast("long")).drop(
        "_toks", "_stops", "_chars"
    )


def _sql_quality_int() -> str:
    """DuckDB CTE body computing the identical integer quality per doc:
    ``(SELECT doc_id, quality_x1e3 FROM ...)``."""
    from .text import _STOPWORDS, _sql_hits

    p = "(' ' || lower(text) || ' ')"
    stop_sum = " + ".join(
        _sql_hits(p, w) for ws in _STOPWORDS.values() for w in ws
    )
    return rf"""(
  SELECT doc_id,
         CAST(least(toks, 100) * 4
              + least((stops * 1500) // toks, 300)
              + CASE WHEN chars BETWEEN 3 * toks AND 8 * toks
                     THEN 300 ELSE 0 END AS BIGINT) AS quality_x1e3
  FROM (SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks,
               CAST({stop_sum} AS BIGINT) AS stops,
               CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS chars
        FROM documents) t)"""


def cluster_canonical(
    docs: DataFrame, pairs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Keep-BEST dedup survivor selection: (doc_id, cluster_id,
    canonical_id, quality_x1e3, keep) for every doc, where each near-dup
    cluster's canonical is its highest-``quality_x1e3`` member (ties to
    the smaller doc_id) — what a production dedup pass actually keeps,
    versus ``dedup_clusters``'s arbitrary min-id convention.

    100 TB shape: components are O(log^2 n) key-partitioned rounds, the
    quality signal is a pure projection, survivor election is ONE
    partial-aggregated ``max_by`` groupBy on cluster_id (no window over
    the corpus), and the map back to members is an equi-join on the
    cluster key. Nothing is collected to the driver."""
    labs = dedup_clusters(docs, pairs)
    qi = quality_int(docs.select("doc_id", text_col), text_col).select(
        "doc_id", "quality_x1e3"
    )
    scored = labs.join(qi, "doc_id")
    canon = scored.groupBy("cluster_id").agg(
        F.expr("max_by(doc_id, struct(quality_x1e3, -doc_id))").alias(
            "canonical_id"
        )
    )
    return scored.join(canon, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "canonical_id",
        "quality_x1e3",
        (F.col("doc_id") == F.col("canonical_id")).cast("int").alias("keep"),
    )


def q_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled instance over the MinHash LSH pair graph on documents."""
    from .dedupe import q_minhash_lsh_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    return cluster_canonical(d, pairs).orderBy("doc_id")


def sql_cluster_canonical() -> str:
    from .dedupe import sql_lsh_pairs_ctes

    return f"""
WITH RECURSIVE {sql_lsh_pairs_ctes()},
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
walk(u, lab) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) seeds
    UNION
    SELECT e.v, w.lab FROM walk w JOIN edges e ON e.u = w.u
    WHERE w.lab < e.v
),
lab AS (SELECT u AS doc_id, MIN(lab) AS cluster_id FROM walk GROUP BY u),
qi AS {_sql_quality_int()},
scored AS (
    SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
           qi.quality_x1e3
    FROM documents d LEFT JOIN lab l USING (doc_id) JOIN qi USING (doc_id)),
canon AS (
    SELECT cluster_id, doc_id AS canonical_id FROM (
        SELECT cluster_id, doc_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY quality_x1e3 DESC, doc_id ASC)
                   AS rn
        FROM scored) t
    WHERE rn = 1)
SELECT s.doc_id, s.cluster_id, c.canonical_id, s.quality_x1e3,
       CAST(CASE WHEN s.doc_id = c.canonical_id THEN 1 ELSE 0 END AS INT)
           AS keep
FROM scored s JOIN canon c USING (cluster_id)
ORDER BY doc_id
"""


def leakage_safe_split(labels: DataFrame) -> DataFrame:
    """Train/validation/test assignment that can never leak near-dups
    across splits: the split is a deterministic function of the CLUSTER
    label, not the doc, so every member of a near-dup cluster lands in
    the same split (hashing doc_ids instead — the naive approach — puts
    ~2·p·(1-p) of every cluster's duplicated mass on the wrong side of
    the eval boundary). ``labels`` is any (doc_id, cluster_id) frame,
    e.g. ``dedup_clusters`` output.

    The bucket is bounded integer arithmetic (identical in Spark and
    DuckDB, no engine hash), a pure projection — zero shuffle on top of
    the clustering."""
    h = (
        (F.col("cluster_id") % _SPLIT_PRIME) * _SPLIT_MULT + _SPLIT_ADD
    ) % 1000
    return labels.select(
        "doc_id",
        "cluster_id",
        h.cast("long").alias("h_bucket"),
        F.when(h < SPLIT_TEST_LT, "test")
        .when(h < SPLIT_VAL_LT, "validation")
        .otherwise("train")
        .alias("split"),
    )


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedupe import q_minhash_lsh_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    return leakage_safe_split(dedup_clusters(d, pairs)).orderBy("doc_id")


def sql_leakage_safe_split() -> str:
    from .dedupe import sql_lsh_pairs_ctes

    return f"""
WITH RECURSIVE {sql_lsh_pairs_ctes()},
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
walk(u, lab) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) seeds
    UNION
    SELECT e.v, w.lab FROM walk w JOIN edges e ON e.u = w.u
    WHERE w.lab < e.v
),
lab AS (SELECT u AS doc_id, MIN(lab) AS cluster_id FROM walk GROUP BY u),
labs AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
         FROM documents d LEFT JOIN lab l USING (doc_id)),
h AS (SELECT doc_id, cluster_id,
             CAST(((cluster_id % {_SPLIT_PRIME}) * {_SPLIT_MULT}
                   + {_SPLIT_ADD}) % 1000 AS BIGINT) AS h_bucket
      FROM labs)
SELECT doc_id, cluster_id, h_bucket,
       CASE WHEN h_bucket < {SPLIT_TEST_LT} THEN 'test'
            WHEN h_bucket < {SPLIT_VAL_LT} THEN 'validation'
            ELSE 'train' END AS split
FROM h ORDER BY doc_id
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023, made
    deterministic): embedding-cosine near-dup pairs (multi-band hyperplane
    LSH blocking, exact-cosine confirmed) are clustered by connected
    components and exactly one vector per semantic cluster — the minimum
    vec_id — survives as canonical. The same engine pieces as the text
    path (``embedding_neardup_pairs`` + ``connected_components``), composed
    over the embeddings table: at 100 TB the pair generation is bucketed
    equi-joins and the clustering is O(log^2 n) key-partitioned rounds."""
    from .similarity import q_embedding_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = q_embedding_neardup_pairs(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return (
        dedup_clusters(e.select(F.col("vec_id").alias("doc_id")), pairs)
        .select(
            F.col("doc_id").alias("vec_id"), "cluster_id", "is_canonical"
        )
        .orderBy("vec_id")
    )


def sql_semantic_dedup() -> str:
    from .similarity import EMB_DIM, sql_emb_pairs_ctes

    return f"""
WITH RECURSIVE {sql_emb_pairs_ctes(EMB_DIM)},
edges AS (SELECT vec_a AS u, vec_b AS v FROM pairs
          UNION SELECT vec_b, vec_a FROM pairs),
walk(u, lab) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM edges) seeds
    UNION
    SELECT eg.v, w.lab FROM walk w JOIN edges eg ON eg.u = w.u
    WHERE w.lab < eg.v
),
lab AS (SELECT u AS vec_id, MIN(lab) AS cluster_id FROM walk GROUP BY u)
SELECT emb.vec_id,
       COALESCE(l.cluster_id, emb.vec_id) AS cluster_id,
       CAST(CASE WHEN COALESCE(l.cluster_id, emb.vec_id) = emb.vec_id
            THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM embeddings emb LEFT JOIN lab l USING (vec_id)
ORDER BY vec_id
"""


def registry() -> dict:
    return {
        "dedup_clusters": (q_dedup_clusters, sql_dedup_clusters()),
        "semantic_dedup": (q_semantic_dedup, sql_semantic_dedup()),
        "cluster_canonical": (q_cluster_canonical, sql_cluster_canonical()),
        "leakage_safe_split": (
            q_leakage_safe_split,
            sql_leakage_safe_split(),
        ),
    }
