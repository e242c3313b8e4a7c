"""Exact substring deduplication: find and measure repeated L-token spans
across the corpus (the "ExactSubstr" dedup of Lee et al. 2021, *Deduplicating
Training Data Makes Language Models Better*).

The reference engine has no corpus-analytics side; this is part of the
training-data toolkit built on the same tables. The published algorithm
builds a suffix array over the concatenated corpus — inherently
single-machine. The Spark-native equivalent used here is rolling-window
hashing, the standard distributed reformulation:

1. tokenize each doc and emit every window of ``L`` consecutive tokens as
   ``(doc_id, pos, md5(span))`` — one explode, fan-out bounded by per-doc
   token count (capped at :data:`MAX_SPAN_TOKENS` BEFORE the explode);
2. one partial-aggregated ``groupBy(span_hash)`` over the whole corpus:
   occurrence count + the globally-first occurrence (min ``(doc_id, pos)``);
3. a window position is a *duplicate* when its span occurs more than once
   corpus-wide and it is NOT the globally-first occurrence — i.e. the
   first copy survives, every later copy is marked, the keep-one-copy
   semantics of the paper;
4. per-doc interval union of the marked ``[pos, pos+L-1]`` windows via
   gaps-and-islands (windows partitioned BY doc_id — never a global sort)
   gives the token count that span-cutting would remove.

Relation to the neighboring ops in :mod:`.cleaning`: ``chunk_dedup``
deduplicates NON-overlapping w-token chunks (coarse but cheap — a repeated
passage straddling a chunk boundary survives), and ``dup_ngram_profile``
only *profiles* the duplicated-gram fraction with no keep-one-copy rule.
This operator is the paper-faithful middle: overlapping windows catch
every aligned repeat, the min-occurrence rule keeps exactly one copy, and
the interval union converts marked windows into an actual
tokens-to-remove measure.

Span identity is ``md5`` of the joined window text — byte-identical in
Spark and DuckDB, so even the (negligible) collision case matches across
engines and the whole result is exactly oracle-able. At 100 TB every step
keeps this shape: the explode is linear in corpus tokens, the group-by is
one map-side-combined shuffle on the hash, the dup-marking join is a hash
equi-join on the same key (skew-free: a hash group is one span), and the
island windows are per-doc, bounded by the token cap. Nothing global,
nothing driver-side, no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: window length in tokens. 50 in the paper's setting; 8 for the oracled
#: fixture instance (the testdata docs average ~50 tokens).
SPAN_L = 8
#: per-doc token cap, enforced BEFORE the window explode in BOTH engines —
#: a pathological multi-MB doc must not fan out unboundedly. Positions are
#: therefore < 2^13, so ``doc_id * 8192 + pos`` packs the global occurrence
#: order into one BIGINT for the min-occurrence reduce. OPERATOR LIMIT
#: (same class as chunk_dedup's documented 1e6 factor): ids must satisfy
#: 0 <= doc_id < 2^50 — a full-range hash id (e.g. xxhash64) would wrap
#: the packed key silently in Spark and overflow-error in the oracle; map
#: such ids through a dense or truncated id first.
MAX_SPAN_TOKENS = 4096


def substring_dedup(
    docs: DataFrame, length: int = SPAN_L, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc repeated-span report: ``(doc_id, n_tokens, dup_windows,
    removed_tokens)`` where ``dup_windows`` counts this doc's window
    positions marked duplicate (non-first copies of a corpus-repeated
    span) and ``removed_tokens`` is the size of their interval union —
    the tokens span-cutting would drop. Docs with no duplicated span
    report zeros."""
    L = int(length)
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.slice(
            F.split(F.trim(F.col(text_col)), r"\s+"), 1, MAX_SPAN_TOKENS
        ).alias("t"),
    )
    # span hashes built INSIDE the array before the explode (the repo-wide
    # pattern: the token array never rides through the explode fan-out);
    # Spark's sequence(1, 0) auto-descends — guard short docs explicitly
    npos = F.size("t") - F.lit(L - 1)
    grams = F.transform(
        F.sequence(F.lit(1), npos),
        lambda i: F.md5(F.array_join(F.slice("t", i, F.lit(L)), " ")),
    )
    base = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.when(npos >= 1, grams)
        .otherwise(F.array().cast("array<string>"))
        .alias("_grams"),
    )
    wins = base.select(
        "doc_id",
        F.posexplode("_grams").alias("_p0", "h"),
    ).select(
        "doc_id",
        (F.col("_p0") + 1).alias("i"),
        "h",
        (
            F.col("doc_id") * F.lit(MAX_SPAN_TOKENS * 2) + F.col("_p0") + 1
        ).alias("_ord"),
    )
    groups = wins.groupBy("h").agg(
        F.count("*").alias("c"), F.min("_ord").alias("_first")
    )
    dups = (
        wins.join(groups.filter(F.col("c") > 1), "h")
        .filter(F.col("_ord") != F.col("_first"))
        .select("doc_id", "i")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    isl = (
        dups.withColumn("_lag", F.lag("i").over(w))
        .withColumn(
            "_brk",
            F.when(
                F.col("_lag").isNull() | (F.col("i") - F.col("_lag") > L),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_isl",
            F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "_isl")
        .agg((F.max("i") - F.min("i") + F.lit(L)).alias("_span"))
        .groupBy("doc_id")
        .agg(F.sum("_span").cast("long").alias("removed_tokens"))
    )
    per_doc = dups.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("dup_windows")
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(per_doc, "doc_id", "left")
        .join(isl, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_windows", F.lit(0)).cast("long").alias(
                "dup_windows"
            ),
            F.coalesce("removed_tokens", F.lit(0)).cast("long").alias(
                "removed_tokens"
            ),
        )
    )


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled instance over the documents table."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return substring_dedup(d).orderBy("doc_id")


SQL_SUBSTRING_DEDUP = rf"""
WITH toks AS (
  SELECT doc_id, list_slice(string_split_regex(trim(text), '\s+'),
                            1, {MAX_SPAN_TOKENS}) AS t
  FROM documents),
base AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, t FROM toks),
wins AS (
  SELECT doc_id, i,
         md5(array_to_string(t[i:i+{SPAN_L - 1}], ' ')) AS h,
         doc_id * {MAX_SPAN_TOKENS * 2} + i AS _ord
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - {SPAN_L} + 2)) AS i
        FROM base)),
grp AS (
  SELECT h, count(*) AS c, min(_ord) AS _first FROM wins GROUP BY h),
dups AS (
  SELECT w.doc_id, w.i
  FROM wins w JOIN grp g USING (h)
  WHERE g.c > 1 AND w._ord <> g._first),
isl AS (
  SELECT doc_id, i,
         CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
                   OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                      > {SPAN_L}
              THEN 1 ELSE 0 END AS _brk
  FROM dups),
isl2 AS (
  SELECT doc_id, i,
         sum(_brk) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS UNBOUNDED PRECEDING) AS _isl
  FROM isl),
spans AS (
  SELECT doc_id, _isl, max(i) - min(i) + {SPAN_L} AS _span
  FROM isl2 GROUP BY doc_id, _isl),
rem AS (
  SELECT doc_id, CAST(sum(_span) AS BIGINT) AS removed_tokens
  FROM spans GROUP BY doc_id),
dw AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows
  FROM dups GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
       CAST(COALESCE(dw.dup_windows, 0) AS BIGINT) AS dup_windows,
       CAST(COALESCE(rem.removed_tokens, 0) AS BIGINT) AS removed_tokens
FROM base b
LEFT JOIN dw USING (doc_id)
LEFT JOIN rem USING (doc_id)
ORDER BY doc_id
"""


def registry() -> dict:
    return {
        "substring_dedup": (q_substring_dedup, SQL_SUBSTRING_DEDUP),
    }
