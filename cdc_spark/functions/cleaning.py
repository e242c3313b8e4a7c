"""Corpus cleaning operators for training-data pipelines: PII redaction,
span-level exact dedup, and duplicate-substring profiling.

These are the scrubbing passes that run BEFORE near-dup detection in a
production data pipeline (C4 / Dolma / RefinedWeb style):

- :func:`pii_redact` — regex redaction of emails / IPv4s / phone numbers,
  with per-doc match counts. Pure ``regexp_replace`` / ``regexp_count``
  column expressions (whole-stage codegen; the regexes are written to the
  Java-regex/RE2 common subset so the DuckDB oracle is exact).
- :func:`chunk_dedup` — exact dedup at sub-document granularity: documents
  are chunked into fixed token windows, each chunk is kept only at its
  first (doc_id, chunk_idx) occurrence corpus-wide, and the surviving text
  is reassembled. This is the "paragraph dedup" pass of newline-structured
  corpora (Dolma dedupes on ``\\n``-split paragraphs); the fixture corpus
  has no paragraph breaks, so the operator chunks on token windows — the
  splitter is an argument.
- :func:`dup_ngram_profile` — per-document duplicate-substring rate at
  word n-gram granularity (the signal behind "deduplicating training data
  makes LMs better", Lee et al. 2022, approximating their suffix-array
  substring scan with fixed-width n-grams): which fraction of a document's
  n-grams also appear in at least one OTHER document.

100 TB shape: every operator is explode -> partial-aggregated groupBy ->
equi-join back, all keyed by chunk/gram content — map-side combine does
the heavy lifting, nothing is collected to the driver, and no step is
corpus x corpus. In production the groupBy key would be
``xxhash64(chunk)`` (8 bytes) rather than the chunk text; the oracled
queries group on the text itself so the DuckDB comparison is exact —
the plan shape is identical either way.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: Java-regex/RE2 common-subset patterns (no lookaround, no backrefs)
RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
RE_PHONE = r"\b555-\d{4}\b"

#: replacement tokens, in application order (emails first: an address
#: contains dotted runs an IP pattern could otherwise nibble at)
REDACTIONS = [
    (RE_EMAIL, "<EMAIL>", "n_emails"),
    (RE_IPV4, "<IP>", "n_ips"),
    (RE_PHONE, "<PHONE>", "n_phones"),
]


def pii_redact(docs, text_col: str = "text"):
    """Append redaction-count columns and replace PII in ``text_col`` with
    typed placeholder tokens. One map-side projection, no shuffle."""
    out = docs
    red = F.col(text_col)
    for pat, token, cnt in REDACTIONS:
        out = out.withColumn(
            cnt, F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        )
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("redacted", red)


def q_pii_redact(spark, sf_dir):
    """Oracled instance. The fixture corpus carries no PII, so the query
    PLANTS it deterministically (same expression in both engines) before
    redacting — the operator under test is the redaction, the planting
    just gives it non-trivial input: every 3rd doc gains an email, every
    4th an IPv4, every 5th a phone number (all doc_id-derived)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod("doc_id", F.lit(4)) == 0,
            F.concat(
                F.lit(" from 10."),
                F.pmod("doc_id", F.lit(200)).cast("string"),
                F.lit(".0.42"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod("doc_id", F.lit(5)) == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad(F.pmod("doc_id", F.lit(10000)).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return (
        pii_redact(d.select("doc_id", planted.alias("text")))
        .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
        .orderBy("doc_id")
    )


def sql_pii_redact() -> str:
    planted = (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN"
        " ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 4 = 0 THEN"
        " ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.42'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN"
        " ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " ELSE '' END"
    )
    red = "t"
    counts = []
    for pat, token, cnt in REDACTIONS:
        counts.append(
            f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS {cnt}"
        )
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
WITH p AS (SELECT doc_id, {planted} AS t FROM documents)
SELECT doc_id, {', '.join(counts)}, {red} AS redacted
FROM p ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# span-level exact dedup
# ---------------------------------------------------------------------------

#: chunk width in whitespace tokens
CHUNK_TOKENS = 16


def _chunks_expr(text_col, w: int):
    """array<struct<idx,chunk>>: the document split into non-overlapping
    ``w``-token windows (the last window may be short)."""
    t = F.split(F.trim(text_col), r"\s+")
    n_chunks = F.ceil(F.size(t) / F.lit(float(w))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("idx"),
            F.array_join(F.slice(t, i * w + 1, w), " ").alias("chunk"),
        ),
    )


def chunk_dedup(docs, text_col: str = "text", w: int = CHUNK_TOKENS):
    """Span-level exact dedup: (doc_id, n_chunks, n_dup_chunks, kept_text).

    Every ``w``-token window is owned by its FIRST corpus occurrence
    (minimum (doc_id, chunk_idx)); later occurrences are dropped and the
    survivors reassemble in order. Deterministic — the keep rule is a
    pure MIN, independent of partitioning. Plan: explode -> groupBy(chunk)
    with a partial-aggregated MIN -> equi-join back -> per-doc agg."""
    ch = docs.select(
        "doc_id", F.explode(_chunks_expr(F.col(text_col), w)).alias("c")
    ).select("doc_id", F.col("c.idx").alias("idx"), F.col("c.chunk").alias("chunk"))
    # encode the (doc_id, idx) keep rule as one comparable long (idx is
    # bounded far below the factor; documented operator limit)
    okey = (F.col("doc_id") * F.lit(1_000_000) + F.col("idx")).alias("okey")
    owners = (
        ch.select("chunk", okey)
        .groupBy("chunk")
        .agg(F.min("okey").alias("owner"))
    )
    flagged = ch.join(owners, "chunk").withColumn(
        "owned",
        F.col("owner") == F.col("doc_id") * F.lit(1_000_000) + F.col("idx"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum((~F.col("owned")).cast("int")).cast("long").alias("n_dup_chunks"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("owned"),
                                F.struct(F.col("idx"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda x: x["chunk"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("kept_text"),
    )


def q_chunk_dedup(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_dedup(d.select("doc_id", "text")).orderBy("doc_id")


def sql_chunk_dedup(w: int = CHUNK_TOKENS) -> str:
    return rf"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
idx AS (SELECT doc_id, t,
               unnest(range(0, CAST(ceil(len(t) / {w}.0) AS INT))) AS i
        FROM toks),
ch AS (SELECT doc_id, i AS idx,
              array_to_string(t[i*{w}+1 : (i+1)*{w}], ' ') AS chunk
       FROM idx),
own AS (SELECT chunk, MIN(doc_id * 1000000 + idx) AS owner
        FROM ch GROUP BY chunk),
fl AS (SELECT ch.doc_id, ch.idx, ch.chunk,
              (own.owner = ch.doc_id * 1000000 + ch.idx) AS owned
       FROM ch JOIN own USING (chunk))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN owned THEN 0 ELSE 1 END) AS BIGINT)
           AS n_dup_chunks,
       COALESCE(string_agg(chunk, ' ' ORDER BY idx)
                FILTER (WHERE owned), '') AS kept_text
FROM fl GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# duplicate-substring profiling
# ---------------------------------------------------------------------------

#: word n-gram width for the substring-duplication scan
DUP_NGRAM = 8


def dup_ngram_profile(docs, text_col: str = "text", n: int = DUP_NGRAM):
    """(doc_id, n_grams, dup_grams, dup_frac): which fraction of a doc's
    positional word ``n``-grams also occur in at least one OTHER document.
    Docs shorter than ``n`` tokens contribute one whole-doc gram. The
    inter-doc test is two cheap aggregations (per-(doc, gram) counts,
    then docs-per-gram — count-distinct-free because the first groupBy
    already made rows unique per doc), joined back to the per-doc counts."""
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    g = docs.select("doc_id", F.explode(grams).alias("gram"))
    per_doc = g.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    docs_per = per_doc.groupBy("gram").agg(F.count("*").alias("n_docs"))
    joined = per_doc.join(docs_per, "gram")
    return joined.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.sum(F.when(F.col("n_docs") >= 2, F.col("c")).otherwise(0))
        .cast("long")
        .alias("dup_grams"),
        F.round(
            F.sum(F.when(F.col("n_docs") >= 2, F.col("c")).otherwise(0))
            / F.sum("c"),
            4,
        ).alias("dup_frac"),
    )


def q_dup_ngram_profile(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dup_ngram_profile(d.select("doc_id", "text")).orderBy("doc_id")


def sql_dup_ngram_profile(n: int = DUP_NGRAM) -> str:
    return rf"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
pos AS (SELECT doc_id, t,
               unnest(range(1, greatest(len(t) - {n - 1}, 1) + 1)) AS i
        FROM toks),
g AS (SELECT doc_id, array_to_string(t[i : i+{n - 1}], ' ') AS gram FROM pos),
pd AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
dp AS (SELECT gram, count(*) AS n_docs FROM pd GROUP BY gram),
j AS (SELECT pd.doc_id, pd.c, dp.n_docs FROM pd JOIN dp USING (gram))
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS BIGINT)
           AS dup_grams,
       round(sum(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) / sum(c), 4)
           AS dup_frac
FROM j GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# self-trained bigram LM surprisal (the CCNet / KenLM perplexity filter)
# ---------------------------------------------------------------------------

#: interpolation weight of the bigram MLE term (backoff carries the rest)
LM_LAMBDA = "CAST(0.9 AS DOUBLE)"
LM_BACKOFF = "CAST(0.1 AS DOUBLE)"


def lm_surprisal(docs, text_col: str = "text"):
    """(doc_id, n_tokens, avg_surprisal_x1e6): per-document mean token
    surprisal under an interpolated bigram LM *trained on the corpus
    itself* — the CCNet/KenLM-style perplexity quality filter
    (Wenzek et al. 2020), self-contained so no external model file is
    needed. High surprisal = unusual token sequences (boilerplate noise,
    lorem soup); low = fluent in-distribution text.

    Model: ``p(w | u) = 0.9 * B(u,w)/U(u) + 0.1 * U(w)/T`` (document-first
    tokens score on the unigram term alone), where ``U`` are unigram
    counts, ``B`` bigram counts, ``T`` the corpus token total. ``B <= U``
    and ``U <= T`` so ``p`` is always in ``(0, 1]``.

    Per-token surprisal is floored into integer micro-nats
    (``floor(-ln(p) * 1e6)``) BEFORE summing: double additions are not
    associative, so summing floats across rows would make the result
    depend on partition order and diverge from the sequential DuckDB
    oracle — integer sums are exact and order-free. The single ``ln`` is
    computed from bit-identical integer ratios in both engines.

    100 TB shape: two partial-aggregated groupBys build the model (vocab-
    and bigram-vocab-sized — tiny next to the corpus), then three
    equi-joins score the exploded token stream. Zipf-hot tokens skew the
    join keys; the model side has ONE row per key so AQE's skew split
    handles it. ``T`` is one O(1) control-plane read."""
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t)),
                lambda i: F.struct(
                    F.element_at(t, i).alias("cur"),
                    F.when(i > 1, F.element_at(t, i - 1)).alias("prev"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.cur", "g.prev")
    # the token stream feeds THREE consumers (unigram model, bigram model,
    # the scoring join base) and its lineage holds the interpreted
    # transform/struct explode — checkpoint it so the corpus is tokenized
    # once per call (same multi-consumer rule as corpus.py; measured
    # 10.6 s -> ~4 s at sf0.1)
    toks = toks.localCheckpoint()
    uni = toks.groupBy("cur").agg(F.count("*").alias("u_cur"))
    # T = corpus token total (== sum(u_cur)); one cheap scan-level agg,
    # folded back into the scoring expression as a literal
    total = int(docs.agg(F.sum(F.size(t))).head()[0] or 0)
    big = (
        toks.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("b"))
    )
    scored = (
        toks.join(uni, "cur")
        .join(
            uni.select(F.col("cur").alias("prev"), F.col("u_cur").alias("u_prev")),
            "prev",
            "left",
        )
        .join(big, ["prev", "cur"], "left")
        .withColumn(
            "p",
            F.expr(
                f"CASE WHEN prev IS NULL"
                f" THEN CAST(u_cur AS DOUBLE) / CAST({total} AS DOUBLE)"
                f" ELSE {LM_LAMBDA} * (CAST(coalesce(b, 0) AS DOUBLE)"
                f"                     / CAST(u_prev AS DOUBLE))"
                f"    + {LM_BACKOFF} * (CAST(u_cur AS DOUBLE)"
                f"                      / CAST({total} AS DOUBLE)) END"
            ),
        )
        .withColumn(
            "s_x1e6",
            F.expr("CAST(floor((-ln(p)) * CAST(1000000 AS DOUBLE)) AS BIGINT)"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.expr("sum(s_x1e6) DIV count(*)").cast("long").alias(
            "avg_surprisal_x1e6"
        ),
    )


def q_lm_surprisal(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lm_surprisal(d.select("doc_id", "text")).orderBy("doc_id")


def sql_lm_surprisal() -> str:
    return rf"""
WITH toks0 AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
               FROM documents),
pos AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks0),
toks AS (SELECT doc_id, t[i] AS cur,
                CASE WHEN i > 1 THEN t[i-1] END AS prev
         FROM pos),
uni AS (SELECT cur, count(*) AS u_cur FROM toks GROUP BY cur),
tot AS (SELECT CAST(sum(u_cur) AS BIGINT) AS total FROM uni),
big AS (SELECT prev, cur, count(*) AS b FROM toks
        WHERE prev IS NOT NULL GROUP BY prev, cur),
sc AS (
  SELECT toks.doc_id,
         CASE WHEN toks.prev IS NULL
              THEN CAST(uni.u_cur AS DOUBLE) / CAST(tot.total AS DOUBLE)
              ELSE {LM_LAMBDA} * (CAST(coalesce(big.b, 0) AS DOUBLE)
                                  / CAST(up.u_cur AS DOUBLE))
                 + {LM_BACKOFF} * (CAST(uni.u_cur AS DOUBLE)
                                   / CAST(tot.total AS DOUBLE)) END AS p
  FROM toks
  JOIN uni USING (cur)
  CROSS JOIN tot
  LEFT JOIN uni up ON up.cur = toks.prev
  LEFT JOIN big ON big.prev = toks.prev AND big.cur = toks.cur)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(floor((-ln(p)) * CAST(1000000 AS DOUBLE)) AS BIGINT))
            // count(*) AS BIGINT) AS avg_surprisal_x1e6
FROM sc GROUP BY doc_id ORDER BY doc_id
"""


def registry() -> dict:
    return {
        "pii_redact": (q_pii_redact, sql_pii_redact()),
        "chunk_dedup": (q_chunk_dedup, sql_chunk_dedup()),
        "dup_ngram_profile": (q_dup_ngram_profile, sql_dup_ngram_profile()),
        "lm_surprisal": (q_lm_surprisal, sql_lm_surprisal()),
    }
