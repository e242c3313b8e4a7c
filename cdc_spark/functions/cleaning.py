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


def registry() -> dict:
    return {
        "pii_redact": (q_pii_redact, sql_pii_redact()),
        "chunk_dedup": (q_chunk_dedup, sql_chunk_dedup()),
        "dup_ngram_profile": (q_dup_ngram_profile, sql_dup_ngram_profile()),
    }
