"""Text analysis for training-data pipelines: language-ID heuristic, quality
scoring, token counting, document fingerprinting. All built-in column
expressions (whole-stage codegen), each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

_STOPWORDS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "que"),
    "fr": ("le", "et", "les"),
    "de": ("der", "und", "die"),
}


def _padded(col):
    return F.concat(F.lit(" "), F.lower(col), F.lit(" "))


def _hits(col, word: str):
    """Occurrences of ' word ' via the length-difference trick (portable)."""
    needle = f" {word} "
    return (
        (F.length(col) - F.length(F.regexp_replace(col, needle, " ")))
        / (len(needle) - 1)
    ).cast("long")


def _sql_hits(expr: str, word: str) -> str:
    needle = f" {word} "
    return (
        f"CAST((length({expr}) - length(replace({expr}, '{needle}', ' '))) "
        f"/ {len(needle) - 1} AS BIGINT)"
    )


def q_lang_id(spark, sf_dir):
    """n-gram/stopword language-ID heuristic: per-language stopword hit
    counts, argmax with deterministic tie-break (language name order)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _padded(F.col("text"))
    scores = {
        lang: sum([_hits(p, w) for w in words], F.lit(0).cast("long"))
        for lang, words in _STOPWORDS.items()
    }
    langs = sorted(_STOPWORDS)
    guess = F.lit("unknown")
    # reversed so earlier languages win ties
    best = F.greatest(*[scores[lg] for lg in langs])
    for lg in reversed(langs):
        guess = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(guess)
    out = d.select(
        "doc_id",
        *[scores[lg].alias(f"s_{lg}") for lg in langs],
        guess.alias("lang_guess"),
    )
    return out.orderBy("doc_id")


def sql_lang_id() -> str:
    langs = sorted(_STOPWORDS)
    p = "(' ' || lower(text) || ' ')"
    score_exprs = {
        lg: " + ".join(_sql_hits(p, w) for w in _STOPWORDS[lg]) for lg in langs
    }
    selects = ", ".join(f"CAST({score_exprs[lg]} AS BIGINT) AS s_{lg}" for lg in langs)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    guess = "CASE "
    for lg in langs:
        guess += f"WHEN s_{lg} = {best} AND {best} > 0 THEN '{lg}' "
    guess += "ELSE 'unknown' END"
    return f"""
WITH s AS (SELECT doc_id, {selects} FROM documents)
SELECT doc_id, {', '.join('s_' + lg for lg in langs)}, {guess} AS lang_guess
FROM s ORDER BY doc_id
"""


def q_token_count(spark, sf_dir):
    """Token counting: whitespace tokens, BPE-ish regex word pieces
    (alnum runs / punctuation as separate tokens), and a chars/4 subword
    estimate."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    # BPE-ish regex: alphanumeric runs and single punctuation marks both
    # count as tokens (GPT-style pre-tokenization shape)
    pieces = F.size(
        F.filter(
            F.split(F.regexp_replace(F.col("text"), r"([^\sa-zA-Z0-9])", r" $1 "), r"\s+"),
            lambda x: F.length(x) > 0,
        )
    )
    chars = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    return d.select(
        "doc_id",
        toks.cast("long").alias("n_tokens"),
        pieces.cast("long").alias("n_re_pieces"),
        chars.cast("long").alias("n_chars_nospace"),
        F.ceil(chars / F.lit(4.0)).cast("long").alias("n_bpe_est"),
    ).orderBy("doc_id")


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(string_split_regex(regexp_replace(text, '([^\sa-zA-Z0-9])', ' \1 ', 'g'), '\s+'), x -> length(x) > 0)) AS BIGINT) AS n_re_pieces,
       CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_chars_nospace,
       CAST(ceil(length(regexp_replace(text, '\s+', '', 'g')) / 4.0) AS BIGINT) AS n_bpe_est
FROM documents ORDER BY doc_id
"""


def q_quality_score(spark, sf_dir):
    """Quality scoring: length / stopword-ratio / mean-token-length signals
    combined into a [0,1] score (rounded for cross-engine hash equality)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _padded(F.col("text"))
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    stops = sum(
        [_hits(p, w) for ws in _STOPWORDS.values() for w in ws],
        F.lit(0).cast("long"),
    ).cast("double")
    chars = F.length(F.regexp_replace(F.col("text"), r"\s+", "")).cast("double")
    mean_tok = chars / toks
    score = (
        F.least(toks / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stops / toks * 5.0, F.lit(1.0)) * 0.3
        + F.when((mean_tok >= 3) & (mean_tok <= 8), 0.3).otherwise(0.0)
    )
    return d.select(
        "doc_id",
        F.round(score, 4).alias("quality"),
        F.round(mean_tok, 4).alias("mean_token_len"),
    ).orderBy("doc_id")


def sql_quality_score() -> str:
    p = "(' ' || lower(text) || ' ')"
    stop_sum = " + ".join(
        _sql_hits(p, w) for ws in _STOPWORDS.values() for w in ws
    )
    return rf"""
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS toks,
         CAST({stop_sum} AS DOUBLE) AS stops,
         CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS chars
  FROM documents)
SELECT doc_id,
       round(least(toks / 100.0, 1.0) * 0.4
             + least(stops / toks * 5.0, 1.0) * 0.3
             + CASE WHEN chars / toks >= 3 AND chars / toks <= 8 THEN 0.3 ELSE 0.0 END,
             4) AS quality,
       round(chars / toks, 4) AS mean_token_len
FROM s ORDER BY doc_id
"""


def q_repetition_stats(spark, sf_dir):
    """Gopher-style intra-document repetition signals: total tokens, the
    most-frequent token's count, tokens belonging to any duplicated token,
    and the most-frequent bigram's count — the raw inputs of the
    "duplicate n-gram fraction" quality filters, kept in integer space so
    the cross-engine hash comparison is exact (callers derive the
    fractions). Two explodes + partial-aggregated groupBys, both keyed by
    doc_id — the same linear, map-side-combining shape as token_count, so
    cost scales with corpus size, never corpus^2."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", t.alias("t"))
    uni = (
        base.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    ua = uni.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.max("c").cast("long").alias("top_token_n"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("dup_token_n"),
    )
    # adjacent-token bigrams via zip_with over the shifted array — no
    # positional self-join
    bigrams = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ba = (
        base.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top_bigram_n"))
    )
    return (
        d.select("doc_id")
        .join(ua, "doc_id")
        .join(ba, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "top_token_n",
            "dup_token_n",
            F.coalesce("top_bigram_n", F.lit(0))
            .cast("long")
            .alias("top_bigram_n"),
        )
        .orderBy("doc_id")
    )


SQL_REPETITION = r"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
uni AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
ua AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              CAST(max(c) AS BIGINT) AS top_token_n,
              CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                  AS dup_token_n
       FROM uni GROUP BY doc_id),
bgi AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
bgs AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS bg FROM bgi),
bc AS (SELECT doc_id, bg, count(*) AS c FROM bgs GROUP BY doc_id, bg),
ba AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n
       FROM bc GROUP BY doc_id)
SELECT d.doc_id, ua.n_tokens, ua.top_token_n, ua.dup_token_n,
       CAST(COALESCE(ba.top_bigram_n, 0) AS BIGINT) AS top_bigram_n
FROM documents d JOIN ua USING (doc_id) LEFT JOIN ba USING (doc_id)
ORDER BY doc_id
"""


def q_fingerprint(spark, sf_dir):
    """Document fingerprinting: a true rolling polynomial hash over the
    normalized text (the portable hash, identical in both engines) plus the
    md5 digest of the normalization."""
    from ._portable import spark_poly_hash

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.expr(
            spark_poly_hash(
                r"lower(trim(regexp_replace(text, '\\s+', ' ')))"
            )
        ).alias("rolling_hash"),
    ).orderBy("doc_id")


def sql_fingerprint() -> str:
    from ._portable import duck_poly_hash

    norm = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
    return rf"""
SELECT doc_id, md5({norm}) AS fingerprint,
       {duck_poly_hash(norm)} AS rolling_hash
FROM documents ORDER BY doc_id
"""


SQL_FINGERPRINT = None  # built lazily (needs helper)


def registry() -> dict:
    return {
        "lang_id": (q_lang_id, sql_lang_id()),
        "token_count": (q_token_count, SQL_TOKEN_COUNT),
        "quality_score": (q_quality_score, sql_quality_score()),
        "doc_fingerprint": (q_fingerprint, sql_fingerprint()),
        "repetition_stats": (q_repetition_stats, SQL_REPETITION),
    }
