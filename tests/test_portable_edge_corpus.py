"""Cross-engine portability on an adversarial document corpus: multibyte
unicode (Spark ``ascii`` vs DuckDB ``ord`` must both yield code points),
emoji (non-BMP), empty / whitespace-only text, frame-escape characters,
quotes, and a long repetitive doc. Every text-family query must stay
hash-identical between Spark and the DuckDB oracle on ALL of them — the
driver only ever exercises the tame fixture corpus."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

EDGE_DOCS = [
    (0, "", "en", "s0"),
    (1, "   ", "en", "s0"),
    (2, "\t\n  \n", "en", "s0"),
    (3, "plain ascii words only here", "en", "s0"),
    (4, "café déjà-vu naïve façade", "fr", "s1"),
    (5, "日本語 の テスト 文書 です", "ja", "s1"),
    (6, "emoji 🎉 mix 🚀 and ascii", "en", "s1"),
    (7, "pipe|and\\backslash\"quote'apostrophe", "en", "s2"),
    (8, "repeat " * 400, "en", "s2"),
    (9, "MiXeD CaSe And  double  spaces", "en", "s2"),
    (10, "ZWJ ‍ and combining é accents", "en", "s3"),
    (11, "the and of the and of stopwords", "en", "s3"),
]

QUERIES = [
    "exact_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "minhash_jaccard_pairs",
    "simhash",
    "simhash_neardup_pairs",
    "ngram_jaccard_pairs",
    "token_count",
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "sample_stratified",
    "repetition_stats",
    "dedup_clusters",
    "cluster_canonical",
    "leakage_safe_split",
    "vocab_topk",
    "pii_redact",
    "chunk_dedup",
    "dup_ngram_profile",
    "mixture_plan",
    "mixture_sample",
    "lm_surprisal",
    "tfidf_topk",
    "source_overlap",
    "length_profile",
    "pack_sequences",
    "export_shards",
    "snapshot_diff",
    "substring_dedup",
    # binary pgoutput roundtrip: multibyte/emoji text exercises the UTF-8
    # length-prefixed tuple walk (byte lengths != char counts)
    "pgoutput_decode",
    # all 12 edge doc_ids sit inside the eval holdout (doc_id < N_EVAL_DOCS),
    # so the funnel's post-quality stages are EMPTY — this pins the
    # zero-survivor path (COALESCE'd token sums) cross-engine
    "curation_funnel",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge"))
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in EDGE_DOCS]
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("name", QUERIES)
def test_edge_corpus_cross_engine(spark, edge_dir, name):
    from cdc_spark.queries import registry

    fn, sql = registry()[name]
    got = fn(spark, edge_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_dir}/documents.parquet/*.parquet'"
    )
    want = con.execute(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    b = want[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
