"""Edge semantics of the corpus-analytics operators (tfidf_topk,
source_overlap, length_profile) — the cross-engine value equality itself
is covered by the entry contract; these pin the rank/tie/percentile
definitions on hand-built frames."""

import pytest

from cdc_spark.functions.corpus import (
    length_profile,
    source_overlap,
    tfidf_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_tfidf_rank_ties_break_on_token_ascending(spark):
    # Both docs contain two tokens with identical tf and df -> identical
    # integer scores; rank must be decided by token text, not floats or
    # partition order.
    d = _docs(spark, [(1, "s", "bb aa"), (2, "s", "aa bb")])
    out = tfidf_topk(d, k=2).orderBy("doc_id", "rank").collect()
    assert [(r.doc_id, r.rank, r.tok) for r in out] == [
        (1, 1, "aa"), (1, 2, "bb"), (2, 1, "aa"), (2, 2, "bb"),
    ]


def test_tfidf_rare_term_outranks_common_term(spark):
    # 'rare' appears in one of three docs, 'the' in all three; in doc 1
    # both have tf=1, so the df difference alone must order them.
    d = _docs(spark, [
        (1, "s", "the rare"), (2, "s", "the x"), (3, "s", "the y"),
    ])
    top = {r.doc_id: r.tok for r in tfidf_topk(d, k=1).collect()}
    assert top[1] == "rare"
    # idf of a universal term is ln(4/4) = 0 -> score exactly 0
    zero = [r for r in tfidf_topk(d, k=2).collect() if r.tok == "the"]
    assert zero and all(r.score_x1e6 == 0 for r in zero)


def test_source_overlap_identical_sources_hit_jaccard_one(spark):
    d = _docs(spark, [
        (1, "a", "hello world"), (2, "b", "hello world"), (3, "c", "zzzzz"),
    ])
    rows = {(r.source_a, r.source_b): r for r in source_overlap(d).collect()}
    assert rows[("a", "b")].jaccard_x1e6 == 1_000_000
    assert rows[("a", "b")].shared == rows[("a", "b")].shingles_a
    # disjoint sources produce NO row (inner join), not a zero row
    assert ("a", "c") not in rows or rows[("a", "c")].shared > 0


def test_length_profile_percentile_ranks_are_exact(spark):
    # 10 docs with 1..10 tokens: lower median = rank 5 -> 5 tokens,
    # p90 = rank ceil(9) = 9 -> 9 tokens.
    rows = [(i, "s", " ".join(["w"] * i)) for i in range(1, 11)]
    out = length_profile(_docs(spark, rows)).collect()[0]
    assert (out.n_docs, out.min_tokens, out.max_tokens) == (10, 1, 10)
    assert out.total_tokens == 55
    assert out.p50_tokens == 5
    assert out.p90_tokens == 9


def test_length_profile_single_doc_source(spark):
    out = length_profile(_docs(spark, [(1, "s", "a b c")])).collect()[0]
    assert (out.p50_tokens, out.p90_tokens) == (3, 3)


def test_vocab_topk_counts_and_tie_cut(spark):
    from cdc_spark.functions.corpus import vocab_topk

    docs = _docs(
        spark,
        [
            (1, "s", "apple apple banana cherry"),
            (2, "s", "apple banana banana date"),
            (3, "s", "cherry elderberry"),
        ],
    )
    got = {r["tok"]: (r["tf"], r["df"]) for r in vocab_topk(docs, k=10).collect()}
    assert got["apple"] == (3, 2)
    assert got["banana"] == (3, 2)
    assert got["cherry"] == (2, 2)
    assert got["date"] == (1, 1)
    # k cuts on (tf DESC, tok ASC): with k=3 the tie between cherry(2) and
    # the tf-1 group resolves purely by the total order
    top3 = [r["tok"] for r in vocab_topk(docs, k=3).collect()]
    assert top3 == ["apple", "banana", "cherry"]


def test_vocab_topk_plans_take_ordered_not_a_rank_window(spark):
    """The COVERAGE.md claim, asserted: the global top-k cut compiles to
    TakeOrderedAndProject (per-partition heap + k-row driver merge), not
    a rank window or a single-partition sort."""
    import contextlib
    import io

    from cdc_spark.functions.corpus import vocab_topk

    docs = _docs(spark, [(1, "s", "a b c a"), (2, "s", "b c d")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        vocab_topk(docs, k=3).explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan
