"""Semantic tests for exact substring dedup (overlapping-window keep-first
with interval-union removal): hand-built corpus with known repeats."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdc_spark.functions.substring import SPAN_L, substring_dedup

assert SPAN_L == 8  # the hand-expected values below assume L=8


def _toks(*names):
    return " ".join(names)


def test_keep_first_and_interval_union(spark):
    span8 = [f"s{i}" for i in range(8)]       # the repeated 8-token span
    span12 = [f"p{i}" for i in range(12)]     # a repeated 12-token passage
    docs = [
        # doc 0 owns both passages (globally first occurrence)
        (0, _toks(*span8, "u0", "u1", *span12)),
        # doc 1 embeds span8 once -> 1 dup window, 8 tokens removed
        (1, _toks("a0", "a1", *span8, "a2", "a3")),
        # doc 2 embeds span8 twice, separated by > L junk tokens ->
        # 2 dup windows in 2 islands, 16 tokens removed
        (2, _toks(*span8, *[f"j{i}" for i in range(9)], *span8)),
        # doc 3 = span8 twice back-to-back: pos 1 collides with doc 0's
        # window (dup) and pos 9 repeats pos 1 -> both marked, and the
        # intermediate bridge windows (s1..s7 s0 etc.) are unique ->
        # islands merge to one contiguous [1, 9+7] = 16 tokens
        (3, _toks(*span8, *span8)),
        # doc 4 embeds the 12-token passage -> 5 overlapping dup windows,
        # ONE island of 12 removed tokens
        (4, _toks("b0", *span12, "b1")),
        # doc 5: shorter than L tokens -> no windows at all
        (5, _toks("x0", "x1", "x2")),
        # doc 6: all-unique tokens -> windows but no dups
        (6, _toks(*[f"z{i}" for i in range(20)])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_windows"], r["removed_tokens"])
        for r in substring_dedup(df).collect()
    }
    assert got[0] == (22, 0, 0)          # first copies: untouched
    assert got[1] == (12, 1, 8)
    assert got[2] == (25, 2, 16)
    assert got[3] == (16, 2, 16)
    assert got[4] == (14, 5, 12)
    assert got[5] == (3, 0, 0)
    assert got[6] == (20, 0, 0)


def test_within_doc_repeat_keeps_first(spark):
    # a single doc repeating its own opening: the first occurrence
    # survives, the second is marked — no other doc involved
    span = [f"w{i}" for i in range(8)]
    mid = [f"m{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(7, " ".join(span + mid + span))], "doc_id long, text string"
    )
    row = substring_dedup(df).collect()[0]
    assert (row["dup_windows"], row["removed_tokens"]) == (1, 8)


def test_removed_bounded_and_zero_iff_no_dups(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = substring_dedup(d).toPandas()
    assert (res["removed_tokens"] <= res["n_tokens"]).all()
    assert ((res["dup_windows"] == 0) == (res["removed_tokens"] == 0)).all()
