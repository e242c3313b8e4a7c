"""Sequence packing: layout invariants beyond the DuckDB oracle (which
covers the fixture corpus in test_entry_contract) — the two-phase prefix
sum must equal a single-threaded reference under any partitioning, and
repeated runs must agree (the range partitioner's sampled boundaries are
frozen by the eager checkpoint)."""

import random

from pyspark.sql import functions as F

from cdc_spark.functions.packing import pack_sequences


def _reference(rows, L):
    """Single-threaded concatenate-and-chunk layout."""
    out = {}
    cb = 0
    for doc_id, n in sorted(rows):
        out[doc_id] = (n, cb // L, cb % L)
        cb += n
    return out


def _check(spark, rows, L):
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, max_tokens=L, token_col="n").collect()
    }
    assert got == _reference(rows, L)


def test_pack_matches_reference_across_regimes(spark):
    rng = random.Random(7)
    # fewer docs than shuffle partitions, equal, and many more — the
    # per-partition prefix lift must be right in every regime
    for n_docs in (2, 4, 97):
        rows = [(i * 3 + 1, rng.randrange(1, 400)) for i in range(n_docs)]
        _check(spark, rows, 128)


def test_pack_straddling_and_exact_boundaries(spark):
    # doc ends exactly on a window boundary; next doc starts at offset 0
    rows = [(1, 128), (2, 64), (3, 64), (4, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, max_tokens=128, token_col="n").collect()
    }
    assert got == {1: (0, 0), 2: (1, 0), 3: (1, 64), 4: (2, 0)}


def test_pack_deterministic(spark):
    rows = [(i, (i * 37) % 211 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    a = sorted(pack_sequences(df, token_col="n").collect())
    b = sorted(pack_sequences(df, token_col="n").collect())
    assert a == b


def test_pack_whitespace_token_default(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "  x  "), (4, "one")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in pack_sequences(df, max_tokens=4).collect()
    }
    # token_count convention: trim + whitespace split ('' -> 1)
    assert got == {1: 3, 2: 1, 3: 1, 4: 1}
