"""Sequence packing: lay documents out into fixed-size training windows.

The standard GPT-style "concatenate and chunk" step: documents are
concatenated in a deterministic order and sliced into ``max_tokens``-token
sequences; each doc gets the sequence id + offset where it starts (docs
may straddle window boundaries). The layout is a pure function of the
per-doc token counts and the order — which is what makes it oracle-able
as an ANSI window cumsum.

The 100 TB point of this module is HOW the running sum is computed: the
naive ``SUM() OVER (ORDER BY doc_id)`` compiles to a single-partition
window — every row through one task, the exact funnel this repo's plan
tests ban. Instead the prefix sum is two-phase, the same way distributed
scans are built everywhere: range-partition by the order column, running
sum WITHIN each partition (parallel, partial-aggregated), then lift the
O(partitions) per-partition totals to the driver and broadcast their
prefix sums back as a literal map. Only the control plane (one row per
partition) ever leaves the executors, and the result is independent of
where the sampled range boundaries land — the cumsum depends only on the
global order, not the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: default training window, tokens
SEQ_LEN = 2048


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = SEQ_LEN,
    order_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, seq_offset): the training window each
    doc STARTS in and its offset there, under concatenate-and-chunk
    packing in ``order_col`` order. ``order_col`` must be unique per row
    (ties make the running sum order-ambiguous in ANY engine, the oracle
    included). ``token_col`` names a precomputed
    token-count column; without it, whitespace tokens of ``text`` are
    counted (the token_count convention)."""
    spark = docs.sparkSession
    if token_col is None:
        n = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    else:
        n = F.col(token_col).cast("long")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        docs.select(F.col(order_col).alias("doc_id"), n.alias("n_tokens"))
        .repartitionByRange(nparts, "doc_id")
        .withColumn("_p", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_p")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # materialize ONCE: the range partitioner samples its boundaries per
    # execution, so the partition ids must be frozen before being read by
    # BOTH the totals collect and the final projection — otherwise the
    # prefix map could be keyed by one run's boundaries and applied to
    # another's
    d = d.withColumn("_within", F.sum("n_tokens").over(w)).localCheckpoint(
        eager=True
    )
    # control-plane lift: one total per partition (O(partitions) rows),
    # prefix-summed on the driver, broadcast back as a literal map. The
    # range partitioner orders partitions by key, so partition i's prefix
    # is the sum of totals 0..i-1.
    totals = {
        r["_p"]: r["t"]
        for r in d.groupBy("_p").agg(F.sum("n_tokens").alias("t")).collect()
    }
    prefix: dict[int, int] = {}
    acc = 0
    for p in sorted(totals):
        prefix[p] = acc
        acc += totals[p]
    if not prefix:  # empty corpus
        return spark.createDataFrame(
            [], "doc_id long, n_tokens long, seq_id long, seq_offset long"
        )
    pmap = F.create_map(
        *[F.lit(x) for p in sorted(prefix) for x in (p, prefix[p])]
    )
    cb = (F.element_at(pmap, F.col("_p")) + F.col("_within") - F.col("n_tokens"))
    return d.select(
        "doc_id",
        "n_tokens",
        cb.alias("_cb"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr(f"CAST(_cb DIV {int(max_tokens)} AS BIGINT)").alias("seq_id"),
        F.pmod(F.col("_cb"), F.lit(int(max_tokens))).cast("long").alias(
            "seq_offset"
        ),
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled instance over the documents table at the default window."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(d).orderBy("doc_id")


SQL_PACK = rf"""
WITH t AS (SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                      AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM t)
SELECT doc_id, n_tokens,
       CAST(cb // {SEQ_LEN} AS BIGINT) AS seq_id,
       CAST(cb % {SEQ_LEN} AS BIGINT) AS seq_offset
FROM c ORDER BY doc_id
"""


def registry() -> dict:
    return {
        "pack_sequences": (q_pack_sequences, SQL_PACK),
    }
