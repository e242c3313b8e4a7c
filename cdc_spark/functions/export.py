"""Training-data export: deterministic global shuffle into fixed shards.

The last step of every training-data pipeline: the curated corpus is
written out as N shards whose contents and intra-shard order are a
deterministic pseudo-random permutation of the documents (training wants
decorrelated batches, reproducibility wants the layout to be a pure
function of the corpus + a seed — never of Spark's physical partitioning).

Shard assignment and order both derive from the portable polynomial hash
(:mod:`._portable`), so the layout is engine-independent and the whole
assignment is oracle-able in ANSI SQL. The intra-shard position is NOT a
per-shard window rank — ``ROW_NUMBER() OVER (PARTITION BY shard)`` funnels
every shard (corpus/N docs) through one task. Instead it reuses the
two-phase prefix shape from :mod:`.packing`: range-partition by
(shard, hash), rank WITHIN each partition, then lift the O(partitions)
per-partition counts plus the O(shards) per-shard counts to the driver and
broadcast their prefix sums back as literal maps. Only control-plane rows
leave the executors; the rank is a pure function of the global
(shard, hash, doc_id) order, independent of where the sampled range
boundaries land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._portable import duck_poly_hash, spark_poly_hash

#: default shard count for the oracled fixture instance (production: O(1k))
N_SHARDS = 8
#: seed namespacing the shuffle hash — a different seed is a different
#: deterministic permutation
SHUFFLE_SEED = "xshuf"

import re as _re

#: seeds are interpolated into SQL string literals on both engines — keep
#: them quote-free by construction
_SEED_RE = _re.compile(r"[A-Za-z0-9_.\-]+")


def export_shards(
    docs: DataFrame,
    n_shards: int = N_SHARDS,
    seed: str = SHUFFLE_SEED,
    id_col: str = "doc_id",
) -> DataFrame:
    """(shard, pos, doc_id): the deterministic shard each doc lands in and
    its 0-based position there, under hash-pseudo-shuffle ordering.
    ``id_col`` must be unique per row (ties would make the permutation
    order-ambiguous in any engine, the oracle included) and castable to
    BIGINT — the hash runs over the CAST value, so it matches the oracle
    regardless of the column's surface type or name."""
    if not _SEED_RE.fullmatch(seed):
        raise ValueError(
            f"seed {seed!r} must match [A-Za-z0-9_.-]+ (it is interpolated "
            "into both engines' SQL expressions)"
        )
    spark = docs.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # hash the RENAMED column: the select below is the only frame the
    # expression ever sees, so any id_col name (or a column also named
    # doc_id upstream) resolves unambiguously
    hx = F.expr(
        spark_poly_hash(f"concat('{seed}:', CAST(doc_id AS STRING))")
    )
    d = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .withColumn("_h", hx)
        .withColumn(
            "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
        )
        .repartitionByRange(nparts, "shard", "_h", "doc_id")
        .withColumn("_p", F.spark_partition_id())
    )
    w = Window.partitionBy("_p").orderBy("shard", "_h", "doc_id")
    # freeze the sampled range boundaries before BOTH consumers (see
    # packing.pack_sequences: the partitioner re-samples per execution)
    d = d.withColumn("_rn", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    pc = {
        r["_p"]: r["c"]
        for r in d.groupBy("_p").agg(F.count("*").alias("c")).collect()
    }
    if not pc:
        return spark.createDataFrame(
            [], "shard int, pos bigint, doc_id long"
        )
    ppre: dict[int, int] = {}
    acc = 0
    for p in sorted(pc):
        ppre[p] = acc
        acc += pc[p]
    sc = {
        r["shard"]: r["c"]
        for r in d.groupBy("shard").agg(F.count("*").alias("c")).collect()
    }
    spre: dict[int, int] = {}
    acc = 0
    for s in sorted(sc):
        spre[s] = acc
        acc += sc[s]
    pmap = F.create_map(*[F.lit(x) for p in sorted(ppre) for x in (p, ppre[p])])
    smap = F.create_map(*[F.lit(x) for s in sorted(spre) for x in (s, spre[s])])
    pos = (
        F.element_at(pmap, F.col("_p"))
        + F.col("_rn")
        - F.element_at(smap, F.col("shard"))
        - F.lit(1)
    ).cast("long")
    return d.select("shard", pos.alias("pos"), "doc_id")


def write_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = N_SHARDS,
    seed: str = SHUFFLE_SEED,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the export: join the layout back to the full rows and
    write ``shard=N`` parquet directories, rows sorted by ``pos`` within
    each shard. One extra equi-join on the id plus one range shuffle on
    shard — the join is on the same unique id both sides, and the final
    repartitionByRange("shard") gives one writer task per shard (a hash
    repartition would collide several shard values into one task and
    leave others empty). Returns the layout frame for callers that also
    want it."""
    layout = export_shards(docs, n_shards, seed, id_col)
    (
        docs.join(layout.withColumnRenamed("doc_id", id_col), [id_col])
        .repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return layout


def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled instance: the documents table pseudo-shuffled into
    N_SHARDS shards."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return export_shards(d).orderBy("shard", "pos")


_DUCK_H = duck_poly_hash(f"('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR))")
SQL_EXPORT_SHARDS = f"""
WITH h AS (SELECT doc_id, {_DUCK_H} AS _h FROM documents)
SELECT CAST(_h % {N_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY _h % {N_SHARDS}
                               ORDER BY _h, doc_id) - 1 AS BIGINT) AS pos,
       doc_id
FROM h ORDER BY shard, pos
"""


def registry() -> dict:
    return {
        "export_shards": (q_export_shards, SQL_EXPORT_SHARDS),
    }
