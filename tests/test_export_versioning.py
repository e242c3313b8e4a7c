"""Export sharding (deterministic pseudo-shuffle) and snapshot diffing."""

import os

import pytest
from pyspark.sql import functions as F

from cdc_spark.functions.export import (
    N_SHARDS,
    export_shards,
    write_shards,
)
from cdc_spark.functions.versioning import frame_diff
from cdc_spark.lake import LakeTable


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )


def test_export_shards_is_a_permutation(spark):
    d = _docs(spark)
    out = export_shards(d, n_shards=4).collect()
    assert len(out) == 200
    assert sorted(r["doc_id"] for r in out) == list(range(200))
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for shard, poss in by_shard.items():
        # positions are exactly 0..n_i-1: contiguous, no gaps, no dups
        assert sorted(poss) == list(range(len(poss)))


def test_export_shards_custom_id_col_and_seed_guard(spark):
    # a non-default id column must produce the SAME layout as the default
    # name (the hash runs over the renamed value, not the surface name)
    d = _docs(spark)
    a = sorted(map(tuple, export_shards(d, n_shards=4).collect()))
    r = d.withColumnRenamed("doc_id", "vec_id")
    b = sorted(
        map(tuple, export_shards(r, n_shards=4, id_col="vec_id").collect())
    )
    assert a == b
    with pytest.raises(ValueError):
        export_shards(d, n_shards=4, seed="it's")


def test_export_shards_deterministic_and_partition_independent(spark):
    d = _docs(spark)
    a = sorted(map(tuple, export_shards(d, n_shards=4).collect()))
    b = sorted(map(tuple, export_shards(d.repartition(7), n_shards=4).collect()))
    assert a == b
    # a different seed is a different permutation
    c = sorted(map(tuple, export_shards(d, n_shards=4, seed="other").collect()))
    assert a != c


def test_export_shards_matches_bruteforce_rank(spark):
    """The two-phase distributed rank equals the naive per-shard sort."""
    d = _docs(spark, 150)
    got = {
        (r["shard"], r["doc_id"]): r["pos"]
        for r in export_shards(d, n_shards=3).collect()
    }
    rows = (
        _docs(spark, 150)
        .withColumn(
            "_h",
            F.expr(
                __import__(
                    "cdc_spark.functions._portable", fromlist=["spark_poly_hash"]
                ).spark_poly_hash("concat('xshuf:', CAST(doc_id AS STRING))")
            ),
        )
        .collect()
    )
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["_h"] % 3, []).append((r["_h"], r["doc_id"]))
    want = {}
    for shard, hs in by_shard.items():
        for pos, (_, doc_id) in enumerate(sorted(hs)):
            want[(shard, doc_id)] = pos
    assert got == want


def test_export_shards_empty(spark):
    d = _docs(spark).filter("doc_id < 0")
    assert export_shards(d).count() == 0


def test_write_shards_materializes_sorted_dirs(spark, tmpdir_factory_clean):
    root = tmpdir_factory_clean("shards")
    out = os.path.join(root, "export")
    d = _docs(spark, 120)
    layout = write_shards(d, out, n_shards=4)
    assert layout.count() == 120
    back = spark.read.parquet(out)
    assert back.count() == 120
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) \
        <= set(range(4))
    # every row kept its text, and pos is a valid per-shard sequence
    joined = back.join(d, ["doc_id"], "inner").count()
    assert joined == 120


def test_export_corpus_from_live_lake(spark, tmpdir_factory_clean):
    """The composed handoff: stream batches into the lake, export the live
    content as shards; layout is deterministic and tracks deletes."""
    from cdc_spark.apply import CdcApply
    from cdc_spark.config import EngineConfig
    from cdc_spark.loggen import change_log

    root = tmpdir_factory_clean("exp_lake")
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "_ckpt"), n_buckets=4
    )
    applier = CdcApply(spark, cfg)
    log = change_log(spark, 600, n_repos=8, delete_rate=0.15, seed=31)
    applier.apply_batch(log.filter(F.col("lsn") <= 300), 0)
    applier.apply_batch(log.filter(F.col("lsn") > 300), 1)
    live_n = applier.lake_for("repos").read().count()

    out1 = os.path.join(root, "shards1")
    lay1 = applier.export_corpus("repos", out1, n_shards=4)
    rows1 = sorted(map(tuple, lay1.collect()))
    assert len(rows1) == live_n
    assert len({r[2] for r in rows1}) == live_n  # unique doc identity
    back = spark.read.parquet(out1)
    assert back.count() == live_n
    # deterministic: a second export of the same content = same layout
    out2 = os.path.join(root, "shards2")
    rows2 = sorted(map(tuple, applier.export_corpus("repos", out2, n_shards=4).collect()))
    assert rows1 == rows2


def test_frame_diff_ops_and_null_safety(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(2, "B"), (3, ""), (4, "d"), (5, "e")], "k int, v string"
    )
    got = {r["k"]: r["change_op"] for r in frame_diff(old, new, ["k"]).collect()}
    # 1 removed, 2 changed, 3 changed (NULL vs '' must differ), 4 unchanged
    assert got == {1: "removed", 2: "changed", 3: "changed", 5: "added"}


def test_frame_diff_requires_payload(spark):
    d = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError):
        frame_diff(d, d, ["k"])


def test_lake_diff_release_notes(spark, tmpdir_factory_clean):
    root = tmpdir_factory_clean("lakediff")
    lake = LakeTable.create(
        spark,
        os.path.join(root, "t"),
        fields=[("k", "string"), ("val", "string")],
        key=("k",),
        n_buckets=2,
        table="t",
    )

    def batch(rows):
        return spark.createDataFrame(
            [(k, v, lsn, dead) for k, v, lsn, dead in rows],
            "k string, val string, _lsn long, _deleted boolean",
        ).withColumn("_extra", F.lit(None).cast("map<string,string>"))

    lake.merge(
        batch([("k1", "a", 1, False), ("k2", "b", 2, False),
               ("k3", "c", 3, False), ("k4", "d", 4, False)]),
        batch_id=0, lsn_hwm=4,
    )
    v1 = lake.version
    lake.merge(
        batch([("k2", "B", 5, False), ("k3", None, 6, True),
               ("k5", "e", 7, False)]),
        batch_id=1, lsn_hwm=7,
    )
    got = {r["k"]: r["change_op"] for r in lake.diff(v1).collect()}
    assert got == {"k2": "changed", "k3": "removed", "k5": "added"}
    # explicit v_new equal to v_old -> empty diff
    assert lake.diff(v1, v1).count() == 0
