"""SURVEY.md §7.3 minimum end-to-end slice: generate a change log with dups +
out-of-order + deletes -> parse -> LWW dedup -> lake merge -> sha256 equality
vs the single-threaded oracle."""

import os

from cdc_spark.apply import CdcApply
from cdc_spark.config import EngineConfig
from cdc_spark.loggen import change_log
from cdc_spark.oracle import assert_matches, replay


def test_single_batch_replay_matches_oracle(spark, tmpdir_factory_clean):
    lake_root = tmpdir_factory_clean("lake")
    log = change_log(
        spark,
        5000,
        n_repos=40,
        n_paths=10,
        delete_rate=0.1,
        dup_rate=0.05,
        seed=7,
    )
    cfg = EngineConfig(
        lake_root=lake_root, checkpoint=os.path.join(lake_root, "_ckpt"), n_buckets=8
    )
    applier = CdcApply(spark, cfg)
    info = applier.apply_batch(log, batch_id=0)
    assert len(info) == 1 and not info[0]["skipped"]

    lake = applier.lake_for("repos")
    got = lake.read().toPandas()
    want = replay(log.toPandas(), cfg.base_fields)
    assert len(got) == len(want) > 0
    assert_matches(got, want)

    # commit key recorded: (epoch, lsn_hwm)
    assert lake.last_batch == {"id": 0, "lsn_hwm": 5000}


def test_multi_batch_out_of_order_matches_oracle(spark, tmpdir_factory_clean):
    """Split the log into batches by a hash (NOT by lsn) so batches interleave
    LSN ranges — worst-case out-of-order delivery across batches."""
    from pyspark.sql import functions as F

    lake_root = tmpdir_factory_clean("lake")
    log = change_log(spark, 4000, n_repos=25, n_paths=8, delete_rate=0.12, seed=11)
    cfg = EngineConfig(
        lake_root=lake_root, checkpoint=os.path.join(lake_root, "_ckpt"), n_buckets=8
    )
    applier = CdcApply(spark, cfg)
    for i in range(3):
        part = log.filter(F.pmod(F.xxhash64("lsn", F.lit(99)), F.lit(3)) == i)
        applier.apply_batch(part, batch_id=i)

    lake = applier.lake_for("repos")
    assert_matches(lake.read().toPandas(), replay(log.toPandas(), cfg.base_fields))


def test_duplicate_batch_replay_is_idempotent(spark, tmpdir_factory_clean):
    lake_root = tmpdir_factory_clean("lake")
    log = change_log(spark, 1000, n_repos=10, seed=3)
    cfg = EngineConfig(
        lake_root=lake_root, checkpoint=os.path.join(lake_root, "_ckpt"), n_buckets=4
    )
    applier = CdcApply(spark, cfg)
    applier.apply_batch(log, batch_id=0)
    v1 = applier.lake_for("repos").version
    # crash-and-replay of the same epoch: must be skipped wholesale (E2)
    info = applier.apply_batch(log, batch_id=0)
    assert info[0]["skipped"]
    assert applier.lake_for("repos").version == v1
    assert_matches(
        applier.lake_for("repos").read().toPandas(),
        replay(log.toPandas(), cfg.base_fields),
    )
