"""Auto-maintenance cadence: compaction + expiry run every N batches and
never change the logical state."""

import os

from pyspark.sql import functions as F

from cdc_spark.apply import CdcApply
from cdc_spark.config import EngineConfig
from cdc_spark.loggen import change_log
from cdc_spark.oracle import assert_matches, replay


def test_auto_maintenance(spark, tmpdir_factory_clean):
    root = tmpdir_factory_clean("mt")
    cfg = EngineConfig(
        lake_root=root,
        checkpoint=os.path.join(root, "c"),
        n_buckets=4,
        compact_every=2,
        expire_keep=2,
        tombstone_lag=100,
    )
    applier = CdcApply(spark, cfg)
    log = change_log(
        spark, 2000, n_repos=12, delete_rate=0.2, truncate_lsns=(700,), seed=31
    )
    for i in range(4):
        applier.apply_batch(
            log.filter(
                (F.col("lsn") > i * 500) & (F.col("lsn") <= (i + 1) * 500)
            ),
            i,
        )
    lake = applier.lake_for("repos").refresh()
    assert_matches(lake.read().toPandas(), replay(log.toPandas(), cfg.base_fields))
    # expiry kept only the newest manifests
    assert len(lake.snapshot_log()) <= cfg.expire_keep
    # tombstones older than hwm - lag are physically gone
    full = lake._read_files(lake.meta["files"], lake.schema_fields())
    old_tomb = full.filter(F.col("_deleted") & (F.col("_lsn") <= 2000 - 100))
    assert old_tomb.count() == 0
