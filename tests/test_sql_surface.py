"""SQL surface over the lake + pandas as-of variant + oracle cast parity."""

import os

import pytest
from pyspark.sql import functions as F

from cdc_spark.apply import CdcApply
from cdc_spark.config import EngineConfig
from cdc_spark.loggen import change_log
from cdc_spark.sql import register_lake, register_metrics, snapshot_log_df


def test_sql_views(spark, tmpdir_factory_clean):
    root = tmpdir_factory_clean("sqlv")
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "c"), n_buckets=4
    )
    applier = CdcApply(spark, cfg)
    log = change_log(spark, 800, n_repos=10, delete_rate=0.1, seed=3)
    applier.apply_batch(log.filter(F.col("lsn") <= 400), 0)
    applier.apply_batch(log.filter(F.col("lsn") > 400), 1)

    lake = register_lake(spark, cfg)
    n = spark.sql("SELECT count(*) n FROM lake_repos").collect()[0]["n"]
    assert n == lake.read().count() > 0
    top = spark.sql(
        "SELECT repo, count(*) n FROM lake_repos GROUP BY repo ORDER BY n DESC, repo LIMIT 3"
    ).collect()
    assert len(top) == 3
    # meta view exposes bookkeeping
    hw = spark.sql("SELECT max(_lsn) m FROM lake_repos_meta").collect()[0]["m"]
    assert hw == 800

    register_metrics(spark, cfg)
    m = spark.sql(
        "SELECT batch_id, sum(upserts) u FROM lake_metrics GROUP BY batch_id"
    ).collect()
    assert {r["batch_id"] for r in m} == {0, 1}

    slog = snapshot_log_df(spark, lake)
    assert slog.count() == 3  # v0 create + 2 commits
    assert [r["batch_id"] for r in slog.orderBy("version").collect()] == [-1, 0, 1]


def test_asof_join_pandas_matches_relational(spark):
    from cdc_spark.functions.temporal import asof_join_pandas

    e = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00"), (2, 10, "2024-01-01 12:00:00"),
         (3, 20, "2024-01-01 09:00:00")],
        "event_id BIGINT, user_id BIGINT, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    o = spark.createDataFrame(
        [(10, 100, "2024-01-01 09:30:00"), (10, 101, "2024-01-01 11:00:00"),
         (30, 300, "2024-01-01 08:00:00")],
        "user_id BIGINT, o_orderkey BIGINT, o_orderdate STRING",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    got = {
        r["event_id"]: r["o_orderkey"]
        for r in asof_join_pandas(e, o).collect()
    }
    assert got == {1: 100, 2: 101, 3: None}


@pytest.mark.parametrize(
    "raw,typ",
    [("42", "long"), ("-7", "long"), ("4.5", "long"), ("abc", "long"),
     ("", "long"), (" 13 ", "long"), ("3.25", "double"), ("1e3", "double"),
     ("x", "double"), ("true", "boolean"), ("False", "boolean"),
     ("1", "boolean"), ("maybe", "boolean"), ("hi", "string")],
)
def test_oracle_cast_matches_spark_try_cast(spark, raw, typ):
    """The oracle's python casts must mirror Spark's ANSI try_cast exactly —
    any drift breaks sha256 equality on retyped columns."""
    from cdc_spark.lake import sql_type
    from cdc_spark.oracle import cast_string

    got = spark.sql(
        f"SELECT try_cast('{raw}' AS {sql_type(typ)}) v"
    ).collect()[0]["v"]
    assert cast_string(raw, typ) == got, f"{raw!r} as {typ}: oracle != spark"


def test_register_all_multi_table(spark, tmpdir_factory_clean):
    """register_all discovers every demuxed table and the views join."""
    from cdc_spark.sql import register_all

    root = tmpdir_factory_clean("ra")
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "c"), n_buckets=4
    )
    applier = CdcApply(spark, cfg)
    log = change_log(spark, 400, n_repos=6, table="t_a", seed=5).unionByName(
        change_log(spark, 400, n_repos=6, table="t_b", start_lsn=1000, seed=6)
    )
    applier.apply_batch(log, 0)
    lakes = register_all(spark, cfg)
    assert set(lakes) == {"t_a", "t_b"}
    n = spark.sql(
        "SELECT (SELECT count(*) FROM lake_t_a) AS a, "
        "(SELECT count(*) FROM lake_t_b) AS b"
    ).collect()[0]
    assert n["a"] > 0 and n["b"] > 0
    joined = spark.sql(
        "SELECT count(*) n FROM lake_t_a a JOIN lake_t_b b USING (repo, path)"
    ).collect()[0]["n"]
    assert joined >= 0  # cross-table SQL works
