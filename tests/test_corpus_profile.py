"""CdcApply.corpus_profile: the batch length_profile operator applied to
the live lake content must equal running the operator directly on the
ingested corpus — including after an update and a delete (the profile
follows lake liveness, not ingest history)."""

import os

from pyspark.sql import functions as F

from cdc_spark.apply import CdcApply
from cdc_spark.config import EngineConfig
from cdc_spark.functions.corpus import length_profile


def _env(d):
    return d.select(
        (F.col("doc_id") + 1).cast("long").alias("lsn"),
        F.lit("insert").alias("op"),
        F.lit("docs").alias("table"),
        F.col("doc_id").cast("string").alias("repo"),
        F.lit("p").alias("path"),
        F.lit(None).cast("string").alias("commit"),
        F.col("lang").alias("lang"),
        F.col("text").alias("content"),
        F.lit(None).cast("map<string,string>").alias("extra"),
        F.lit(None).cast("string").alias("schema_change"),
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_corpus_profile_tracks_live_lake(spark, tmpdir_factory_clean):
    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    ).filter(F.col("doc_id") < 120)
    root = tmpdir_factory_clean("cdc_profile")
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "_ckpt"), n_buckets=4
    )
    applier = CdcApply(spark, cfg)
    applier.apply_batch(_env(d), 0)

    want = length_profile(
        d.select(F.col("lang").alias("source"), "text")
    )
    assert _sorted_rows(applier.corpus_profile("docs")) == _sorted_rows(want)

    # update doc 0's text and delete doc 1: the profile must follow
    upd = _env(
        d.filter(F.col("doc_id") == 0).withColumn(
            "text", F.lit("one two three")
        )
    ).withColumn("lsn", F.lit(1000).cast("long"))
    dele = (
        _env(d.filter(F.col("doc_id") == 1))
        .withColumn("op", F.lit("delete"))
        .withColumn("lsn", F.lit(1001).cast("long"))
    )
    applier.apply_batch(upd.unionByName(dele), 1)

    live = d.filter(F.col("doc_id") > 1).unionByName(
        d.filter(F.col("doc_id") == 0).withColumn(
            "text", F.lit("one two three")
        )
    )
    want2 = length_profile(
        live.select(F.col("lang").alias("source"), "text")
    )
    assert _sorted_rows(applier.corpus_profile("docs")) == _sorted_rows(want2)
