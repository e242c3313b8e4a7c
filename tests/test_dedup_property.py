"""LWW dedup correctness vs a brute-force pandas oracle on seeded random
logs, across salt settings (SURVEY.md §5)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cdc_spark.dedup import collapse_duplicate_lsns, lww_dedup
from cdc_spark.loggen import change_log


@pytest.mark.parametrize("salt", [1, 4, 16])
@pytest.mark.parametrize("seed", [1, 99])
def test_lww_matches_bruteforce(spark, salt, seed):
    log = change_log(
        spark, 3000, n_repos=10, n_paths=4, zipf=3.0, dup_rate=0.05, seed=seed
    ).select("repo", "path", "lsn", "op", "content")
    got = (
        lww_dedup(log, key=("repo", "path"), order_col="lsn", salt=salt)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pdf = log.toPandas()
    idx = pdf.groupby(["repo", "path"])["lsn"].idxmax()
    want = (
        pdf.loc[idx]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hot_key_skew_zipf(spark):
    """Extreme zipf: most events hit one key; result still exact and the
    salted plan's partial aggregation bounds per-reducer rows."""
    log = change_log(spark, 5000, n_repos=3, n_paths=2, zipf=8.0, seed=5).select(
        "repo", "path", "lsn"
    )
    out = lww_dedup(log, key=("repo", "path"), order_col="lsn", salt=8)
    rows = out.collect()
    assert len(rows) == log.select("repo", "path").distinct().count()
    pdf = log.toPandas()
    want = pdf.groupby(["repo", "path"])["lsn"].max()
    for r in rows:
        assert r["lsn"] == want[(r["repo"], r["path"])]


def test_collapse_duplicate_lsns(spark):
    log = change_log(spark, 500, dup_rate=0.3, seed=13)
    n_unique = log.select("lsn").distinct().count()
    assert collapse_duplicate_lsns(log).count() == n_unique
    assert log.count() > n_unique  # dups were actually injected


def test_dedup_plan_has_partial_aggregation(spark):
    """The physical plan must partial-aggregate before the exchange (hot-key
    defusal happens map-side)."""
    log = change_log(spark, 100, seed=1).select("repo", "path", "lsn")
    plan = (
        lww_dedup(log, key=("repo", "path"), order_col="lsn")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial agg appears before the shuffle in Spark's plan output
    assert "partial_max_by" in plan or "PartialAggregate" in plan or "partial" in plan.lower()
