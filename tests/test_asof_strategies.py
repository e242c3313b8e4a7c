"""As-of join strategies: the relational range join and the cogrouped
merge_asof must be result-identical (including tie-breaks and skewed keys),
and the auto pick must route hot keys to the cogroup path."""

import datetime

import pandas as pd
from pyspark.sql import functions as F

from cdc_spark.functions.temporal import (
    asof_join,
    asof_join_pandas,
    asof_join_relational,
    q_asof_join,
    q_asof_join_cogroup,
)

SF = "/root/testdata/sf0.001"


def _norm(df):
    return (
        df.orderBy("event_id")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )


def test_cogroup_matches_relational_on_testdata(spark):
    a = _norm(q_asof_join(spark, SF))
    b = _norm(q_asof_join_cogroup(spark, SF))
    pd.testing.assert_frame_equal(a, b)


def _skewed(spark, n_orders_hot=10_000):
    base = datetime.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(i, 1 if i % 2 else 2, base + datetime.timedelta(minutes=i)) for i in range(200)],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP",
    )
    # user 1 is pathologically hot; several orders share a timestamp so the
    # tie-break is exercised
    hot = spark.range(n_orders_hot).select(
        F.lit(1).alias("user_id"),
        F.col("id").alias("o_orderkey"),
        (F.lit(base) + F.make_interval(mins=(F.col("id") / 100).cast("int"))).alias(
            "o_orderdate"
        ),
        (F.col("id") * 1.5).alias("o_totalprice"),
    )
    cold = spark.createDataFrame(
        [(2, 10**6, base + datetime.timedelta(minutes=5), 9.9)],
        "user_id BIGINT, o_orderkey BIGINT, o_orderdate TIMESTAMP, o_totalprice DOUBLE",
    )
    return events, hot.unionByName(cold)


def test_skewed_key_both_strategies_identical(spark):
    events, orders = _skewed(spark, 10_000)
    rel = asof_join_relational(
        events, orders, right_order=("o_orderkey",)
    )
    cg = asof_join_pandas(events, orders, right_order=("o_orderkey",))
    cols = ["event_id", "user_id", "o_orderkey", "o_totalprice"]
    a = rel.select(cols).orderBy("event_id").toPandas().astype(str)
    b = cg.select(cols).orderBy("event_id").toPandas().astype(str)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    # ties resolved deterministically: equal o_orderdate -> max o_orderkey
    got = {r["event_id"]: r["o_orderkey"] for r in rel.collect()}
    assert all(k is None or k % 100 == 99 or k == 10**6 for k in got.values())


def test_auto_pick_routes_by_fanout(spark):
    events, orders = _skewed(spark, 2_000)
    _, strategy_hot = asof_join(
        events, orders, right_order=("o_orderkey",), max_fanout=1_000
    )
    assert strategy_hot == "cogroup"
    _, strategy_cold = asof_join(
        events, orders, right_order=("o_orderkey",), max_fanout=10**6
    )
    assert strategy_cold == "range_join"


def test_event_with_no_prior_order_keeps_nulls(spark):
    base = datetime.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, 7, base), (2, 8, base)],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP",
    )
    orders = spark.createDataFrame(
        # user 7's only order is AFTER the event; user 8 has none at all
        [(7, 5, base + datetime.timedelta(days=1), 1.0)],
        "user_id BIGINT, o_orderkey BIGINT, o_orderdate TIMESTAMP, o_totalprice DOUBLE",
    )
    for df in (
        asof_join_relational(events, orders, right_order=("o_orderkey",)),
        asof_join_pandas(events, orders, right_order=("o_orderkey",)),
    ):
        rows = {r["event_id"]: r for r in df.collect()}
        assert rows[1]["o_orderkey"] is None and rows[2]["o_orderkey"] is None
