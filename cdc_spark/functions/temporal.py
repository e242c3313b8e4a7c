"""Temporal operators Spark lacks natively: as-of join and sessionization.

- As-of join: for each event, the latest order of the same customer with
  o_orderdate <= ts. Expressed relationally (range join + per-event max-LSN
  struct reduce — the same max_by shape as the LWW dedup); at scale the
  range join is bucketed by key so only same-key rows meet. A pandas
  ``merge_asof`` per key group (applyInPandas) is the alternative when the
  per-key fan-out is too wide; the relational form keeps everything in
  codegen and is the oracled default.
- Sessionization: gap > 30 min starts a new session per user (lag + running
  sum — the standard windowed formulation).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def q_asof_join(spark, sf_dir):
    """events asof-join orders on user_id = o_custkey, o_orderdate <= ts
    (latest such order). Events with no prior order are kept with NULLs
    (left as-of)."""
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts")
        .filter(F.col("event_id") < 2000)  # bounded probe set
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate", "o_totalprice"
    )
    j = e.join(o, ["user_id"], "left").filter(
        F.col("o_orderdate").isNull() | (F.col("o_orderdate") <= F.col("ts"))
    )
    picked = (
        j.groupBy("event_id")
        .agg(
            F.max_by(
                F.struct("user_id", "ts", "o_orderkey", "o_orderdate", "o_totalprice"),
                F.coalesce(
                    F.col("o_orderdate").cast("timestamp").cast("long"), F.lit(-(2**62))
                ),
            ).alias("s")
        )
        .select("event_id", F.col("s.*"))
    )
    # events whose ONLY join rows were filtered out (all orders after ts)
    # must still appear with NULL order — re-left-join against the probe set
    out = e.join(
        picked.select(
            "event_id", "o_orderkey", "o_orderdate", "o_totalprice"
        ),
        "event_id",
        "left",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_date_s"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
    ).orderBy("event_id")


SQL_ASOF = """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_id < 2000),
j AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC) rn
  FROM e JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       j.o_orderkey,
       strftime(j.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date_s,
       round(j.o_totalprice, 2) AS o_totalprice
FROM e LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
ORDER BY event_id
"""


def q_sessionize(spark, sf_dir):
    """Per-user sessions: a gap > SESSION_GAP_MIN minutes starts a new
    session; emit per-session bounds and event count."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
    marked = e.withColumn(
        "new_s",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_MIN * 60), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sid = F.sum("new_s").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    sess = marked.withColumn("session_id", sid)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start_s"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("end_s"),
        )
        .orderBy("user_id", "session_id")
    )


SQL_SESSIONIZE = f"""
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM m)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_s
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def asof_join_pandas(events, orders, *, on="user_id", left_ts="ts",
                     right_ts="o_orderdate"):
    """The applyInPandas alternative for wide per-key fan-out: co-group both
    sides by key, run ``pd.merge_asof`` per group inside Arrow batches. Use
    when one key can have so many right-side rows that the relational range
    join's intermediate explodes; data moves once (the cogroup shuffle) and
    the per-group merge is O(n log n) instead of O(n_left x n_right)."""
    import pandas as pd

    out_fields = [f"{c.name} {c.dataType.simpleString()}" for c in events.schema]
    out_fields += [
        f"{c.name} {c.dataType.simpleString()}"
        for c in orders.schema
        if c.name != on
    ]
    ddl = ", ".join(out_fields)

    def merge(le: pd.DataFrame, ri: pd.DataFrame) -> pd.DataFrame:
        le = le.sort_values(left_ts, kind="stable")
        ri = ri.sort_values(right_ts, kind="stable")
        if ri.empty:
            for c in ri.columns:
                if c != on:
                    le[c] = None
            return le
        m = pd.merge_asof(
            le, ri.drop(columns=[on]), left_on=left_ts, right_on=right_ts
        )
        return m

    return (
        events.groupBy(on)
        .cogroup(orders.groupBy(on))
        .applyInPandas(lambda le, ri: merge(le, ri), ddl)
    )


def registry() -> dict:
    return {
        "asof_join": (q_asof_join, SQL_ASOF),
        "sessionize": (q_sessionize, SQL_SESSIONIZE),
    }
