"""Last-writer-wins dedup: salted two-phase max-LSN reduce per key.

The engine-side aggregation the north rule demands (SURVEY.md §2.5 A2/A3).
The reference guarantees strict per-event ordering via sequential ids
(``/root/reference/cdc/sources/__init__.py:91-92``) and is at-least-once
(``cdc/producer.py:84-94``), so the apply side must collapse duplicates and
out-of-order deliveries; keeping only the max-LSN row per (repo, path) does
both at once (a duplicate has the same LSN and identical payload, so either
copy winning is the same row).

Physical notes for 100 TB:
- ``max_by`` aggregates get Catalyst partial aggregation automatically: each
  map task pre-collapses its rows per key before the shuffle, so a hot repo
  contributes at most one row per map partition to the exchange — the usual
  skew defusal for *aggregation*.
- For pathological skew (one key dominating even post-partial reduce of wide
  structs), ``salt > 1`` forces an explicit two-phase reduce: phase 1 groups
  on (key, salt) spreading the hot key over ``salt`` reducers, phase 2
  reduces the ≤salt survivors per key. Salt is derived from the LSN hash, so
  replays land on the same salt — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    key: tuple[str, ...] = ("repo", "path"),
    order_col: str = "lsn",
    salt: int = 1,
) -> DataFrame:
    """Keep only the max-``order_col`` row per ``key``. Preserves all other
    columns. Equivalent to Window row_number()==1 but shuffle-light: no sort,
    partial-aggregated map-side."""
    payload = [c for c in df.columns if c not in key]
    agg = F.max_by(F.struct(*payload), F.col(order_col)).alias("_s")

    if salt > 1:
        salt_col = F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt)).alias("_salt")
        partial = (
            df.withColumn("_salt", salt_col)
            .groupBy(*key, "_salt")
            .agg(agg)
            .select(*key, F.col("_s.*"))
        )
        df = partial
    return (
        df.groupBy(*key)
        .agg(agg)
        .select(*key, F.col("_s.*"))
    )


def lww_dedup_narrow(
    df: DataFrame,
    key: tuple[str, ...] = ("repo", "path"),
    order_col: str = "lsn",
) -> DataFrame:
    """LWW dedup for WIDE payloads (large ``content``): shuffle only the
    narrow (key, lsn) projection to find each key's winning LSN, broadcast
    the winners, and recover full rows with a map-side semi join — the wide
    columns never enter an exchange. Right shape when payload bytes dominate
    (source-code content at 100 TB): shuffle volume drops from O(rows x
    row_width) to O(rows x key_width).

    Falls back conceptually to ``lww_dedup`` when the winner set is too big
    to broadcast — pick per call site.
    """
    winners = df.select(*key, order_col).groupBy(*key).agg(
        F.max(order_col).alias(order_col)
    )
    out = df.join(F.broadcast(winners), [*key, order_col], "left_semi")
    # duplicate deliveries share (key, lsn) with identical payloads: keep
    # one. This shuffle's input is already <=1 row/key (+dups), i.e. the
    # winner set — not the raw batch.
    return out.dropDuplicates(list(key))


def lww_dedup_auto(
    df: DataFrame,
    key: tuple[str, ...] = ("repo", "path"),
    order_col: str = "lsn",
    *,
    salt: int = 1,
    broadcast_max_rows: int = 5_000_000,
    estimated_winners: int | None = None,
) -> tuple[DataFrame, str, DataFrame | None]:
    """Narrow LWW dedup with a broadcast-budget guard.

    The narrow variant broadcasts the per-key winner set; a batch with more
    distinct keys than fits executor memory would kill the job. The guard
    compares the winner count against ``broadcast_max_rows`` and falls back
    to the wide ``lww_dedup`` reduce when over budget — the same auto-pick
    discipline as the merge's ``batch_rows`` strategy switch.

    ``estimated_winners`` lets the caller supply a distinct-key estimate it
    already has (the apply pipeline folds an HLL ``approx_count_distinct``
    into its existing control aggregation — ZERO extra jobs); the estimate
    is compared with 10% headroom to absorb HLL error. Without an estimate
    the winner set is counted exactly (one narrow (key, lsn)-only job) and
    the materialized cache is reused for the broadcast.

    Returns ``(deduped, strategy, cached)`` where strategy is ``"narrow"``
    or ``"wide"`` and ``cached`` is the persisted winner frame the caller
    must unpersist after materializing the result (None when no cache was
    needed)."""
    if estimated_winners is not None:
        if estimated_winners <= broadcast_max_rows * 0.9:
            return (
                lww_dedup_narrow(df, key=key, order_col=order_col),
                "narrow",
                None,
            )
        return lww_dedup(df, key=key, order_col=order_col, salt=salt), "wide", None
    winners = (
        df.select(*key, order_col)
        .groupBy(*key)
        .agg(F.max(order_col).alias(order_col))
        .persist()
    )
    n_winners = winners.count()
    if n_winners <= broadcast_max_rows:
        out = df.join(F.broadcast(winners), [*key, order_col], "left_semi")
        return out.dropDuplicates(list(key)), "narrow", winners
    winners.unpersist()
    return lww_dedup(df, key=key, order_col=order_col, salt=salt), "wide", None


def collapse_duplicate_lsns(df: DataFrame, order_col: str = "lsn") -> DataFrame:
    """Drop duplicate deliveries of the same LSN (A3). Subsumed by
    ``lww_dedup`` for keyed DML; needed standalone only for control events
    where every LSN must be processed exactly once."""
    return df.dropDuplicates([order_col])
