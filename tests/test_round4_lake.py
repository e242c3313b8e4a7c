"""Round-4 VERDICT items 5-6: the bucket-chunked merge strategy (mid-size
batches keep lake bytes exchange-free) and multi-interval key-range stats
(batch-side prefix-block intervals + optional truncate-transform file
partitioning), which together fix the round-3 BENCH caveat: a batch
spanning both ends of the keyspace no longer defeats file skipping."""

import os

import pytest
from pyspark.sql import functions as F

from cdc_spark.apply import CdcApply, _fold_bstats
from cdc_spark.config import BASE_FIELDS, EngineConfig
from cdc_spark.lake import (
    LakeTable,
    _coalesce_ranges,
    _pack_buckets,
)
from cdc_spark.loggen import change_log
from cdc_spark.oracle import assert_matches, replay

_MERGE_DDL = (
    "repo STRING, path STRING, `commit` STRING, lang STRING, content STRING, "
    "_lsn BIGINT, _deleted BOOLEAN, _extra MAP<STRING,STRING>"
)


def _mk_batch(spark, keys, lsn0):
    rows = [
        (r, "src/main.py", f"c{lsn0 + i}", "py", f"body-{r}-{lsn0 + i}",
         lsn0 + i, False, None)
        for i, r in enumerate(keys)
    ]
    return spark.createDataFrame(rows, _MERGE_DDL)


# ------------------------------------------------------------ pure units
def test_pack_buckets():
    # fits in two bins of budget 10
    assert _pack_buckets({1: 6, 2: 5, 3: 4}, 10, 8) == [[1, 3], [2]]
    # single bucket over budget -> infeasible
    assert _pack_buckets({1: 11, 2: 1}, 10, 8) is None
    # needs more bins than allowed -> infeasible
    assert _pack_buckets({i: 6 for i in range(5)}, 10, 2) is None
    # deterministic given equal rows (ties broken by bucket id)
    assert _pack_buckets({3: 5, 1: 5, 2: 5}, 10, 8) == [[1, 2], [3]]


def test_coalesce_ranges():
    # overlapping + adjacent merge
    assert _coalesce_ranges([[1, 3], [2, 5], [7, 9]]) == [[1, 5], [7, 9]]
    # cap: narrowest gap closed first (ints)
    got = _coalesce_ranges([[0, 1], [3, 4], [100, 101], [103, 104]], cap=3)
    assert got == [[0, 4], [100, 101], [103, 104]] or got == [
        [0, 1], [3, 4], [100, 104]
    ]
    assert len(_coalesce_ranges([[i * 10, i * 10 + 1] for i in range(20)],
                                cap=4)) == 4
    # strings: still merges down to the cap, bounds stay true bounds
    got = _coalesce_ranges([["aa", "ab"], ["mm", "mn"], ["zy", "zz"]], cap=2)
    assert len(got) == 2 and got[0][0] == "aa" and got[-1][1] == "zz"


def test_fold_bstats_builds_intervals():
    raw = [
        {"bucket": 0, "min_lsn": 5, "max_lsn": 9, "upserts": 3, "deletes": 1,
         "min_key": "aaaa", "max_key": "aabb"},
        {"bucket": 0, "min_lsn": 2, "max_lsn": 7, "upserts": 2, "deletes": 0,
         "min_key": "zzaa", "max_key": "zzbb"},
        {"bucket": 1, "min_lsn": 1, "max_lsn": 1, "upserts": 1, "deletes": 0,
         "min_key": "mmmm", "max_key": "mmmm"},
    ]
    bstats, ranges = _fold_bstats(raw)
    assert [r["bucket"] for r in bstats] == [0, 1]
    b0 = bstats[0]
    assert (b0["min_lsn"], b0["max_lsn"]) == (2, 9)
    assert (b0["upserts"], b0["deletes"]) == (5, 1)
    assert (b0["min_key"], b0["max_key"]) == ("aaaa", "zzbb")
    # the hot+cold batch reports TWO intervals, not one folded range
    assert ranges[0] == [["aaaa", "aabb"], ["zzaa", "zzbb"]]
    assert ranges[1] == [["mmmm", "mmmm"]]


# --------------------------------------------------- chunked merge strategy
def _run(spark, root, broadcast_rows):
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "_ckpt"), n_buckets=8
    )
    applier = CdcApply(spark, cfg)
    log = change_log(spark, 3000, n_repos=25, n_paths=8, delete_rate=0.1,
                     dup_rate=0.03, seed=53)
    infos = []
    for i in range(3):
        b = log.filter(F.pmod(F.xxhash64("lsn", F.lit(7)), F.lit(3)) == i)
        applier.lake_for("repos").broadcast_max_rows = broadcast_rows
        # pin the budget-only pick: this test exercises the chunked-vs-join
        # machinery, not the round-6 batch/lake-ratio heuristic (which would
        # route these lake-sized batches to agg — covered by its own test)
        applier.lake_for("repos").join_min_lake_ratio = 0
        infos.extend(applier.apply_batch(b, i))
    return applier.lake_for("repos"), log, infos


def test_chunked_strategy_identical_and_selected(spark, tmpdir_factory_clean):
    """A batch over the broadcast budget whose buckets bin-pack must take
    the chunked strategy (not agg) and produce the oracle state."""
    r_chunk = tmpdir_factory_clean("ck")
    r_join = tmpdir_factory_clean("jn")
    # ~1000 rows/batch over 8 buckets (~125 each): budget 400 -> chunked
    lake_c, log, infos = _run(spark, r_chunk, broadcast_rows=400)
    assert {i["strategy"] for i in infos} == {"chunked"}
    assert all(i["chunks"] and i["chunks"] > 1 for i in infos)
    lake_j, _, infos_j = _run(spark, r_join, broadcast_rows=10_000_000)
    assert {i["strategy"] for i in infos_j} == {"join"}
    import pandas as pd

    pc = lake_c.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pj = lake_j.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pc, pj)
    assert_matches(pc, replay(log.toPandas(), EngineConfig().base_fields))


def test_chunked_falls_back_to_agg_when_one_bucket_too_big(
    spark, tmpdir_factory_clean
):
    """A single bucket over the broadcast budget cannot chunk — auto-pick
    must land on agg, result unchanged."""
    root = tmpdir_factory_clean("ckagg")
    lake_a, log, infos = _run(spark, root, broadcast_rows=20)
    assert {i["strategy"] for i in infos} == {"agg"}
    assert_matches(
        lake_a.read().toPandas(), replay(log.toPandas(), EngineConfig().base_fields)
    )


def test_chunked_plan_lake_side_no_exchange(spark, tmpdir_factory_clean):
    """The chunked shape is a union of per-chunk broadcast joins: the lake
    (parquet) side of every chunk must reach the union without an
    Exchange."""
    root = tmpdir_factory_clean("ckplan")
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "_ckpt"), n_buckets=4
    )
    applier = CdcApply(spark, cfg)
    applier.apply_batch(change_log(spark, 1000, n_repos=10, seed=3), 0)
    lake = applier.lake_for("repos")
    probe = None
    for some in ([0, 1], [2, 3]):
        flist = [f for f in lake.meta["files"] if f["bucket"] in some]
        if not flist:
            continue
        old = lake._read_files(flist, lake.schema_fields())
        bk = F.broadcast(
            lake.read(include_meta=True)
            .select("repo", "path", F.col("_lsn").alias("_b"))
        )
        keep_old = old.join(bk, ["repo", "path"], "left").filter(
            F.col("_b").isNull() | (F.col("_b") <= F.col("_lsn"))
        )
        probe = keep_old if probe is None else probe.unionByName(keep_old)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


# ------------------------------- the round-3 caveat: hot+cold in ONE batch
def test_straddling_batch_still_skips_middle_files(spark, tmpdir_factory_clean):
    """BENCH round-3 caveat: a batch touching BOTH ends of the keyspace
    used to fold into one huge range and rewrite every file between. With
    interval lists the middle (cold) file survives untouched."""
    root = tmpdir_factory_clean("straddle")
    lake = LakeTable.create(
        spark, os.path.join(root, "t"), fields=list(BASE_FIELDS), n_buckets=1
    )
    mid = [f"mmmm-{c}" for c in "abcdefgh"]
    lake.merge(_mk_batch(spark, mid, 100), batch_id=0, lsn_hwm=200,
               batch_rows=len(mid))
    f_mid = next(f["path"] for f in lake.meta["files"])
    lows = [f"aaaa-{c}" for c in "abcd"]
    highs = [f"zzzz-{c}" for c in "abcd"]
    # the straddling batch, with its per-cluster intervals (what
    # _fold_bstats now produces): middle file must be left in place
    lake.merge(
        _mk_batch(spark, lows + highs, 300), batch_id=1, lsn_hwm=400,
        batch_rows=len(lows) + len(highs),
        bucket_key_ranges={0: [["aaaa-a", "aaaa-d"], ["zzzz-a", "zzzz-d"]]},
    )
    paths = {f["path"] for f in lake.meta["files"]}
    assert f_mid in paths
    # folded legacy tuple for the same batch would NOT have skipped: prove
    # the old behavior really was the caveat
    lake2 = LakeTable.create(
        spark, os.path.join(root, "t2"), fields=list(BASE_FIELDS), n_buckets=1
    )
    lake2.merge(_mk_batch(spark, mid, 100), batch_id=0, lsn_hwm=200,
                batch_rows=len(mid))
    f_mid2 = next(f["path"] for f in lake2.meta["files"])
    lake2.merge(
        _mk_batch(spark, lows + highs, 300), batch_id=1, lsn_hwm=400,
        batch_rows=len(lows) + len(highs),
        bucket_key_ranges={0: ("aaaa-a", "zzzz-d")},
    )
    assert f_mid2 not in {f["path"] for f in lake2.meta["files"]}
    # both lakes end at the same logical state
    a = lake.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = lake2.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_end_to_end_straddling_batch_skips(spark, tmpdir_factory_clean):
    """Same caveat through the FULL apply path: _fold_bstats' prefix-block
    intervals (cfg.key_block_prefix) must let the cold file survive a
    hot+cold batch."""
    from cdc_spark.config import ENVELOPE_DDL

    root = tmpdir_factory_clean("estraddle")
    cfg = EngineConfig(
        lake_root=root, checkpoint=os.path.join(root, "_ckpt"), n_buckets=1
    )
    applier = CdcApply(spark, cfg)
    lake = applier.lake_for("repos")

    def env_batch(keys, lsn0):
        rows = [
            (lsn0 + i, "insert", "repos", r, "p", f"c{lsn0 + i}", "py",
             f"body-{r}", None, None)
            for i, r in enumerate(keys)
        ]
        return spark.createDataFrame(rows, ENVELOPE_DDL)

    applier.apply_batch(env_batch([f"mmmm-{c}" for c in "abcdefgh"], 100), 0)
    f_mid = next(f["path"] for f in lake.meta["files"])
    applier.apply_batch(
        env_batch([f"aaaa-{c}" for c in "abcd"]
                  + [f"zzzz-{c}" for c in "abcd"], 300),
        1,
    )
    assert f_mid in {f["path"] for f in lake.refresh().meta["files"]}


# -------------------------- truncate-transform file partitioning (opt-in)
def test_file_block_partitioning_splits_clusters(spark, tmpdir_factory_clean):
    """With file_block_prefix on, one merge containing two key clusters
    writes SEPARATE files per cluster (tight ranges), so a later
    mid-keyspace batch rewrites neither — the file-side half of the
    caveat, which per-row-group stats cannot fix (a key-sorted mixed file
    always has a bridging row group over the gap)."""
    root = tmpdir_factory_clean("fblock")
    lake = LakeTable.create(
        spark, os.path.join(root, "t"), fields=list(BASE_FIELDS), n_buckets=1
    )
    lake.file_block_prefix = 4
    both = [f"aaaa-{c}" for c in "abcd"] + [f"zzzz-{c}" for c in "abcd"]
    lake.merge(_mk_batch(spark, both, 100), batch_id=0, lsn_hwm=200,
               batch_rows=len(both))
    files = lake.meta["files"]
    assert len(files) == 2  # one per key cluster
    bounds = sorted((f["min_key"], f["max_key"]) for f in files)
    assert bounds[0][1] < "zzzz" and bounds[1][0] > "aaaa-d"
    pre = {f["path"] for f in files}
    assert all("_kblk=" in p for p in pre)
    # a mid-keyspace batch touches NEITHER cluster file
    lake.merge(
        _mk_batch(spark, ["mmmm-a", "mmmm-b"], 300), batch_id=1, lsn_hwm=400,
        batch_rows=2, bucket_key_ranges={0: [["mmmm-a", "mmmm-b"]]},
    )
    assert pre <= {f["path"] for f in lake.meta["files"]}
    assert lake.read().count() == len(both) + 2
    # update ONE cluster: only that cluster's file is rewritten
    lake.merge(
        _mk_batch(spark, ["aaaa-a"], 500), batch_id=2, lsn_hwm=500,
        batch_rows=1, bucket_key_ranges={0: [["aaaa-a", "aaaa-a"]]},
    )
    paths3 = {f["path"] for f in lake.meta["files"]}
    zfile = next(f["path"] for f in files if f["min_key"].startswith("zzzz"))
    afile = next(f["path"] for f in files if f["min_key"].startswith("aaaa"))
    assert zfile in paths3 and afile not in paths3
    got = {(r["repo"], r["content"]) for r in lake.read().collect()}
    assert ("aaaa-a", "body-aaaa-a-500") in got


def test_key_ranges_recorded_per_row_group(spark, tmpdir_factory_clean):
    """The manifest records per-row-group interval lists (coalesced) when
    the writer emits multiple row groups; legacy min/max stay the folds."""
    root = tmpdir_factory_clean("rgstats")
    lake = LakeTable.create(
        spark, os.path.join(root, "t"), fields=list(BASE_FIELDS), n_buckets=1
    )
    lake.parquet_block_size = 1024  # tiny row groups
    keys = [f"r{i:05d}" for i in range(0, 4000, 2)]
    lake.merge(_mk_batch(spark, keys, 10_000), batch_id=0, lsn_hwm=20_000,
               batch_rows=len(keys))
    f = lake.meta["files"][0]
    assert f["key_ranges"] is not None and len(f["key_ranges"]) > 1
    from cdc_spark.lake import MAX_KEY_RANGES

    assert len(f["key_ranges"]) <= MAX_KEY_RANGES
    # intervals tile the folded range in order
    assert f["key_ranges"][0][0] == f["min_key"]
    assert f["key_ranges"][-1][1] == f["max_key"]
    los = [r[0] for r in f["key_ranges"]]
    assert los == sorted(los)
    # legacy manifests (no key_ranges) still prune via min/max
    from cdc_spark.lake import _file_ranges

    legacy = {"min_key": "a", "max_key": "b"}
    assert _file_ranges(legacy) == [["a", "b"]]
    assert _file_ranges({"min_key": None, "max_key": None}) is None


def test_expire_snapshots_keeps_live_kblk_files(spark, tmpdir_factory_clean):
    """Round-4 review catch: with file_block_prefix on, data files live one
    dir level deeper (_bucket=K/_kblk=P/*.parquet); the empty-dir sweep in
    expire_snapshots must check emptiness RECURSIVELY or it rmtree's live
    manifest-referenced data."""
    root = tmpdir_factory_clean("kblkexp")
    lake = LakeTable.create(
        spark, os.path.join(root, "t"), fields=list(BASE_FIELDS), n_buckets=1
    )
    lake.file_block_prefix = 4
    keys = [f"aaaa-{c}" for c in "abcd"] + [f"zzzz-{c}" for c in "abcd"]
    lake.merge(_mk_batch(spark, keys, 100), batch_id=0, lsn_hwm=200,
               batch_rows=len(keys))
    lake.merge(_mk_batch(spark, ["aaaa-a"], 300), batch_id=1, lsn_hwm=300,
               batch_rows=1, bucket_key_ranges={0: [["aaaa-a", "aaaa-a"]]})
    lake.merge(_mk_batch(spark, ["zzzz-a"], 400), batch_id=2, lsn_hwm=400,
               batch_rows=1, bucket_key_ranges={0: [["zzzz-a", "zzzz-a"]]})
    before = lake.read().count()
    lake.expire_snapshots(keep_last=1, orphan_grace_s=0)
    # every manifest-referenced file still exists and the table still reads
    for f in lake.meta["files"]:
        assert os.path.exists(os.path.join(lake.root, f["path"])), f["path"]
    assert lake.read().count() == before == len(keys)


def test_fold_bstats_null_key_group_first(spark):
    """Accumulated min/max can start as None (all-null-key prefix group
    seen first) — a later non-null group must not TypeError."""
    raw = [
        {"bucket": 0, "min_lsn": 1, "max_lsn": 1, "upserts": 1, "deletes": 0,
         "min_key": None, "max_key": None},
        {"bucket": 0, "min_lsn": 2, "max_lsn": 2, "upserts": 1, "deletes": 0,
         "min_key": "abc", "max_key": "abd"},
    ]
    bstats, ranges = _fold_bstats(raw)
    assert bstats[0]["min_key"] == "abc" and bstats[0]["max_key"] == "abd"
    assert ranges[0] == [["abc", "abd"]]


# ------------------------------------------------- property-based invariants
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 10**6)).map(
            lambda t: [min(t), max(t)]
        ),
        min_size=1, max_size=40,
    ),
    st.integers(1, 8),
)
def test_coalesce_ranges_properties(ranges, cap):
    """For any interval set: output is <= cap, sorted, non-overlapping,
    covers every input point, and preserves the global bounds."""
    ranges = sorted(ranges, key=lambda r: (r[0], r[1]))
    out = _coalesce_ranges([list(r) for r in ranges], cap=cap)
    assert 1 <= len(out) <= cap
    assert all(a[1] < b[0] for a, b in zip(out, out[1:]))  # disjoint+sorted
    assert out[0][0] == min(r[0] for r in ranges)
    assert out[-1][1] == max(r[1] for r in ranges)
    for lo, hi in ranges:  # every input interval is covered by ONE output
        assert any(o[0] <= lo and hi <= o[1] for o in out)


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(st.integers(0, 63), st.integers(1, 1000),
                    min_size=1, max_size=32),
    st.integers(1, 2000),
    st.integers(1, 32),
)
def test_pack_buckets_properties(bucket_rows, budget, max_groups):
    """Feasible packs partition ALL buckets with every bin under budget;
    infeasibility only when a bucket alone exceeds budget or the pack
    needs more bins than allowed."""
    plan = _pack_buckets(bucket_rows, budget, max_groups)
    if plan is None:
        # infeasibility has exactly two legal causes: a single bucket over
        # budget, or (all fit but) more bins needed than allowed — and FFD
        # never uses more bins than items, so the bin-count cause implies
        # max_groups < len(bucket_rows)
        assert any(v > budget for v in bucket_rows.values()) or (
            max_groups < len(bucket_rows)
        )
        return
    flat = [b for grp in plan for b in grp]
    assert sorted(flat) == sorted(bucket_rows)  # exact partition
    assert len(plan) <= max_groups
    for grp in plan:
        assert sum(bucket_rows[b] for b in grp) <= budget


def test_mixed_strategy_aggs_only_hot_buckets(spark, tmpdir_factory_clean):
    """A batch with one individually-over-budget bucket and several small
    ones takes the MIXED strategy (chunked joins + agg for just the hot
    bucket) and produces the same state as a pure join run."""
    from cdc_spark.lake import bucket_expr

    root = tmpdir_factory_clean("mixed")
    keys = [f"repo-{i:03d}" for i in range(60)]
    # real bucket of each key (the merge's own hash)
    bdf = spark.createDataFrame([(k, "src/main.py") for k in keys],
                                "repo STRING, path STRING")
    rows = bdf.select(
        "repo", bucket_expr(("repo", "path"), 4).alias("b")
    ).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["b"], []).append(r["repo"])
    counts = {b: len(ks) for b, ks in by_bucket.items()}
    hot = max(counts, key=counts.get)
    budget = counts[hot] - 1
    assert any(v <= budget for b, v in counts.items() if b != hot)

    def _build(strategy_budget):
        r = tmpdir_factory_clean(f"mx{strategy_budget}")
        lake = LakeTable.create(
            spark, os.path.join(r, "t"), fields=list(BASE_FIELDS),
            n_buckets=4,
        )
        lake.merge(_mk_batch(spark, keys[::2], 100), batch_id=0,
                   lsn_hwm=200, batch_rows=len(keys[::2]))
        lake.broadcast_max_rows = strategy_budget
        lake.join_min_lake_ratio = 0  # pin the budget-only pick (see _run)
        info = lake.merge(
            _mk_batch(spark, keys, 300), batch_id=1, lsn_hwm=400,
            batch_rows=len(keys), bucket_batch_rows=counts,
        )
        return lake, info

    lake_m, info_m = _build(budget)
    assert info_m["strategy"] == "mixed"
    assert info_m["agg_buckets"] == sum(
        1 for v in counts.values() if v > budget
    )
    assert info_m["chunks"] and info_m["chunks"] >= 1
    lake_j, info_j = _build(10_000_000)
    assert info_j["strategy"] == "join"
    import pandas as pd

    a = lake_m.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = lake_j.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # LWW invariant held through the mixed write
    assert lake_m.read().count() == len(keys)
