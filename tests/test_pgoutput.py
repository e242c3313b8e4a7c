"""pgoutput binary wire decode: golden byte vectors against the published
PostgreSQL message formats, as-of Relation resolution, schema_change
derivation, and the full loggen envelope -> encode -> decode round trip."""

import pytest
from pyspark.sql import functions as F

from cdc_spark import pgoutput as pg
from cdc_spark.loggen import change_log
from cdc_spark.pgoutput import (
    decode_pgoutput,
    enc_begin,
    enc_commit,
    enc_delete,
    enc_insert,
    enc_relation,
    enc_truncate,
    enc_update,
    encode_envelope,
    parse_pgoutput,
    schema_change_events,
)


# ---------------------------------------------------------------------------
# golden byte vectors (hand-assembled from the documented format; these pin
# the ENCODER so the roundtrip tests can't pass via a shared wrong scheme)
# ---------------------------------------------------------------------------


def test_golden_relation_bytes():
    got = enc_relation(
        1, "repos", [("repo", "string")], key_cols=frozenset({"repo"})
    )
    exp = (
        b"R"
        + (1).to_bytes(4, "big")
        + b"public\x00repos\x00d"
        + (1).to_bytes(2, "big")
        + b"\x01repo\x00"
        + (25).to_bytes(4, "big")  # TEXTOID
        + b"\xff\xff\xff\xff"  # typmod -1
    )
    assert got == exp


def test_golden_insert_with_null():
    got = enc_insert(7, ["x", None])
    exp = (
        b"I"
        + (7).to_bytes(4, "big")
        + b"N"
        + (2).to_bytes(2, "big")
        + b"t"
        + (1).to_bytes(4, "big")
        + b"x"
        + b"n"
    )
    assert got == exp


def test_golden_truncate():
    assert enc_truncate([3, 9]) == (
        b"T" + (2).to_bytes(4, "big") + b"\x00"
        + (3).to_bytes(4, "big") + (9).to_bytes(4, "big")
    )


def test_golden_begin_commit():
    assert enc_begin(0x0A, 5, 99) == (
        b"B" + (10).to_bytes(8, "big") + (5).to_bytes(8, "big")
        + (99).to_bytes(4, "big")
    )
    c = enc_commit(1, 2, 3)
    assert c[0:2] == b"C\x00" and len(c) == 26


def test_relation_type_roundtrip():
    cols = [
        ("a", "string"), ("b", "long"), ("c", "boolean"), ("d", "double"),
        ("e", "timestamp"), ("f", "date"), ("g", "decimal(10,3)"),
    ]
    relid, ns, name, names, types = pg._parse_relation(
        enc_relation(42, "t", cols, namespace="ns")
    )
    assert (relid, ns, name) == (42, "ns", "t")
    assert list(zip(names, types)) == cols


# ---------------------------------------------------------------------------
# decode semantics
# ---------------------------------------------------------------------------


def _bin_df(spark, rows):
    return spark.createDataFrame(
        [(l, bytearray(v)) for l, v in rows], "lsn BIGINT, value BINARY"
    )


def test_decode_asof_relation_and_ops(spark):
    cols_v1 = [("repo", "string"), ("path", "string"), ("content", "string")]
    cols_v2 = cols_v1 + [("stars", "long")]
    stream = [
        (0, enc_relation(1, "repos", cols_v1)),
        (1, enc_begin()),
        (2, enc_insert(1, ["r1", "p1", "hello"])),
        (3, enc_update(1, ["r1", "p1", "world"], old_key=["r1", "p1"])),
        (4, enc_commit()),
        (10, enc_relation(1, "repos", cols_v2)),  # add stars
        (11, enc_insert(1, ["r2", "p2", "hi", "5"])),
        (12, enc_delete(1, ["r1", "p1", None, None])),  # K tuple: key only
        (13, enc_truncate([1])),
    ]
    out = decode_pgoutput(_bin_df(spark, stream))
    rows = {r["lsn"]: r for r in out.collect()}
    assert rows[2]["op"] == "insert" and rows[2]["columnvalues"] == ["r1", "p1", "hello"]
    # update decodes the NEW tuple, not the old key
    assert rows[3]["op"] == "update" and rows[3]["columnvalues"] == ["r1", "p1", "world"]
    # post-relation-change DML resolves the 4-column version
    assert rows[11]["columnnames"] == ["repo", "path", "content", "stars"]
    # delete K-tuple: nulls omitted, key columns survive
    assert rows[12]["op"] == "delete"
    assert rows[12]["columnnames"] == ["repo", "path"]
    assert rows[13]["op"] == "truncate" and rows[13]["table"] == "repos"
    assert rows[1]["op"] == "begin" and rows[4]["op"] == "commit"
    # the Relation diff surfaced as a schema_change control row at lsn 10
    sc = [r for r in rows.values() if r["op"] == "schema_change"]
    assert len(sc) == 1 and sc[0]["lsn"] == 10
    assert sc[0]["schema_change"] == (
        '{"action": "add", "column": "stars", "type": "long"}'
    )


def test_schema_change_events_add_drop_retype():
    tl = {
        1: [
            (0, "t", ["a", "b"], ["string", "long"]),
            (5, "t", ["a", "c"], ["long", "string"]),
        ]
    }
    evs = schema_change_events(tl)
    acts = sorted(e[2] for e in evs)
    assert acts == [
        '{"action": "add", "column": "c", "type": "string"}',
        '{"action": "drop", "column": "b"}',
        '{"action": "retype", "column": "a", "type": "long"}',
    ]
    assert all(e[0] == 5 and e[1] == "t" for e in evs)


def test_dml_before_relation_raises(spark):
    stream = [(2, enc_insert(1, ["x"])), (5, enc_relation(1, "t", [("a", "string")]))]
    with pytest.raises(Exception, match="precedes any Relation"):
        decode_pgoutput(_bin_df(spark, stream)).collect()


def test_unknown_message_is_generic(spark):
    stream = [
        (0, enc_relation(1, "t", [("a", "string")])),
        (1, b"Mxyz"),  # logical-decoding Message -> generic fallback
    ]
    out = decode_pgoutput(_bin_df(spark, stream)).collect()
    assert [r["op"] for r in sorted(out, key=lambda r: r["lsn"])] == ["generic"]


# ---------------------------------------------------------------------------
# envelope round trip: loggen -> encode -> parse_pgoutput == loggen
# ---------------------------------------------------------------------------

_CANON = [
    "lsn", "op", "table", "repo", "path", "commit", "lang", "content",
    "extra_j", "schema_change",
]


def _canon(df):
    ext = F.coalesce(
        F.col("extra"), F.expr("map()").cast("map<string,string>")
    )
    return (
        df.withColumn(
            "extra_j", F.to_json(F.array_sort(F.map_entries(ext)))
        )
        .select(*_CANON)
        .orderBy("lsn", "op")
        .collect()
    )


def test_envelope_roundtrip_exact(spark):
    schema_changes = {
        300: {"action": "add", "column": "stars", "type": "long"},
        500: {"action": "add", "column": "score", "type": "decimal(10,3)"},
        700: {"action": "retype", "column": "stars", "type": "string"},
        900: {"action": "drop", "column": "score"},
    }
    env = change_log(
        spark, 1200, n_repos=20, n_paths=10,
        truncate_lsns=(600,), schema_changes=schema_changes, seed=7,
    )
    # the wire can only carry columns in the current Relation version:
    # after the drop at 900, loggen still emits "score" in extra but
    # pgoutput (correctly) cannot — the apply engine ignores out-of-schema
    # extra entries either way, so fidelity is exact modulo dropped cols.
    env = env.withColumn(
        "extra",
        F.when(
            F.col("lsn") > 900,
            F.map_filter(F.col("extra"), lambda k, _: k != F.lit("score")),
        ).otherwise(F.col("extra")),
    )
    wire = encode_envelope(env, schema_changes)
    back = parse_pgoutput(wire)
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in env.schema
    ]
    exp, got = _canon(env), _canon(back)
    assert len(exp) == len(got) == 1200
    for e, g in zip(exp, got):
        assert e == g, f"mismatch at lsn {e['lsn']}:\n exp {e}\n got {g}"


def test_roundtrip_content_sha_invariant(spark):
    env = change_log(spark, 400, seed=3)
    back = parse_pgoutput(encode_envelope(env))
    exp = env.filter("op <> 'truncate' AND op <> 'schema_change'").select(
        "lsn", F.sha2("content", 256).alias("h")
    )
    got = back.filter(F.col("content").isNotNull()).select(
        "lsn", F.sha2("content", 256).alias("h")
    )
    assert exp.exceptAll(got).count() == 0 and got.exceptAll(exp).count() == 0


# ---------------------------------------------------------------------------
# round-5 review-pass regressions (delivery order / protocol validation)
# ---------------------------------------------------------------------------


def test_tuple_width_mismatch_raises(spark):
    """A DML whose tuple width disagrees with the as-of Relation must fail
    loudly (silent zip would pair values against the wrong columns)."""
    stream = [
        (0, enc_relation(1, "t", [("a", "string"), ("b", "string")])),
        (1, enc_insert(1, ["x", "y", "z"])),  # 3 values vs 2 columns
    ]
    with pytest.raises(Exception, match="tuple width"):
        decode_pgoutput(_bin_df(spark, stream)).collect()


def test_dml_for_unknown_relid_is_descriptive(spark):
    stream = [
        (0, enc_relation(1, "t", [("a", "string")])),
        (1, enc_insert(7, ["x"])),  # relid 7 never announced
    ]
    with pytest.raises(Exception, match="no Relation message seen"):
        decode_pgoutput(_bin_df(spark, stream)).collect()


def test_conflicting_same_lsn_relations_raise(spark):
    stream = [
        (0, enc_relation(1, "t", [("a", "string")])),
        (0, enc_relation(1, "t", [("a", "string"), ("b", "string")])),
        (1, enc_insert(1, ["x"])),
    ]
    with pytest.raises(Exception, match="conflicting Relation"):
        decode_pgoutput(_bin_df(spark, stream)).collect()
    # exact duplicate delivery of the SAME message dedupes silently
    dup = [
        (0, enc_relation(1, "t", [("a", "string")])),
        (0, enc_relation(1, "t", [("a", "string")])),
        (1, enc_insert(1, ["x"])),
    ]
    rows = decode_pgoutput(_bin_df(spark, dup)).collect()
    assert {r["op"] for r in rows} == {"insert"}


def test_column_versions_folds_same_lsn_change():
    """A schema change keyed at the initial version's LSN folds INTO that
    version instead of emitting two Relations at one LSN."""
    vs = pg.column_versions({0: {"action": "add", "column": "src"}})
    assert len(vs) == 1 and vs[0][0] == 0
    assert ("src", "string") in vs[0][1]
    vs2 = pg.column_versions({5: {"action": "add", "column": "src"}})
    assert [v[0] for v in vs2] == [0, 5]


def test_decoder_registry_skips_unchanged_resends(spark, tmp_path):
    """A reconnecting connector re-sends an unchanged Relation at a fresh
    LSN — the persistent registry must not grow per reconnect."""
    from cdc_spark.pgoutput import PgOutputDecoder

    reg = str(tmp_path / "rels.json")
    cols = [("repo", "string"), ("path", "string"), ("content", "string")]
    dec = PgOutputDecoder(reg)
    b1 = [
        (0, enc_relation(1, "repos", cols)),
        (1, enc_insert(1, ["r", "p", "c"])),
    ]
    dec(_bin_df(spark, b1)).collect()
    assert len(dec._timeline[1]) == 1
    # reconnect: same relation re-announced at lsn 100, then real change
    b2 = [
        (100, enc_relation(1, "repos", cols)),
        (101, enc_insert(1, ["r2", "p2", "c2"])),
    ]
    out2 = dec(_bin_df(spark, b2)).collect()
    assert len(dec._timeline[1]) == 1  # unchanged re-send skipped
    assert not [r for r in out2 if r["op"] == "schema_change"]
    b3 = [(200, enc_relation(1, "repos", cols + [("stars", "long")]))]
    out3 = dec(_bin_df(spark, b3)).collect()
    assert len(dec._timeline[1]) == 2  # real change appended
    assert [r["op"] for r in out3 if r["op"] == "schema_change"]


def test_write_segments_mtimes_follow_segment_order(spark, tmp_path):
    """Spark's file stream delivers batches in mtime order; a real WAL is
    written sequentially, so the harness must stamp seg=K files strictly
    older than seg=K+1's (the parallel write job alone does NOT guarantee
    it — task completion order is scheduler noise)."""
    import glob
    import os

    from cdc_spark.loggen import write_segments

    d = str(tmp_path / "wal")
    log = change_log(spark, 12000, n_repos=20, seed=3)
    n = write_segments(log, d, seg_size=500)
    assert n >= 12
    stamps = []
    for seg_dir in sorted(
        glob.glob(os.path.join(d, "seg=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    ):
        files = [f for f in glob.glob(os.path.join(seg_dir, "*"))]
        stamps.append(max(os.path.getmtime(f) for f in files))
    assert stamps == sorted(stamps)
    assert len(set(stamps)) == len(stamps)  # strictly increasing


def test_decoder_registry_rejects_cross_batch_lsn_conflict(spark, tmp_path):
    """A Relation at an already-stored LSN with DIFFERENT content must
    fail loudly across batches too (same-width renames defeat the tuple
    width check) — the cross-batch twin of the in-batch same-LSN guard."""
    from cdc_spark.pgoutput import PgOutputDecoder

    reg = str(tmp_path / "rels.json")
    dec = PgOutputDecoder(reg)
    dec(_bin_df(spark, [(0, enc_relation(1, "t", [("a", "string")]))])).collect()
    with pytest.raises(Exception, match="conflicts with the registry"):
        dec(
            _bin_df(spark, [(0, enc_relation(1, "t", [("b", "string")]))])
        ).collect()
    # the identical version replays cleanly
    out = dec(
        _bin_df(spark, [(0, enc_relation(1, "t", [("a", "string")])),
                        (1, enc_insert(1, ["x"]))])
    ).collect()
    assert [r["op"] for r in out] == ["insert"]
