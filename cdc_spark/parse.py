"""Frame parsing + wal2json decode as vectorized column expressions.

Reference behavior being reproduced (NOT ported):

- ``parse_message_with_headers`` (``/root/reference/cdc/sources/backends/
  postgres_logical.py:37-80``): dispatch on the 2-byte prefix ``B|``/``C|``/
  ``G|``/``M|``; for ``M|`` find the first *unescaped* ``|`` to split the
  table name (escapes: ``\\\\`` -> ``\\``, ``\\|`` -> ``|``); anything
  unrecognized falls back to a generic message.
- wal2json change payloads with parallel arrays columnnames/columnvalues
  (``tests/cdc/sources/backends/test_parse_msg.py:14-23``).

The reference does this byte-at-a-time in Python. Here both steps are
whole-stage-codegen JVM expressions: the escape-aware split is one regex
(``(?:\\\\.|[^|\\\\])*`` — longest run of escaped-pairs/non-delimiters), the
unescape is one backreference replace, and the JSON decode is ``from_json``.
Zero per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import ENVELOPE_DDL

# wal2json change-event schema (values serialized as strings by our framer;
# see decode notes below for heterogeneous-type payloads).
WAL2JSON_DDL = (
    "event STRING, kind STRING, schema STRING, `table` STRING, "
    "columnnames ARRAY<STRING>, columntypes ARRAY<STRING>, "
    "columnvalues ARRAY<STRING>"
)

GENERIC_DDL = "event STRING, `table` STRING, schema_change STRING"

BASE_COLUMNS = ("repo", "path", "commit", "lang", "content")

# longest prefix of escaped-pairs or non-(|,\) chars == everything up to the
# first unescaped delimiter (reference postgres_logical.py:56-68)
_TABLE_RE = r"^M\|((?:\\.|[^|\\])*)\|"


def envelope_base_extra(cols, is_change):
    """The name->value map lift shared by every wire front end (wal2json,
    pgoutput): typed base columns by name, everything else into ``extra``.
    ``cols`` is a map<string,string> column; ``is_change`` gates non-DML
    rows to NULL."""
    base = [
        F.when(is_change, F.element_at(cols, c)).alias(c) for c in BASE_COLUMNS
    ]
    extra = F.when(
        is_change,
        F.map_filter(cols, lambda k, _: ~k.isin(*[F.lit(c) for c in BASE_COLUMNS])),
    )
    return base, extra


def lock_envelope(df: DataFrame) -> DataFrame:
    """Project to ``ENVELOPE_DDL``'s exact column order/set — the contract
    every wire front end must emit."""
    names = [f.split()[0].strip("`") for f in ENVELOPE_DDL.split(", ")]
    return df.select(*[F.col(f"`{n}`") for n in names])


def split_frame(df: DataFrame, value: str = "value") -> DataFrame:
    """(lsn, value) -> (lsn, frame_op, table, body).

    frame_op: begin|commit|generic|change; ``table`` only for change frames
    (unescaped); ``body`` is the JSON payload after the frame header.
    Untagged input falls back to generic with the whole value as body,
    mirroring the reference's ``parse_generic_message`` fallback
    (``postgres_logical.py:76-80``).
    """
    v = F.col(value)
    tag = F.substring(v, 1, 2)
    esc_table = F.regexp_extract(v, _TABLE_RE, 1)
    is_m = tag == F.lit("M|")
    # unescape ONLY the two reference escapes (\\ -> \ and \| -> |); other
    # backslash sequences (e.g. a table literally named 'a\nb') pass through
    # untouched, exactly like the reference's byte parser
    # (postgres_logical.py:56-68) — stripping every escaped pair would route
    # foreign frames to a different table than the reference would.
    table = F.when(is_m, F.regexp_replace(esc_table, r"\\([\\|])", r"$1"))
    # body starts after 'M|' + esc_table + '|'
    m_body = v.substr(F.length(esc_table) + F.lit(4), F.length(v))
    frame_op = (
        F.when(tag == "B|", F.lit("begin"))
        .when(tag == "C|", F.lit("commit"))
        .when(tag == "G|", F.lit("generic"))
        .when(is_m, F.lit("change"))
        .otherwise(F.lit("generic"))
    )
    body = (
        F.when(is_m, m_body)
        .when(tag.isin("B|", "C|", "G|"), F.substring(v, 3, 2147483647))
        .otherwise(v)
    )
    return df.select(
        "lsn", frame_op.alias("frame_op"), table.alias("table"), body.alias("body")
    )


def decode_wal2json(split: DataFrame, variant: bool = False) -> DataFrame:
    """Split frames -> the fixed envelope (``ENVELOPE_DDL``).

    Change frames decode their wal2json body; the parallel columnnames /
    columnvalues arrays become a map, from which the fixed base columns are
    lifted out (typed fast path) and the remainder stays in ``extra`` for
    schema-evolved columns. Generic frames re-hydrate control ops
    (truncate / schema_change) from their JSON body.

    ``variant=True`` decodes TRUE wal2json, whose columnvalues carry mixed
    JSON types (unquoted numbers/booleans — the reference's 16-Postgres-type
    fixture, ``tests/cdc/sources/backends/test_parse_msg.py:14-23``):
    ``parse_json`` -> VARIANT -> array<string> canonicalizes every value,
    all JVM-side. The default ``from_json`` path is for payloads whose
    values are already strings (our framer)."""
    g = F.from_json(F.col("body"), GENERIC_DDL)
    if variant:
        v = F.parse_json(
            F.when(F.col("frame_op") == "change", F.col("body"))
        )
        w = F.struct(
            F.variant_get(v, "$.kind", "string").alias("kind"),
            F.variant_get(v, "$.columnnames", "array<string>").alias(
                "columnnames"
            ),
            F.variant_get(v, "$.columnvalues", "array<string>").alias(
                "columnvalues"
            ),
        )
    else:
        w = F.from_json(F.col("body"), WAL2JSON_DDL)
    cols = F.map_from_arrays(w["columnnames"], w["columnvalues"])
    is_change = F.col("frame_op") == "change"
    # generic frames re-hydrate only KNOWN control ops; anything else stays
    # 'generic' (reference: unrecognized payloads -> GenericMessage)
    known_ctrl = g["event"].isin("truncate", "schema_change", "begin", "commit")
    op = (
        F.when(is_change, w["kind"])
        .when(
            F.col("frame_op") == "generic",
            F.when(known_ctrl, g["event"]).otherwise(F.lit("generic")),
        )
        .otherwise(F.col("frame_op"))
    )
    base, extra = envelope_base_extra(cols, is_change)
    table = F.coalesce(F.col("table"), g["table"])
    return split.select(
        "lsn",
        op.alias("op"),
        table.alias("table"),
        *base,
        extra.alias("extra"),
        F.when(~is_change, g["schema_change"]).alias("schema_change"),
    )


def parse_frames(
    df: DataFrame, value: str = "value", variant: bool = False
) -> DataFrame:
    """Full wire-to-envelope pipeline: split_frame |> decode_wal2json."""
    return lock_envelope(decode_wal2json(split_frame(df, value), variant=variant))


def with_content_hash(df: DataFrame, col: str = "content") -> DataFrame:
    """Per-row sha256(content) — the BASELINE invariant column (built-in,
    JVM-vectorized; P8 in SURVEY.md §2.2)."""
    return df.withColumn("content_sha256", F.sha2(F.col(col), 256))


def format_datetime(col):
    """The reference's only scalar formatter: DATE_TRUNC('second', col)
    (``/root/reference/cdc/snapshots/sources/postgres_snapshot.py:91-96``)."""
    return F.date_trunc("second", col).cast("timestamp")
