"""Pluggable streaming source backends + registry.

The reference wires its replication source through a name -> factory
registry (``/root/reference/cdc/sources/backends/__init__.py:44-46``,
``cdc/utils/registry.py:9-14``) so a production connector is a drop-in. The
engine's analog: a backend is a factory ``(spark, cfg, conf) -> streaming
DataFrame`` producing the fixed ENVELOPE (``config.ENVELOPE_DDL``);
everything downstream (apply, forward, monitor) is backend-agnostic.

Shipped backends:

- ``file-segments`` — parquet WAL-segment dirs (``seg=K/``), the sandbox's
  replication slot: Spark's file-source offset log under the checkpoint IS
  the slot's restart LSN (reference S3 semantics). ``conf``:
  ``{"path": dir, "wire_format": "envelope"|"framed"|"pgoutput"}``
  (``framed: true`` is the legacy spelling of ``wire_format: framed``;
  ``pgoutput`` = binary pgoutput messages, decoded per-microbatch in
  foreachBatch against a persistent Relation registry — ``stream.py``).
- ``rate`` — Spark's rate source mapped through the deterministic loggen
  envelope expressions; unbounded synthetic load for soak/benchmarks.
  ``conf``: ``{"rows_per_second": int, "n_repos": int, ...}``.
- ``kafka`` — the production transport (needs the spark-sql-kafka jar,
  absent in this container; gated on a classpath check). Reads the
  forwarder's StreamMessage layout: framed payload in ``value``, LSN in the
  ``lsn`` header. ``conf``: ``{"bootstrap": servers, "topic": str}``.
- ``postgres-logical`` — the reference's ``LogicalReplicationConnection``
  source (``cdc/sources/backends/postgres_logical.py:137-213``) as a custom
  Python streaming DataSource (``pg_logical.py``): slot create/resume,
  keepalive cadence, flush-position feedback driven by Spark's batch-commit
  log. The wire is injectable — tests use the in-memory fake server; a
  production deployment drops in a psycopg2 adapter behind the same
  4-method surface (psycopg2 is not in this container). ``conf``:
  ``{"slot_name": str, "wire": "fake://name", "create_slot": bool}``.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import ENVELOPE_DDL, EngineConfig
from .parse import parse_frames

FRAMED_DDL = "lsn BIGINT, value STRING"

SourceFactory = Callable[[SparkSession, EngineConfig, dict], DataFrame]


BINARY_DDL = "lsn BIGINT, value BINARY"


def file_segments_source(
    spark: SparkSession, cfg: EngineConfig, conf: dict
) -> DataFrame:
    """``wire_format``: ``"envelope"`` (default, pre-parsed), ``"framed"``
    (text ``B|/C|/M|table|json`` frames, parsed statelessly) or
    ``"pgoutput"`` (binary pgoutput messages — returned RAW here; the
    Relation timeline is cross-batch state, so the decode happens in
    foreachBatch via ``pgoutput.PgOutputDecoder``, see ``stream.py``)."""
    wire = conf.get("wire_format", "framed" if conf.get("framed") else "envelope")
    try:
        ddl = {
            "framed": FRAMED_DDL,
            "pgoutput": BINARY_DDL,
            "envelope": ENVELOPE_DDL,
        }[wire]
    except KeyError:
        # the jsonschema enum only guards the YAML path; a direct
        # source_conf typo must not silently read binary parquet with the
        # envelope schema
        raise ValueError(
            f"unknown wire_format {wire!r} "
            f"(expected envelope | framed | pgoutput)"
        ) from None
    reader = spark.readStream.schema(ddl)
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    df = reader.parquet(os.path.join(conf["path"], "seg=*"))
    if wire == "framed":
        df = parse_frames(df)
    return df


def rate_source(spark: SparkSession, cfg: EngineConfig, conf: dict) -> DataFrame:
    """Unbounded deterministic envelope stream: rate-source value -> lsn ->
    the same seeded column expressions as ``loggen.change_log`` — generation
    happens executor-side per partition, never on the driver."""
    from .loggen import dml_columns

    rows = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", conf.get("rows_per_second", 10_000))
        .option("numPartitions", conf.get("num_partitions", 4))
        .load()
    )
    lsn = (F.col("value") + 1).cast("long")
    cols = dml_columns(
        lsn,
        n_repos=conf.get("n_repos", 100),
        n_paths=conf.get("n_paths", 50),
        zipf=conf.get("zipf", 2.0),
        delete_rate=conf.get("delete_rate", 0.08),
        table=conf.get("table", "repos"),
        seed=conf.get("seed", 42),
        content_repeat=conf.get("content_repeat", 1),
    )
    return rows.select(
        *cols,
        F.lit(None).cast("map<string,string>").alias("extra"),
        F.lit(None).cast("string").alias("schema_change"),
    )


def frames_from_stream_messages(raw: DataFrame) -> DataFrame:
    """StreamMessage-shaped rows (binary ``value`` + ``headers`` array of
    (key, binary value) structs — what ``forward.to_stream_messages``
    produces and a Kafka consumer reads back) -> the parsed envelope. The
    LSN rides in the ``lsn`` header, exactly where the forwarder put it.
    Pure column expressions, so the Kafka seam is unit-testable without the
    connector jar."""
    framed = raw.select(
        F.expr(
            "CAST(CAST(filter(headers, h -> h.key = 'lsn')[0].value AS STRING) "
            "AS BIGINT)"
        ).alias("lsn"),
        F.col("value").cast("string").alias("value"),
    )
    return parse_frames(framed)


def kafka_source(spark: SparkSession, cfg: EngineConfig, conf: dict) -> DataFrame:
    from .forward import kafka_available

    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; add --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 and pass "
            "conf={'bootstrap': ..., 'topic': ...}"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", conf["bootstrap"])
        .option("subscribe", conf.get("topic", "cdc"))
        .option("startingOffsets", conf.get("starting_offsets", "earliest"))
        .load()
    )
    return frames_from_stream_messages(raw)


def postgres_logical_source(
    spark: SparkSession, cfg: EngineConfig, conf: dict
) -> DataFrame:
    """The reference's core connector as a custom Python streaming
    DataSource (``pg_logical.PgLogicalDataSource``): slot create-if-absent,
    resume from the restart LSN, keepalive cadence, and send_feedback that
    advances the slot ONLY from Spark's batch-commit log — the full state
    machine of ``/root/reference/cdc/sources/backends/postgres_logical.py:
    137-213``, tested against a file-backed replication wire. conf:
    {"slot_name": str, "wire": "fake://name" | dsn, "create_slot": bool,
    "max_events_per_batch": int, "keepalive_interval_s": float}. A real
    Postgres DSN is served by ``pg_logical.Psycopg2Wire`` and needs
    psycopg2 importable (absent in this container — the adapter is
    contract-tested against a mocked psycopg2 surface; without psycopg2
    only ``fake://`` wires run). Yields FRAMED rows -> parsed envelope."""
    from . import pg_logical

    pg_logical.register(spark)
    reader = spark.readStream.format("pg-logical")
    for k in ("slot_name", "wire", "create_slot", "max_events_per_batch",
              "keepalive_interval_s"):
        if k in conf:
            reader = reader.option(k, str(conf[k]))
    return parse_frames(reader.load())


_SOURCES: dict[str, SourceFactory] = {
    "file-segments": file_segments_source,
    "rate": rate_source,
    "kafka": kafka_source,
    "postgres-logical": postgres_logical_source,
}


def register_source(name: str, factory: SourceFactory) -> None:
    """Extension point (the reference Registry's factory map)."""
    _SOURCES[name] = factory


def source_names() -> list[str]:
    return sorted(_SOURCES)


def build_source(
    spark: SparkSession, cfg: EngineConfig, name: str, conf: dict | None = None
) -> DataFrame:
    if name not in _SOURCES:
        raise KeyError(f"unknown source backend {name!r}; have {source_names()}")
    return _SOURCES[name](spark, cfg, conf or {})
