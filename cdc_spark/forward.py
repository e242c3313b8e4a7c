"""Forwarding mode — the reference's actual product: a CDC *producer* that
tails the WAL and forwards framed events, in order, with table routing
metadata, at-least-once (``/root/reference/cdc/producer.py:41-161`` +
``cdc/streams/backends/kafka.py:44-56``).

Engine shape: readStream over WAL segments -> (optional parse/normalize) ->
StreamMessage projection (value + headers, the reference's
``ChangeMessage.to_stream()`` contract: the table name rides in message
metadata so consumers can route without parsing payloads,
``cdc/sources/types.py:65-66``) -> sink.

Sinks:
- ``kafka``: ``writeStream.format("kafka")`` — the production path; needs
  the spark-sql-kafka jar on the classpath (not in this container, so it is
  gated behind a capability check and exercised only as plan construction).
- ``parquet``/``json``: durable file sinks with the same StreamMessage
  schema — the testable stand-in, also the replayable archive shape.

Delivery semantics match the reference: the file sink + Spark's offset log
give at-least-once into the sink with exactly-once file manifests; Kafka
gives at-least-once (duplicates collapse downstream via LSN, A3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import EngineConfig
from .loggen import frame_value

STREAM_MESSAGE_DDL = (
    "`key` BINARY, value BINARY, headers ARRAY<STRUCT<key: STRING, value: BINARY>>"
)


def to_stream_messages(envelope: DataFrame) -> DataFrame:
    """Envelope rows -> Kafka-shaped StreamMessages: value = framed payload
    bytes, key = routing key (repo|path — keeps per-key order within a Kafka
    partition), headers = [(table, ...), (lsn, ...)] like the reference puts
    the table into message headers (``kafka.py:44-50``)."""
    payload = frame_value(envelope)
    return envelope.withColumn("payload", payload).select(
        F.encode(
            F.concat_ws("|", F.coalesce("repo", F.lit("")), F.coalesce("path", F.lit(""))),
            "UTF-8",
        ).alias("key"),
        F.encode("payload", "UTF-8").alias("value"),
        F.array(
            F.struct(
                F.lit("table").alias("key"),
                F.encode(F.coalesce("table", F.lit("")), "UTF-8").alias("value"),
            ),
            F.struct(
                F.lit("lsn").alias("key"),
                F.encode(F.col("lsn").cast("string"), "UTF-8").alias("value"),
            ),
        ).alias("headers"),
    )


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def forward_plan(
    cfg: EngineConfig,
    *,
    sink: str = "parquet",
    sink_path: str | None = None,
    kafka_bootstrap: str | None = None,
    topic: str = "cdc",
) -> dict:
    """Build the sink plan (format + writer options) WITHOUT starting it —
    the Kafka path stays unit-testable with the connector jar absent (the
    classpath gate only applies at ``start_forward`` time)."""
    if sink == "kafka":
        if not kafka_bootstrap:
            raise ValueError("sink='kafka' requires kafka_bootstrap")
        options = {
            "kafka.bootstrap.servers": kafka_bootstrap,
            "topic": topic,
        }
    else:
        options = {"path": sink_path or os.path.join(cfg.lake_root, "_forwarded")}
    options["checkpointLocation"] = cfg.checkpoint
    return {"format": sink, "options": options}


def start_forward(
    spark: SparkSession,
    source_dir: str | None,
    cfg: EngineConfig,
    *,
    sink: str = "parquet",
    sink_path: str | None = None,
    kafka_bootstrap: str | None = None,
    topic: str = "cdc",
    framed_source: bool = False,
    source: str = "file-segments",
    source_conf: dict | None = None,
):
    """Start the producer pipeline: source backend -> StreamMessages -> sink.

    With ``sink='kafka'`` this is the reference pipeline verbatim (requires
    the Kafka jar + brokers); file sinks keep the same message schema. The
    input comes from the source-backend registry like ``start_stream``.
    """
    from .sources import build_source

    conf = dict(source_conf or {})
    if source == "file-segments":
        conf.setdefault("path", source_dir)
        conf.setdefault("framed", framed_source)
    df = build_source(spark, cfg, source, conf)
    msgs = to_stream_messages(df)

    plan = forward_plan(
        cfg, sink=sink, sink_path=sink_path,
        kafka_bootstrap=kafka_bootstrap, topic=topic,
    )
    if sink == "kafka" and not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; add "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13 and "
            "pass kafka_bootstrap"
        )
    writer = msgs.writeStream.format(plan["format"]).options(**plan["options"])
    return writer.trigger(availableNow=True).start()
