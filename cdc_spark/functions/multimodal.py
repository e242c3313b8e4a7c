"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract as Arrow-batched pandas UDFs
over mapInPandas.

The image/audio decode libraries are not in this container, so the decode
step is a clearly-marked deterministic fake behind the same UDF signature —
the Spark-side plumbing (schema, batch shape, partitioning) is real and
tested. Swap ``_fake_decode`` for PIL/librosa in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "doc_id BIGINT, media_type STRING, payload BINARY, "
    "meta_width INT, meta_height INT"
)

FEATURES_DDL = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
    "width INT, height INT, mean_byte DOUBLE, frames INT"
)

HAS_REAL_DECODER = False  # PIL / torchaudio etc. not available here


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real media decode. A real implementation
    raises NotImplementedError without the codec libs; this fake derives
    stable pseudo-features from the bytes so the distributed plumbing can be
    exercised and asserted."""
    if HAS_REAL_DECODER:  # pragma: no cover
        raise NotImplementedError("real decoder not wired in this container")
    n = len(payload)
    s = sum(payload[:256])
    return {
        "width": (s % 64) + 1,
        "height": ((s // 64) % 64) + 1,
        "mean_byte": (sum(payload) / n) if n else 0.0,
        "frames": (n % 30) + 1,
    }


def media_table(docs: DataFrame) -> DataFrame:
    """Build the opaque-binary media table from documents (payload = utf-8
    bytes standing in for encoded media; metadata columns typed)."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.pmod("doc_id", F.lit(640)) + 1).cast("int").alias("meta_width"),
        (F.pmod("doc_id", F.lit(480)) + 1).cast("int").alias("meta_height"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: one pandas batch
    per task, decode applied per element inside the batch (vectorized
    transfer; per-row work stays inside the Arrow batch, no row serde)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "mean_byte": feats.map(lambda f: f["mean_byte"]),
                    "frames": feats.map(lambda f: f["frames"]).astype("int32"),
                }
            )

    return media.mapInPandas(_extract, FEATURES_DDL)


def q_multimodal_features(spark, sf_dir):
    """Driver entry (rows-only check: the decode fake is not SQL-portable,
    but n_bytes is — see q_multimodal_bytes for the oracled variant)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_features(media_table(docs)).orderBy("doc_id")


def q_multimodal_bytes(spark, sf_dir):
    """Oracled subset of the multimodal pipeline: binary payload byte length
    + typed metadata (everything except the stubbed decode)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = media_table(docs)
    return m.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        "meta_width",
        "meta_height",
    ).orderBy("doc_id")


SQL_MULTIMODAL_BYTES = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(doc_id % 640 + 1 AS INT) AS meta_width,
       CAST(doc_id % 480 + 1 AS INT) AS meta_height
FROM documents ORDER BY doc_id
"""


def registry() -> dict:
    return {
        "multimodal_features": (q_multimodal_features, None),  # rows-only
        "multimodal_bytes": (q_multimodal_bytes, SQL_MULTIMODAL_BYTES),
    }
