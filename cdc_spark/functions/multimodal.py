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
    "width INT, height INT, mean_cp_x1e4 BIGINT, frames INT"
)

# ------------------------------------------------------- decoder dispatch
# Real codec libraries are detected at import; the decode step routes
# through ONE dispatch (``decode_media``), so swapping fake -> real is a
# flag (decoder="auto"/"real"), not a code edit. In this container both
# libs are absent: the real path is present, contract-shaped, and skipped
# by its tests; the FAKE path stays the oracled one (pure integer
# arithmetic the DuckDB mirror reproduces bit-for-bit).
try:  # pragma: no cover - not in this container
    from PIL import Image as _PILImage  # noqa: N812

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False
try:  # pragma: no cover - not in this container
    import soundfile as _soundfile

    HAS_SOUNDFILE = True
except ImportError:
    _soundfile = None
    HAS_SOUNDFILE = False

#: does any real decoder exist in this environment?
HAS_REAL_DECODER = HAS_PIL or HAS_SOUNDFILE


def _fake_decode(payload: bytes, media_type: str = "image") -> dict:
    """Deterministic stand-in for a real media decode: stable
    pseudo-features derived from the payload, so the distributed plumbing
    is exercised and asserted end-to-end.

    Defined in PORTABLE integer arithmetic over the decoded text's code
    points (no floats, no byte indexing) so the Arrow-batched mapInPandas
    output can be hash-compared against a plain SQL oracle — the driver's
    strongest check runs against the REAL UDF path."""
    cps = [ord(c) for c in payload.decode("utf-8")]
    n = len(cps)
    s256 = sum(cps[:256])
    return {
        "width": (s256 % 64) + 1,
        "height": ((s256 // 64) % 64) + 1,
        "mean_cp_x1e4": (sum(cps) * 10000) // n if n else 0,
        "frames": (n % 30) + 1,
    }


def _real_decode(payload: bytes, media_type: str) -> dict:
    """The production decode, emitting the SAME feature dict shape as the
    fake (the contract both paths are tested against):

    - image: PIL open -> (width, height), mean_cp_x1e4 = mean pixel value
      x 1e4 over the first band, frames = n_frames (animated) or 1;
    - audio: soundfile read -> width = channels, height = samplerate//1000,
      mean_cp_x1e4 = mean abs sample x 1e4, frames = sample frames;
    - video: out of scope for these two libs — raises, callers route video
      through a frame sampler first (``sample_frames``).
    """
    import io

    if media_type == "image":
        if not HAS_PIL:
            raise RuntimeError("image decode needs PIL (pip install pillow)")
        img = _PILImage.open(io.BytesIO(payload))  # pragma: no cover
        px = list(img.getdata())  # pragma: no cover
        if px and isinstance(px[0], tuple):  # pragma: no cover
            px = [p[0] for p in px]
        mean = (sum(px) * 10_000) // len(px) if px else 0  # pragma: no cover
        return {  # pragma: no cover
            "width": img.width,
            "height": img.height,
            "mean_cp_x1e4": mean,
            "frames": getattr(img, "n_frames", 1),
        }
    if media_type == "audio":
        if not HAS_SOUNDFILE:
            raise RuntimeError(
                "audio decode needs soundfile (pip install soundfile)"
            )
        data, rate = _soundfile.read(io.BytesIO(payload))  # pragma: no cover
        n = len(data)  # pragma: no cover
        channels = data.shape[1] if data.ndim > 1 else 1  # pragma: no cover
        # mean over SAMPLES (frames x channels), not frames — dividing by
        # the frame count would inflate the mean by the channel count
        n_samples = data.size if hasattr(data, "size") else n  # pragma: no cover
        mean = (  # pragma: no cover
            int(
                sum(abs(float(x)) for x in data.flat)
                * 10_000
                // max(n_samples, 1)
            )
            if n
            else 0
        )
        return {  # pragma: no cover
            "width": channels,
            "height": rate // 1000,
            "mean_cp_x1e4": mean,
            "frames": n,
        }
    raise RuntimeError(f"no real decoder for media_type={media_type!r}")


def decode_media(payload: bytes, media_type: str, decoder: str = "fake") -> dict:
    """THE decode dispatch. ``decoder``:

    - ``"fake"``: the deterministic oracled stand-in (default — what the
      driver contract hashes);
    - ``"real"``: PIL/soundfile (raises without the libs);
    - ``"auto"``: real when this environment has a decoder for the media
      type, else fake.
    """
    if decoder == "real":
        return _real_decode(payload, media_type)
    if decoder == "auto":
        if (media_type == "image" and HAS_PIL) or (
            media_type == "audio" and HAS_SOUNDFILE
        ):  # pragma: no cover - libs absent here
            return _real_decode(payload, media_type)
        return _fake_decode(payload, media_type)
    if decoder == "fake":
        return _fake_decode(payload, media_type)
    # a typo'd decoder must never silently produce pseudo-features
    raise ValueError(
        f"unknown decoder {decoder!r}: expected 'fake', 'real', or 'auto'"
    )


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


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: one pandas batch
    per task, decode applied per element inside the batch (vectorized
    transfer; per-row work stays inside the Arrow batch, no row serde).
    ``decoder`` routes through :func:`decode_media` — fake (oracled),
    real (PIL/soundfile), or auto."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.Series(
                [
                    decode_media(p, t, decoder)
                    for p, t in zip(pdf["payload"], pdf["media_type"])
                ],
                index=pdf.index,
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "mean_cp_x1e4": feats.map(
                        lambda f: f["mean_cp_x1e4"]
                    ).astype("int64"),
                    "frames": feats.map(lambda f: f["frames"]).astype("int32"),
                }
            )

    return media.mapInPandas(_extract, FEATURES_DDL)


def q_multimodal_features(spark, sf_dir):
    """Driver entry — the REAL Arrow-batched mapInPandas path, oracled: the
    fake decode is pure integer arithmetic over code points, so DuckDB can
    mirror it exactly (SQL_MULTIMODAL_FEATURES)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_features(media_table(docs)).orderBy("doc_id")


# the portable fake-decode mirrored in DuckDB SQL: code-point sums / integer
# division only — bit-exact against the Python UDF
_CP = "list_transform(range(1, length(text) + 1), i -> ord(substring(text, i, 1)))"
_CP256 = (
    "list_transform(range(1, least(length(text), 256) + 1), "
    "i -> ord(substring(text, i, 1)))"
)

SQL_MULTIMODAL_FEATURES = f"""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         length(text) AS n_cp,
         COALESCE(list_sum({_CP256}), 0) AS s256,
         COALESCE(list_sum({_CP}), 0) AS s_all
  FROM documents)
SELECT doc_id, media_type, n_bytes,
       CAST(s256 % 64 + 1 AS INT) AS width,
       CAST((s256 // 64) % 64 + 1 AS INT) AS height,
       CAST(CASE WHEN n_cp = 0 THEN 0 ELSE (s_all * 10000) // n_cp END AS BIGINT)
         AS mean_cp_x1e4,
       CAST(n_cp % 30 + 1 AS INT) AS frames
FROM m ORDER BY doc_id
"""


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


# --------------------------------------------------------------- resize
#: fake resize target edge (a real implementation calls PIL.thumbnail);
#: the fake 'thumbnail' is the first out_w*out_h code points of the
#: decoded payload — portable integer arithmetic, oracled like the decode
RESIZE_MAX_EDGE = 32

RESIZE_DDL = (
    "doc_id BIGINT, media_type STRING, out_w INT, out_h INT, "
    "thumb_bytes BIGINT, thumb_cp_sum BIGINT"
)


def resize_media(media: DataFrame) -> DataFrame:
    """Arrow-batched resize over mapInPandas: same plumbing shape as a real
    PIL/ffmpeg resize (binary in, binary-derived features out, per-element
    work inside the Arrow batch)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w = pdf["meta_width"].clip(upper=RESIZE_MAX_EDGE).astype("int32")
            out_h = pdf["meta_height"].clip(upper=RESIZE_MAX_EDGE).astype("int32")
            thumbs = [
                p.decode("utf-8")[: int(w) * int(h)]
                for p, w, h in zip(pdf["payload"], out_w, out_h)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "thumb_bytes": pd.Series(
                        [len(t.encode("utf-8")) for t in thumbs], dtype="int64"
                    ),
                    "thumb_cp_sum": pd.Series(
                        [sum(ord(c) for c in t) for t in thumbs], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(_resize, RESIZE_DDL)


def q_multimodal_resize(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return resize_media(media_table(docs)).orderBy("doc_id")


SQL_MULTIMODAL_RESIZE = f"""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
         CAST(least(doc_id % 640 + 1, {RESIZE_MAX_EDGE}) AS INT) AS out_w,
         CAST(least(doc_id % 480 + 1, {RESIZE_MAX_EDGE}) AS INT) AS out_h,
         text
  FROM documents),
t AS (SELECT m.*, substring(text, 1, out_w * out_h) AS thumb FROM m)
SELECT doc_id, media_type, out_w, out_h,
       CAST(octet_length(encode(thumb)) AS BIGINT) AS thumb_bytes,
       CAST(COALESCE(list_sum(list_transform(range(1, length(thumb) + 1),
                                             i -> ord(substring(thumb, i, 1)))),
                     0) AS BIGINT) AS thumb_cp_sum
FROM t ORDER BY doc_id
"""


# ----------------------------------------------------------- frame sample
#: sample every k-th frame of 'video' media (a real implementation seeks
#: keyframes via ffmpeg); the fake frame payload is a 64-code-point slice
#: at the frame index
FRAME_SAMPLE_EVERY = 5
FRAME_SLICE_CP = 64

FRAMES_DDL = "doc_id BIGINT, frame_idx INT, frame_cp_sum BIGINT"


def sample_frames(media: DataFrame) -> DataFrame:
    """Every FRAME_SAMPLE_EVERY-th frame of each video row, exploded INSIDE
    the Arrow batch (one input row -> n output rows without leaving the
    pandas UDF — the fan-out shape real frame extraction has)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = payload.decode("utf-8")
                n_frames = (len(text) % 30) + 1  # the fake decode's frame count
                for i in range(1, n_frames + 1, FRAME_SAMPLE_EVERY):
                    sl = text[i - 1: i - 1 + FRAME_SLICE_CP]
                    ids.append(did)
                    idxs.append(i)
                    sums.append(sum(ord(c) for c in sl))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_cp_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        _frames, FRAMES_DDL
    )


def q_multimodal_frame_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_frames(media_table(docs)).orderBy("doc_id", "frame_idx")


SQL_MULTIMODAL_FRAME_SAMPLE = f"""
WITH v AS (
  SELECT doc_id, text, length(text) % 30 + 1 AS n_frames
  FROM documents WHERE doc_id % 3 = 2),
fr AS (
  SELECT doc_id, CAST(unnest(range(1, n_frames + 1, {FRAME_SAMPLE_EVERY})) AS INT)
           AS frame_idx, text
  FROM v),
sl AS (SELECT doc_id, frame_idx,
              substring(text, frame_idx, {FRAME_SLICE_CP}) AS s FROM fr)
SELECT doc_id, frame_idx,
       CAST(COALESCE(list_sum(list_transform(range(1, length(s) + 1),
                                             i -> ord(substring(s, i, 1)))),
                     0) AS BIGINT) AS frame_cp_sum
FROM sl ORDER BY doc_id, frame_idx
"""


def registry() -> dict:
    return {
        "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
        "multimodal_bytes": (q_multimodal_bytes, SQL_MULTIMODAL_BYTES),
        "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
        "multimodal_frame_sample": (
            q_multimodal_frame_sample,
            SQL_MULTIMODAL_FRAME_SAMPLE,
        ),
    }
