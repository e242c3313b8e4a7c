"""Round-4 VERDICT item 7: the real-decoder seam — fake vs real routed
through one dispatch (``decode_media``), swap-by-flag, both paths emitting
the same FEATURES_DDL contract. The real path is exercised via a mocked
PIL surface (the libs are absent in this container) and skipped end-to-end."""

import pytest
from pyspark.sql import functions as F

from cdc_spark.functions import multimodal as mm


def _media(spark, n=20):
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body text number "), F.col("id").cast("string"))
        .alias("text"),
    )
    return mm.media_table(docs)


FEATURE_COLS = ["doc_id", "media_type", "n_bytes", "width", "height",
                "mean_cp_x1e4", "frames"]


def test_fake_path_emits_contract_shape(spark):
    out = mm.extract_features(_media(spark), decoder="fake")
    assert out.columns == FEATURE_COLS
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["width"] >= 1 and r["frames"] >= 1 for r in rows)


def test_auto_resolves_to_fake_without_libs(spark):
    """No PIL/soundfile in this container: auto must give the oracled fake
    results, not raise."""
    assert not mm.HAS_REAL_DECODER
    fake = mm.extract_features(_media(spark), decoder="fake").collect()
    auto = mm.extract_features(_media(spark), decoder="auto").collect()
    assert fake == auto


def test_real_decode_raises_without_libs():
    with pytest.raises(RuntimeError, match="PIL"):
        mm.decode_media(b"x", "image", decoder="real")
    with pytest.raises(RuntimeError, match="soundfile"):
        mm.decode_media(b"x", "audio", decoder="real")
    with pytest.raises(RuntimeError, match="video"):
        mm.decode_media(b"x", "video", decoder="real")


def test_real_dispatch_contract_via_mocked_pil(monkeypatch):
    """The real image path, driven through a mocked PIL surface: dispatch
    must route decoder='real'/'auto' to it and the feature dict must carry
    exactly the contract keys with the documented semantics."""

    class _Img:
        width, height, n_frames = 64, 48, 3

        def getdata(self):
            return [(10, 0, 0), (20, 0, 0)]  # first band -> mean 15

    class _PIL:
        @staticmethod
        def open(_fh):
            return _Img()

    monkeypatch.setattr(mm, "_PILImage", _PIL)
    monkeypatch.setattr(mm, "HAS_PIL", True)
    got = mm.decode_media(b"\x89PNG...", "image", decoder="real")
    assert got == {
        "width": 64, "height": 48,
        "mean_cp_x1e4": (30 * 10_000) // 2, "frames": 3,
    }
    assert set(got) == set(mm._fake_decode(b"abc"))  # same contract keys
    # auto now routes image to the mocked real decoder too
    assert mm.decode_media(b"z", "image", decoder="auto") == got


def test_real_dispatch_contract_via_mocked_soundfile(monkeypatch):
    class _SF:
        @staticmethod
        def read(_fh):
            import numpy as np

            return np.array([0.5, -0.5, 0.5, -0.5]), 16_000

    monkeypatch.setattr(mm, "_soundfile", _SF)
    monkeypatch.setattr(mm, "HAS_SOUNDFILE", True)
    got = mm.decode_media(b"RIFF...", "audio", decoder="real")
    assert got["width"] == 1 and got["height"] == 16
    assert got["frames"] == 4 and got["mean_cp_x1e4"] == 5000
    assert set(got) == set(mm._fake_decode(b"abc"))


@pytest.mark.skipif(not mm.HAS_PIL, reason="PIL not in this container")
def test_real_path_end_to_end(spark):  # pragma: no cover
    """When a real decoder exists, the full Arrow path must emit
    FEATURES_DDL-shaped batches from real bytes."""
    out = mm.extract_features(_media(spark), decoder="real")
    assert out.columns == FEATURE_COLS


def test_unknown_decoder_rejected():
    with pytest.raises(ValueError, match="unknown decoder"):
        mm.decode_media(b"x", "image", decoder="reaal")
