"""Multimodal binary-column tests (SURVEY §2.7): PPM image decode/resize/
features, PCM16 audio features, fixed-frame video sampling, binaryFile
ingestion — real byte-level plumbing, synthetic payloads."""

from __future__ import annotations

import numpy as np
import pytest

from agent_data_wrangler_spark.operators import multimodal
from agent_data_wrangler_spark.operators.multimodal import encode_ppm
from agent_data_wrangler_spark.sources.readers import read_binary_files


def _checker(w: int, h: int) -> np.ndarray:
    """Checkerboard RGB: red/blue squares — known channel means."""
    px = np.zeros((h, w, 3), dtype=np.uint8)
    mask = (np.add.outer(np.arange(h), np.arange(w)) % 2).astype(bool)
    px[mask] = (255, 0, 0)
    px[~mask] = (0, 0, 255)
    return px


@pytest.fixture(scope="module")
def image_df(spark):
    rows = [
        (1, bytearray(encode_ppm(_checker(4, 4)))),
        (2, bytearray(encode_ppm(np.full((2, 3, 3), 100, dtype=np.uint8)))),
    ]
    return spark.createDataFrame(rows, "id bigint, payload binary")


def test_image_features(image_df):
    out = {r.id: r for r in multimodal.image_features(image_df).collect()}
    assert (out[1].width, out[1].height) == (4, 4)
    # 4x4 checker: half red(255,0,0), half blue(0,0,255)
    assert out[1].mean_r == pytest.approx(127.5)
    assert out[1].mean_g == 0.0
    assert out[1].mean_b == pytest.approx(127.5)
    assert out[2].mean_intensity == pytest.approx(100.0)
    assert (out[2].width, out[2].height) == (3, 2)


def test_resize_round_trip(image_df, spark):
    resized = multimodal.resize_images(image_df, width=2, height=2)
    feats = {r.id: r for r in multimodal.image_features(resized).collect()}
    assert (feats[1].width, feats[1].height) == (2, 2)
    assert (feats[2].width, feats[2].height) == (2, 2)
    # constant image stays constant through resize
    assert feats[2].mean_intensity == pytest.approx(100.0)


def test_unsupported_format_raises(spark):
    df = spark.createDataFrame([(1, bytearray(b"\x89PNG...."))], "id bigint, payload binary")
    with pytest.raises(Exception) as err:
        multimodal.image_features(df, fmt="png").collect()
    assert "NotImplementedError" in str(err.value) or isinstance(
        err.value, NotImplementedError
    )


def test_audio_features(spark):
    # 1 second of a full-scale square wave at 8 kHz: RMS == peak == 1.0 (±1/32768)
    wave = (np.tile([32767, -32768], 4000)).astype("<i2")
    rows = [(1, bytearray(wave.tobytes()), 8000)]
    df = spark.createDataFrame(rows, "id bigint, payload binary, sample_rate int")
    out = multimodal.audio_features(df).collect()[0]
    assert out.n_samples == 8000
    assert out.duration_sec == pytest.approx(1.0)
    assert out.rms == pytest.approx(1.0, abs=1e-4)
    assert out.peak == pytest.approx(1.0, abs=1e-4)


def test_sample_frames(spark):
    # 10 frames of 4 bytes each; sample every 3rd -> frames 0,3,6,9
    payload = b"".join(bytes([i] * 4) for i in range(10))
    df = spark.createDataFrame(
        [(7, bytearray(payload), 4)], "id bigint, payload binary, frame_bytes int"
    )
    out = multimodal.sample_frames(df, every_n=3).collect()
    assert [(r.id, r.frame_idx, bytes(r.frame)) for r in sorted(out, key=lambda r: r.frame_idx)] == [
        (7, 0, b"\x00" * 4),
        (7, 3, b"\x03" * 4),
        (7, 6, b"\x06" * 4),
        (7, 9, b"\x09" * 4),
    ]


def test_binary_file_ingestion(spark, tmp_path):
    (tmp_path / "a.ppm").write_bytes(encode_ppm(_checker(2, 2)))
    (tmp_path / "b.ppm").write_bytes(encode_ppm(_checker(4, 2)))
    (tmp_path / "ignore.txt").write_text("not media")
    df = read_binary_files(spark, str(tmp_path), glob="*.ppm")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 2
    by_name = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in rows}
    assert by_name["a.ppm"].startswith(b"P6")
    # feed straight into the feature operator
    media = df.selectExpr("row_number() over (order by path) as id", "content as payload")
    feats = multimodal.image_features(media).collect()
    assert {(r.width, r.height) for r in feats} == {(2, 2), (4, 2)}