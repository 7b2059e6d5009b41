"""Multimodal binary columns (SURVEY §2.7): images / audio / video as opaque
``binary`` payloads with typed metadata, processed via Arrow-batched
``mapInPandas`` (the §2.8 escape hatch — per-byte work has no Column algebra).

Data model: a media table is ``(id bigint, media_type string, payload binary,
meta struct<...>)`` — payloads stay opaque through scans/joins/shuffles; only
the decode/feature stages open them, and those run batch-streaming with
constant memory (no shuffle).

What is REAL here vs stubbed (per the build brief — image/audio codec
libraries are not in this container):
- PPM (P6) image decode, nearest-neighbour resize, intensity features: REAL —
  the format is a trivial header + raw RGB bytes, parsed with numpy alone.
- PCM16 (raw little-endian) audio decode, RMS/peak/duration features: REAL —
  ``np.frombuffer`` is the entire codec.
- Fixed-size-frame video chunking + every-Nth frame sampling: REAL byte math.
- JPEG/PNG/FLAC/MP4...: STUBBED — ``decode_image`` raises
  ``NotImplementedError`` unless Pillow happens to be importable. The Spark
  plumbing (schemas, batch iteration, signatures) is identical either way.

Scale notes: payload bytes never enter a shuffle in any operator here; the
decode stages are scan → mapInPandas → (narrow) project. Feature outputs are
small fixed-width columns, safe to aggregate/join downstream. Binary file
ingestion at scale = ``spark.read.format("binaryFile")`` (see
``sources/readers.py:read_binary_files``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from agent_data_wrangler_spark.operators.pandas_ops import map_batches

# ---------------------------------------------------------------------------
# Codecs (driver+executor side, pure numpy)
# ---------------------------------------------------------------------------


def _parse_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary PPM (P6): returns (width, height, HxWx3 uint8 array).

    The raster starts after EXACTLY ONE whitespace byte following maxval
    (the P6 spec) — a whitespace-run split would eat leading pixel bytes
    that happen to be '\\n' or ' ' (found by mm4's gradient test images;
    any document whose first sanitized char is a space hits the same)."""
    import re

    m = re.match(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a P6 PPM payload")
    width, height, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raw = payload[m.end() :]
    pixels = np.frombuffer(raw[: width * height * 3], dtype=np.uint8)
    return width, height, pixels.reshape(height, width, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Inverse of ``_parse_ppm`` — used by tests and the resize round-trip."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def _decode_any_image(payload: bytes, fmt: str) -> tuple[int, int, np.ndarray]:
    if fmt == "ppm":
        return _parse_ppm(payload)
    try:  # pragma: no cover - Pillow absent in the build container
        from io import BytesIO

        from PIL import Image

        img = np.asarray(Image.open(BytesIO(payload)).convert("RGB"))
        return img.shape[1], img.shape[0], img
    except ImportError as exc:
        raise NotImplementedError(
            f"image format {fmt!r} needs a codec library (Pillow) that is not "
            "installed; only 'ppm' decodes natively"
        ) from exc


# ---------------------------------------------------------------------------
# Image operators
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = (
    "id bigint, width int, height int, mean_r double, mean_g double, "
    "mean_b double, mean_intensity double"
)


def image_features(df: DataFrame, *, id_col: str = "id", payload_col: str = "payload", fmt: str = "ppm") -> DataFrame:
    """Decode + per-image channel statistics in one streaming pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = _decode_any_image(bytes(payload), fmt)
                means = px.reshape(-1, 3).mean(axis=0)
                out.append((int(rid), w, h, float(means[0]), float(means[1]), float(means[2]), float(means.mean())))
            yield pd.DataFrame(out, columns=["id", "width", "height", "mean_r", "mean_g", "mean_b", "mean_intensity"])

    return map_batches(df, run, IMAGE_FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    fmt: str = "ppm",
) -> DataFrame:
    """Nearest-neighbour resize, re-encoded to PPM: (id, payload binary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = _decode_any_image(bytes(payload), fmt)
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                resized = px[np.ix_(ys, xs)]
                ids.append(int(rid))
                payloads.append(encode_ppm(resized))
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return map_batches(df, run, "id bigint, payload binary")


def image_phash(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    fmt: str = "ppm",
    rows: int = 8,
    cols: int = 8,
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: ``(id, phash bigint)``.

    The standard visual near-dup fingerprint (every production multimodal
    pipeline dedups images before training): decode → integer grayscale
    ``(r+g+b)//3`` → nearest-neighbour resize to ``rows x (cols+1)`` →
    horizontal-gradient bits ``g[r][c+1] > g[r][c]`` packed row-major, low
    bit first. 63 bits (the last gradient dropped) so the value stays a
    signed int64 under ANSI mode — the same convention as
    ``dedup.simhash``. Gradient bits survive brightness/contrast shifts
    and low-order pixel noise, which is exactly what byte-level exact
    hashing misses.

    All-integer math end-to-end, so an engine-independent oracle can
    recompute the hash exactly (mm4's DuckDB twin does, from the
    constructed payload bytes).

    Scale: scan-stage mapInPandas (Arrow batches, vectorized numpy per
    image), no shuffle; the 8-byte fingerprint is what downstream
    band-joins move — never the payload. Pair generation belongs to
    ``dedup.hamming_band_pairs``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_bits = min(63, rows * cols)
        powers = (1 << np.arange(n_bits, dtype=np.uint64)).astype(np.uint64)
        for pdf in batches:
            ids, hashes = [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = _decode_any_image(bytes(payload), fmt)
                gray = px.astype(np.int64).sum(axis=2) // 3
                ys = (np.arange(rows) * h // rows).clip(0, h - 1)
                xs = (np.arange(cols + 1) * w // (cols + 1)).clip(0, w - 1)
                g = gray[np.ix_(ys, xs)]
                bits = (g[:, 1:] > g[:, :-1]).reshape(-1)[:n_bits]
                hashes.append(int(bits.astype(np.uint64) @ powers))
                ids.append(int(rid))
            yield pd.DataFrame({"id": ids, "phash": hashes})

    return map_batches(df, run, "id bigint, phash bigint")


# ---------------------------------------------------------------------------
# Audio operators (raw PCM16 mono)
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = "id bigint, n_samples bigint, duration_sec double, rms double, peak double"


def audio_features(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    sample_rate_col: str = "sample_rate",
) -> DataFrame:
    """Decode little-endian PCM16 and emit RMS / peak / duration."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload, rate in zip(pdf[id_col], pdf[payload_col], pdf[sample_rate_col]):
                wave = np.frombuffer(bytes(payload), dtype="<i2").astype(np.float64) / 32768.0
                n = wave.size
                rms = float(np.sqrt(np.mean(wave**2))) if n else 0.0
                peak = float(np.abs(wave).max()) if n else 0.0
                out.append((int(rid), n, n / float(rate), rms, peak))
            yield pd.DataFrame(out, columns=["id", "n_samples", "duration_sec", "rms", "peak"])

    return map_batches(df, run, AUDIO_FEATURE_SCHEMA)


def audio_fingerprint(
    df: DataFrame,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    windows: int = 64,
) -> DataFrame:
    """Perceptual audio fingerprint per PCM16 clip: ``(id, afp bigint)``.

    The audio twin of ``image_phash`` (the acoustic-fingerprint family:
    Chromaprint/Shazam reduce audio to sign-of-difference bits over
    band/frame energies; this is the time-domain version that needs no
    FFT): decode little-endian PCM16 → split into ``windows`` equal
    windows (tail remainder dropped) → integer energy per window
    ``sum(s_i^2)`` → adjacent-energy gradient bits ``e[k+1] > e[k]``
    packed row-major, low bit first, capped at 63 bits so the value stays
    a signed int64 (the ``dedup.simhash`` convention). Gradient bits
    survive uniform gain changes and low-order sample noise — exactly
    what byte-exact hashing misses on re-encoded audio.

    All-integer math end-to-end (samples are int16, energies int64), so
    an engine-independent oracle recomputes every fingerprint exactly
    (mm5's DuckDB twin does, from the constructed payload bytes).

    Scale: scan-stage mapInPandas (Arrow batches, vectorized numpy per
    clip), no shuffle; the 8-byte fingerprint is what downstream
    band-joins move — never the waveform. Pair generation belongs to
    ``dedup.hamming_band_pairs`` (use ``scatter_seed``: adjacent-energy
    bits of structured audio are locally correlated, the mm4 lesson).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_bits = min(63, windows - 1)
        powers = (1 << np.arange(n_bits, dtype=np.uint64)).astype(np.uint64)
        for pdf in batches:
            ids, fps = [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                s = np.frombuffer(bytes(payload), dtype="<i2").astype(np.int64)
                w = s.size // windows
                if w == 0:
                    ids.append(int(rid))
                    fps.append(0)
                    continue
                e = (s[: w * windows] ** 2).reshape(windows, w).sum(axis=1)
                bits = (e[1:] > e[:-1])[:n_bits]
                ids.append(int(rid))
                fps.append(int(bits.astype(np.uint64) @ powers))
            yield pd.DataFrame({"id": ids, "afp": fps})

    return map_batches(df, run, "id bigint, afp bigint")


# ---------------------------------------------------------------------------
# Video operators (fixed-size frame chunking)
# ---------------------------------------------------------------------------


def sample_frames(
    df: DataFrame,
    every_n: int,
    *,
    id_col: str = "id",
    payload_col: str = "payload",
    frame_bytes_col: str = "frame_bytes",
) -> DataFrame:
    """Explode every Nth fixed-size frame: (id, frame_idx, frame binary).

    A 'video' here is a concatenation of equal-size raw frames (the container
    parsing a real pipeline would do in this same position is library-gated).
    Fan-out is 1/every_n of the frame count — the downstream decode cost
    driver at 100 TB, which is exactly why sampling happens BEFORE decode.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload, fb in zip(pdf[id_col], pdf[payload_col], pdf[frame_bytes_col]):
                data = bytes(payload)
                fb = int(fb)
                n_frames = len(data) // fb if fb else 0
                for i in range(0, n_frames, every_n):
                    ids.append(int(rid))
                    idxs.append(i)
                    frames.append(data[i * fb : (i + 1) * fb])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return map_batches(df, run, "id bigint, frame_idx int, frame binary")
