"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The payloads are REAL self-describing media decoded with pure numpy —
no external codec libraries needed:

- image: binary PPM (P6) — header parse + ``np.frombuffer`` to an
  (h, w, 3) uint8 array;
- audio: WAV (RIFF, PCM16 mono) — fmt-chunk parse + int16 samples;
- video: a minimal raw-frame container (``RVID`` magic, frame count,
  dims, concatenated RGB24 frames) standing in for a real codec; the
  frame-sampling path is real.

Features are derived from the decoded pixels/samples/frames (channel
statistics, luma histogram, FFT band energies, inter-frame motion), so
the full decode → feature-extract pipeline is exercised end to end.
``decode='raise'`` marks exactly where a PIL/ffmpeg decoder would plug
in for real-world formats (JPEG/MP3/H.264); ``decode='fake'`` keeps
the old sha-fold stand-in for payloads in formats we can't parse.

Scale notes: binary payloads never pass through Python row-at-a-time —
Arrow batches carry them; feature extraction is per-partition
streaming (mapInPandas iterator), so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
partition size.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = (
    "media_id long, kind string, payload_sha string, n_bytes int, "
    f"features array<float>"
)


# ---------------------------------------------------------------------------
# encoders / decoders (pure numpy + struct — no codec libraries)
# ---------------------------------------------------------------------------
def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from a binary PPM (P6).  The header ends with
    EXACTLY one whitespace byte before the pixel data (PPM spec) — a
    whitespace-greedy split would swallow whitespace-valued pixel
    bytes, so the header is matched explicitly."""
    import re

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=m.end())
    return pixels.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    data = samples.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 mono samples) from a PCM16 RIFF/WAVE payload."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate, data = None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt_tag, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if (fmt_tag, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif chunk_id == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size % 2)
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, data


_RVID_MAGIC = b"RVID"


def encode_rvid(frames: np.ndarray) -> bytes:
    n, h, w, _ = frames.shape
    return (
        _RVID_MAGIC
        + struct.pack("<III", n, w, h)
        + frames.astype(np.uint8).tobytes()
    )


def decode_rvid(payload: bytes) -> np.ndarray:
    """(n_frames, h, w, 3) uint8 from the raw-frame container."""
    if payload[:4] != _RVID_MAGIC:
        raise ValueError("not an RVID payload")
    n, w, h = struct.unpack("<III", payload[4:16])
    frames = np.frombuffer(payload[16 : 16 + n * h * w * 3], dtype=np.uint8)
    return frames.reshape(n, h, w, 3)


# ---------------------------------------------------------------------------
# feature extraction from decoded media (FEATURE_DIM floats in [0, 1])
# ---------------------------------------------------------------------------
def _image_features(rgb: np.ndarray) -> np.ndarray:
    f = rgb.astype(np.float32) / 255.0
    luma = f.mean(axis=2)
    h, w = luma.shape
    grid = [
        luma[i * h // 2 : (i + 1) * h // 2, j * w // 2 : (j + 1) * w // 2].mean()
        for i in range(2)
        for j in range(2)
    ]
    hist, _ = np.histogram(luma, bins=6, range=(0.0, 1.0))
    hist = hist / luma.size
    return np.concatenate(
        [f.mean(axis=(0, 1)), f.std(axis=(0, 1)), grid, hist]
    ).astype(np.float32)


def _audio_features(sample_rate: int, samples: np.ndarray) -> np.ndarray:
    x = samples.astype(np.float32) / 32768.0
    if len(x) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    peak = float(np.max(np.abs(x)))
    mean_abs = float(np.mean(np.abs(x)))
    spectrum = np.abs(np.fft.rfft(x))
    bands = np.array_split(spectrum, 12)
    energy = np.array([b.mean() for b in bands], dtype=np.float32)
    total = energy.sum()
    energy = energy / total if total > 0 else energy
    return np.concatenate([[rms, zcr, peak, mean_abs], energy]).astype(np.float32)


def _video_features(frames: np.ndarray, sample_every: int = 2) -> np.ndarray:
    """Frame-sampled video features: every ``sample_every``-th frame
    (up to 4) contributes its luma mean; motion = mean abs diff
    between consecutive sampled frames."""
    sampled = frames[::sample_every][:4].astype(np.float32) / 255.0
    luma = sampled.mean(axis=3)
    frame_means = luma.mean(axis=(1, 2))
    frame_means = np.pad(frame_means, (0, 4 - len(frame_means)))
    if len(sampled) > 1:
        motion = np.abs(np.diff(luma, axis=0)).mean(axis=(1, 2))
    else:
        motion = np.zeros(0, dtype=np.float32)
    motion = np.pad(motion, (0, 3 - len(motion)))
    channel_mean = sampled.mean(axis=(0, 1, 2))
    channel_std = sampled.std(axis=(0, 1, 2))
    extras = np.array(
        [min(len(frames) / 64.0, 1.0), luma.std(), luma.max()], dtype=np.float32
    )
    return np.concatenate(
        [frame_means, motion, channel_mean, channel_std, extras]
    ).astype(np.float32)


def _fake_features(payload: bytes) -> list[float]:
    """sha-fold stand-in for payloads whose codec we cannot parse —
    kept as the ``decode='fake'`` path."""
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    folded = arr[: FEATURE_DIM * 2].reshape(FEATURE_DIM, 2).mean(axis=1) / 255.0
    return [float(x) for x in folded]


def _numpy_features(kind: str, payload: bytes) -> list[float]:
    if kind == "image":
        feats = _image_features(decode_ppm(payload))
    elif kind == "audio":
        feats = _audio_features(*decode_wav(payload))
    elif kind == "video":
        feats = _video_features(decode_rvid(payload))
    else:
        raise ValueError(f"unknown media kind {kind!r}")
    out = np.clip(feats, 0.0, 1.0)
    if len(out) != FEATURE_DIM:
        raise ValueError(f"feature dim {len(out)} != {FEATURE_DIM}")
    return [float(x) for x in out]


def extract_media_features(media: DataFrame, decode: str = "numpy") -> DataFrame:
    """binary payloads → per-item feature vectors via mapInPandas.

    - ``decode='numpy'`` (default): real decode of PPM/WAV/RVID
      payloads + feature extraction from the pixel/sample data;
    - ``decode='fake'``: deterministic sha-fold (no decode) for
      payloads in formats this container cannot parse;
    - ``decode='raise'``: the seam where PIL/ffmpeg plug in for
      real-world codecs — raises ``NotImplementedError``.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "raise":
                raise NotImplementedError(
                    "JPEG/MP3/H.264 decode requires PIL/ffmpeg — not in "
                    "this container; PPM/WAV/RVID decode via decode='numpy'"
                )
            payloads = pdf["payload"]
            if decode == "numpy":
                features = [
                    _numpy_features(k, p or b"")
                    for k, p in zip(pdf["kind"], payloads)
                ]
            else:
                features = [_fake_features(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha": [
                        hashlib.sha256(p or b"").hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(p or b"") for p in payloads],
                    "features": features,
                }
            )

    return media.mapInPandas(op, schema=_FEATURES_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL payloads: PPM
    gradients+noise images, WAV sine+noise clips, RVID moving-gradient
    videos — no external data, decodable by the numpy decoders above."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w = h = 32
            xx, yy = np.meshgrid(np.arange(w), np.arange(h))
            base = ((xx * (3 + i) + yy * (5 + i)) % 256).astype(np.float32)
            noise = rng.integers(0, 40, size=(h, w, 3))
            rgb = np.clip(base[..., None] * [1.0, 0.7, 0.4] + noise, 0, 255)
            payload = encode_ppm(rgb.astype(np.uint8))
            meta = (w, h, None, None, "image/x-portable-pixmap")
        elif kind == "audio":
            sr = 16000
            t = np.arange(1600) / sr
            freq = 200.0 + 37.0 * (i % 20)
            x = 0.6 * np.sin(2 * np.pi * freq * t)
            x = x + 0.05 * rng.standard_normal(len(t))
            payload = encode_wav((np.clip(x, -1, 1) * 32767).astype(np.int16), sr)
            meta = (None, None, sr, None, "audio/wav")
        else:
            nf, w, h = 8, 16, 16
            xx, yy = np.meshgrid(np.arange(w), np.arange(h))
            frames = np.stack(
                [
                    np.clip(
                        ((xx + 7 * f + i) * 9 % 256)[..., None]
                        * np.array([1.0, 0.8, 0.6])
                        + rng.integers(0, 20, size=(h, w, 3)),
                        0,
                        255,
                    )
                    for f in range(nf)
                ]
            ).astype(np.uint8)
            payload = encode_rvid(frames)
            meta = (None, None, None, nf, "video/x-rvid")
        rows.append((i, kind, bytes(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
