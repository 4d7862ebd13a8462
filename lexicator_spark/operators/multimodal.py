"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, partition-preserving batch iterator,
UDF signatures, metadata struct) is real and tested; the actual
codec step is STUBBED — the decode libraries (PIL/ffmpeg/librosa) are
not in this container.  ``decode_stub='fake'`` produces a
deterministic feature vector from the bytes (so pipelines and tests
exercise the full path); ``decode_stub='raise'`` raises
``NotImplementedError`` exactly where a real decoder plugs in.

Scale notes: binary payloads never pass through Python row-at-a-time —
Arrow batches carry them; feature extraction is per-partition
streaming (mapInPandas iterator), so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decode→embed step: fold the
    sha256 digest into FEATURE_DIM floats in [0, 1)."""
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    folded = arr[: FEATURE_DIM * 2].reshape(FEATURE_DIM, 2).mean(axis=1) / 255.0
    return [float(x) for x in folded]


def extract_media_features(
    media: DataFrame, decode_stub: str = "fake"
) -> DataFrame:
    """binary payloads → per-item feature vectors via mapInPandas.
    Replace ``_fake_features`` with a real decoder (PIL/ffmpeg) when
    the libs exist; everything around it is production-shaped."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg — not in this container"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha": [
                        hashlib.sha256(p or b"").hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(p or b"") for p in payloads],
                    "features": [_fake_features(p) for p in payloads],
                }
            )

    return media.mapInPandas(op, schema=_FEATURES_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for
    tests/benches — no external data."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(64, 512)))
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 if kind == "video" else None,
            "mime": f"application/x-fake-{kind}",
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
