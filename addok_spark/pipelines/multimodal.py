"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side machinery (schema, partition sizing, UDF signatures,
batch shapes) is real and tested; the actual media decoding is
STUBBED behind ``set_decoder`` because no image/audio libraries ship
in this environment — production wires Pillow/ffmpeg/torchaudio into
the same hook without touching the dataflow.

Scale notes: media rows are orders of magnitude wider than text rows;
``media_repartition`` sizes partitions by *bytes*, not rows, so a
single task never holds more than ``target_mb`` of payload (the
binary-column analog of spark.sql.files.maxPartitionBytes).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

# decoder hook: (kind, payload bytes) -> np.ndarray feature vector
_DECODER: Callable[[str, bytes], np.ndarray] | None = None


def set_decoder(fn: Callable[[str, bytes], np.ndarray] | None) -> None:
    global _DECODER
    _DECODER = fn


def deterministic_fake_decoder(kind: str, payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature extractor: 8 floats derived from
    the payload digest. Lets the full pipeline (including joins and
    ANN over features) run end-to-end without media libs."""
    h = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(h[:32], dtype=np.uint8)[:8].astype(np.float32) / 255.0)


def extract_features(df: DataFrame, batch_rows: int = 64) -> DataFrame:
    """mapInPandas feature extraction. Batches are re-chunked to
    ``batch_rows`` so a pathological upstream batch of wide rows
    can't blow worker memory."""
    decoder = _DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = decoder or deterministic_fake_decoder
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                feats, shas, sizes = [], [], []
                for payload, kind in zip(chunk["payload"], chunk["kind"]):
                    b = bytes(payload) if payload is not None else b""
                    shas.append(hashlib.sha256(b).hexdigest())
                    sizes.append(len(b))
                    if dec is deterministic_fake_decoder or dec is not None:
                        feats.append(dec(kind, b).astype(np.float32).tolist())
                    else:  # pragma: no cover
                        raise NotImplementedError(
                            "no media decoder configured; call set_decoder()"
                        )
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "kind": chunk["kind"].to_numpy(),
                        "payload_sha": shas,
                        "n_bytes": np.array(sizes, dtype=np.int64),
                        "feature": feats,
                    }
                )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_repartition(df: DataFrame, target_mb: int = 64) -> DataFrame:
    """Repartition media rows so each task holds ≤ target_mb payload
    (two-pass: measure total bytes, derive partition count)."""
    total = df.agg(
        F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("b")
    ).collect()[0]["b"] or 0
    parts = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return df.repartition(parts, "media_id")


def synthetic_media(spark, n: int = 100, seed: int = 11) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded
    bytes; kind round-robins image/audio/video)."""
    kinds = ["image", "audio", "video"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.Generator(np.random.PCG64(seed * 7919 + int(i)))
                kind = kinds[int(i) % 3]
                payload = rng.integers(0, 256, size=int(rng.integers(256, 2048)),
                                       dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "mime": {"image": "image/png", "audio": "audio/wav",
                                 "video": "video/mp4"}[kind],
                        "payload": payload,
                        "width": 64 if kind != "audio" else None,
                        "height": 64 if kind != "audio" else None,
                        "duration_ms": None if kind == "image" else 1000,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, 4).mapInPandas(gen, schema=MEDIA_SCHEMA)
