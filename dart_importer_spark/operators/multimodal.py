"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partition-friendly
mapInPandas UDF signatures) is real and tested; the actual media decode is
STUBBED (the sandbox has no image/audio libraries) behind
``set_decoder``/deterministic fakes — swap in PIL/torchaudio on a real
cluster without touching the plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.partitioning import widen_for_python

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"

_DECODER: Callable[[bytes, str], np.ndarray] | None = None


def set_decoder(fn: Callable[[bytes, str], np.ndarray]) -> None:
    """Install a real decoder (e.g. PIL-based) on a cluster that has one."""
    global _DECODER
    _DECODER = fn


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for media decode: derive a 16-dim float
    feature from a sha256 of the payload. Keeps the pipeline end-to-end
    testable; replace via set_decoder on real clusters."""
    h = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32) / 255.0)


def extract_features(media: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    At scale: binary payloads dominate batch size, so cap Arrow batch rows
    (spark.sql.execution.arrow.maxRecordsPerBatch) and keep payload the
    only un-pruned wide column — Catalyst prunes everything else.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _DECODER or _fake_decode
        for pdf in batches:
            feats = [
                decode(p if p is not None else b"", k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    # media often arrives as one file -> one scan partition; widen so the
    # decode pass uses every core (no-op at scale)
    return widen_for_python(
        media.select("media_id", "kind", "payload"), "media_id"
    ).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts).
    The timestamp fan-out is pure JVM (sequence/explode); actual frame decode
    would plug into extract_features. Demonstrates the partitioning shape:
    fan-out happens before the expensive decode so frames of one video
    spread across tasks."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "mime")
    )


def fake_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(16, 256)), dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                int(rng.integers(1000, 10000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
