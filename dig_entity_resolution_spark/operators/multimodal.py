"""Multimodal asset columns: opaque binary payloads + typed metadata.

Design for 100 TB training-data pipelines: image/audio/video payloads travel
as `binary` columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched mapInPandas stages so the heavy
bytes never pass through per-row Python or the driver.

This sandbox has no image/audio libraries, so the actual codec call is
STUBBED (clearly marked below): `decode_features` computes a deterministic
byte-histogram feature instead, and `decode_image_real` raises
NotImplementedError until Pillow/libav are available. Everything AROUND the
codec — schema, batching, partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

N_FEATURES = 16


def decode_image_real(payload: bytes) -> "np.ndarray":
    """STUB — the real decoder needs Pillow/libav, absent in this sandbox."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; the pipeline plumbing uses decode_features instead"
    )


def _byte_histogram_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic fake 'decode': 16-bin byte histogram, L1-normalized.

    Stands in for a codec so the Spark-side contract (binary in, fixed-width
    float vector out, Arrow batches) is real and testable.
    """
    out = np.zeros((len(payloads), N_FEATURES), dtype=np.float64)
    for i, b in enumerate(payloads):
        if b is None or len(b) == 0:
            continue
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
        out[i] = hist / hist.sum()
    return out


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: (asset_id, kind, features:array<double>).

    Partition-parallel, Arrow-batched; payload column is dropped immediately
    after decode so the fat bytes don't flow further down the plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _byte_histogram_features(pdf["payload"])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "features": list(feats),
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, "asset_id long, kind string, features array<double>"
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes one row per planned frame
    timestamp from metadata (duration_ms) without touching payloads —
    the decode of each frame is the stubbed codec step.
    """
    n_frames = F.greatest(
        F.ceil(F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        assets.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), (n_frames - 1) * every_ms, F.lit(every_ms))),
        )
        .select("asset_id", "frame_ts_ms")
    )


def synth_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fixture assets (payload = seeded pseudo-random bytes)."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(256 + (i % 7) * 64))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                (i % 5 + 1) * 1500 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
