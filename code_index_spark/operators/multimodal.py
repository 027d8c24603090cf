"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched `mapInPandas`
UDFs.

The decode step is STUBBED (image/audio codecs are not in this
container): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder stands in so
the Spark-side plumbing — schema, batch shape, partitioning, UDF
signature — is real and testable end to end.

Scale notes: binary payloads dominate row size, so every operator
projects the binary column as late as possible and emits only compact
features; feature extraction is embarrassingly parallel (no shuffle).
Use `spark.sql.files.maxPartitionBytes` to keep scan splits bounded
when payloads are large, and repartition by a content-hash bucket
before UDF stages if the source files are few and large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads from seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + (i % 7) * 64)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + (i % 4) * 32 if kind != "audio" else None,
                48 + (i % 3) * 16 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8.

    STUB: real decoding needs an image codec (PIL/opencv — not in this
    container). With fake=True returns a deterministic pseudo-image
    derived from the payload hash, preserving shape semantics."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image codec library; "
            "run with fake=True for the deterministic stand-in"
        )
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, n_bytes, sha256, mean_intensity, feature[16]) per image.

    mapInPandas over binary payloads — one Arrow batch in, compact
    feature rows out; the binary column never survives the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, digests, means, feats = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                buf = bytes(payload)
                img = decode_image(buf, fake=fake)
                flat = img.astype(np.float64).ravel()
                ids.append(int(mid))
                nbytes.append(len(buf))
                digests.append(hashlib.sha256(buf).hexdigest())
                means.append(float(flat.mean()))
                # 16-bin intensity histogram as the embedding stand-in
                hist, _ = np.histogram(flat, bins=16, range=(0, 256))
                feats.append((hist / max(flat.size, 1)).astype(float).tolist())
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": nbytes, "sha256": digests,
                 "mean_intensity": means, "feature": feats}
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            run,
            schema="media_id long, n_bytes int, sha256 string, "
                   "mean_intensity double, feature array<double>",
        )
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Explode videos into frame-sampling tasks (timestamps only — the
    decode itself is the stubbed step). Pure SQL: sequence + explode."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
