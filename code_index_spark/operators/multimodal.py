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


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to a float64 waveform in [-1, 1].

    STUB: real decoding needs an audio codec (soundfile/ffmpeg — not in
    this container). With fake=True returns a deterministic pseudo-
    waveform derived from the payload hash."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires an audio codec library; "
            "run with fake=True for the deterministic stand-in"
        )
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
    return rng.uniform(-1.0, 1.0, size=1024)


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, n_bytes, sha256, rms, zero_crossings, duration_ms)
    per audio row — the waveform analogue of image_features: compact
    features out, binary never survives the stage, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, digests, rmss, zcs, durs = [], [], [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"].values, pdf["payload"].values,
                pdf["duration_ms"].values,
            ):
                buf = bytes(payload)
                wave = decode_audio(buf, fake=fake)
                ids.append(int(mid))
                nbytes.append(len(buf))
                digests.append(hashlib.sha256(buf).hexdigest())
                rmss.append(float(np.sqrt((wave * wave).mean())))
                zcs.append(int((np.diff(np.signbit(wave)) != 0).sum()))
                durs.append(int(dur) if dur is not None and not pd.isna(dur) else 0)
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": nbytes, "sha256": digests,
                 "rms": rmss, "zero_crossings": zcs, "duration_ms": durs}
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(
            run,
            schema="media_id long, n_bytes int, sha256 string, "
                   "rms double, zero_crossings int, duration_ms int",
        )
    )


def video_frame_features(media: DataFrame, every_ms: int = 1000,
                         fake: bool = True) -> DataFrame:
    """Two-stage video path: frame_sample_plan explodes (media_id,
    frame_ts_ms) tasks in pure SQL, then ONE decode UDF stage computes
    per-frame features. The binary joins in only at the UDF stage and
    each frame decodes independently — the shape that lets a 100 TB
    video corpus fan frames across the cluster."""
    plan = frame_sample_plan(media, every_ms)
    with_payload = plan.join(
        media.select("media_id", "payload"), "media_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tss, means = [], [], []
            for mid, ts, payload in zip(
                pdf["media_id"].values, pdf["frame_ts_ms"].values,
                pdf["payload"].values,
            ):
                # deterministic fake per-frame decode: frame ts salts the hash
                frame = decode_image(
                    bytes(payload) + int(ts).to_bytes(4, "big"), fake=fake
                )
                ids.append(int(mid))
                tss.append(int(ts))
                means.append(float(frame.astype(np.float64).mean()))
            yield pd.DataFrame(
                {"media_id": ids, "frame_ts_ms": tss, "mean_intensity": means}
            )

    return with_payload.mapInPandas(
        run, schema="media_id long, frame_ts_ms int, mean_intensity double"
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
