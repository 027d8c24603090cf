"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched `mapInPandas`
UDFs.

Decode is REAL for every format the standard library can reach — BMP
(24-bit) and PPM (P6) via struct+numpy (round 3), PNG (8-bit
truecolor/truecolor-alpha, full scanline unfiltering, stdlib zlib —
round 4), baseline JFIF JPEG (Huffman + dequant + IDCT in numpy, 4:4:4
through 4:2:0, restart markers — round 5, operators/jpeg.py), PCM-16
mono WAV audio (reference analogue: Magika-gated typed handling per
mime, tree_sitter_coordinator.py:159-167). Formats that genuinely need
an external codec (MP4/H.264, MP3 — not in this container) raise a
scoped NotImplementedError unless `fake=True`, in which case a
deterministic hash-derived stand-in preserves shape semantics so the
Spark-side plumbing stays testable end to end for those mimes too;
the feature operators' `decoded_real` column records which path ran.

Scale notes: binary payloads dominate row size, so every operator
projects the binary column as late as possible and emits only compact
features; feature extraction is embarrassingly parallel (no shuffle).
Use `spark.sql.files.maxPartitionBytes` to keep scan splits bounded
when payloads are large, and repartition by a content-hash bucket
before UDF stages if the source files are few and large.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401  (public re-export)

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

WAV_RATE = 2000  # synth sample rate: small payloads, real durations


# ------------------------------------------------------- real codecs
def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit bottom-up BMP (BITMAPINFOHEADER)."""
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                           2835, 2835, 0, 0)
    bgr = img[:, :, ::-1]
    pad = b"\x00" * (row_size - w * 3)
    rows = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    return file_hdr + info_hdr + rows


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BMP → HxWx3 uint8 RGB (top-down). struct + numpy only."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise NotImplementedError(f"only 24-bit BMP supported, got {bpp}")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = data.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → HxWx3 uint8 RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6 <w> <h> <maxval> then ONE whitespace byte, then raw RGB
    fields, pos = [], 2
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval 255 PPM supported")
    pos += 1  # single whitespace after maxval
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → PNG (8-bit truecolor, filter 0 rows, one
    IDAT). Pure stdlib: zlib for deflate + CRC32."""
    import zlib

    h, w = img.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → HxWx3 uint8 RGB — REAL decode with stdlib zlib + numpy
    (no codec library): chunk walk, inflate, and full scanline
    unfiltering (None/Sub/Up/Average/Paeth). Supports 8-bit truecolor
    and truecolor+alpha (alpha dropped), non-interlaced — the shapes
    encoders actually emit; palette/16-bit/interlaced raise a scoped
    NotImplementedError."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype_, comp, filt, interlace = meta
    if (depth, comp, filt, interlace) != (8, 0, 0, 0) or ctype_ not in (2, 6):
        raise NotImplementedError(
            f"only 8-bit non-interlaced truecolor PNG supported "
            f"(depth={depth} colortype={ctype_} interlace={interlace})"
        )
    bpp = 3 if ctype_ == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        else:  # Sub / Average / Paeth need the prior pixel — sequential
            cur = np.zeros(stride, dtype=np.int32)
            pv = prev.astype(np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = pv[x]
                c = pv[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter byte {f}")
                cur[x] = (row[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    img = out.reshape(h, w, bpp)
    return img[:, :, :3].copy()


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """float64 waveform in [-1, 1] → PCM-16 mono RIFF/WAVE bytes."""
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 mono WAV → (float64 waveform in [-1, 1], sample_rate).
    Walks RIFF chunks properly (fmt may not directly precede data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, wave = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise NotImplementedError(
                    "only PCM-16 mono WAV supported, got "
                    f"fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            # symmetric with encode_wav's *32767 (round-trip error is
            # pure half-LSB rounding); -32768 maps a hair past -1.0
            wave = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32767.0
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or wave is None:
        raise ValueError("WAV missing fmt or data chunk")
    return wave, rate


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads where the container
    can decode them: images cycle valid 24-bit BMPs, PNGs, and baseline
    JPEGs (seeded pixels at the metadata dimensions), audio is valid
    PCM-16 WAV (seeded noise at the metadata duration), video stays an
    opaque mp4-mime payload — the one kind that genuinely needs an
    external codec."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 64 + (i % 4) * 32, 48 + (i % 3) * 16
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            fmt = (i // 3) % 3
            if fmt == 0:
                payload, mime = encode_bmp(img), "image/bmp"
            elif fmt == 1:
                payload, mime = encode_png(img), "image/png"
            else:
                payload, mime = encode_jpeg(img), "image/jpeg"
            rows.append((i, kind, bytearray(payload), mime, w, h, None))
        elif kind == "audio":
            dur_ms = 1000 * (1 + i % 30)
            wave = rng.uniform(-0.8, 0.8, size=WAV_RATE * dur_ms // 1000)
            rows.append((i, kind, bytearray(encode_wav(wave)),
                         "audio/wav", None, None, dur_ms))
        else:
            rows.append((i, kind, bytearray(rng.bytes(256 + (i % 7) * 64)),
                         "video/mp4",
                         64 + (i % 4) * 32, 48 + (i % 3) * 16,
                         1000 * (1 + i % 30)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_image(payload: bytes) -> np.ndarray:
    """Deterministic hash-derived pseudo-image (shape semantics only)."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


# the failure classes a corrupt/truncated payload can raise out of the
# struct+numpy+zlib codecs — anything else is a CODE bug and must
# propagate even in lenient mode (round-4 ADVICE: a blanket except
# masked real defects as fake decodes)
_DECODE_ERRORS = (struct.error, ValueError, zlib.error, EOFError)


def _decode_image_checked(
    payload: bytes, fake: bool = True
) -> tuple[np.ndarray, bool]:
    """(pixels, decoded_real): real BMP/PPM/PNG/JPEG decode where the
    magic bytes match and the payload is well-formed, else — in
    lenient mode — the deterministic hash-derived stand-in with
    decoded_real=False, preserving provenance of faked rows."""
    try:
        if payload[:2] == b"BM":
            return decode_bmp(payload), True
        if payload[:2] == b"P6":
            return decode_ppm(payload), True
        if payload[:8] == _PNG_SIG:
            return decode_png(payload), True
        if payload[:2] == b"\xff\xd8":
            return decode_jpeg(payload), True
    except (*_DECODE_ERRORS, NotImplementedError):
        # NotImplementedError = valid-but-unsupported variant (e.g.
        # progressive JPEG): lenient mode stands in, strict propagates
        if not fake:
            raise
        return _fake_image(payload), False
    if not fake:
        raise NotImplementedError(
            "only BMP/PPM/PNG/baseline-JPEG decode without a codec "
            "library; run with fake=True for the deterministic stand-in"
        )
    return _fake_image(payload), False


def decode_image(payload: bytes, fake: bool = True) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8. BMP, P6 PPM, PNG, and
    baseline JFIF JPEG decode for REAL (struct + numpy + stdlib zlib,
    no codec library); the magic-byte sniff opts into real decode
    regardless of `fake`. Other formats: with fake=True (the lenient
    mode) a deterministic hash-derived pseudo-image preserves shape
    semantics, otherwise a scoped NotImplementedError. A corrupt or
    truncated payload that merely starts with a known magic falls back
    to the stand-in too when fake=True instead of failing the whole
    stage on one row — callers that need provenance of faked rows use
    the feature operators' decoded_real column."""
    return _decode_image_checked(payload, fake=fake)[0]


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, n_bytes, sha256, width, height, mean_intensity,
    feature[16], decoded_real) per image — width/height come from the
    ACTUAL decoded pixels, not metadata. fake=True (the lenient mode)
    only governs payloads real decode can't handle — known magic bytes
    still decode for real, and corrupt rows fall back to the stand-in
    instead of failing the stage; `decoded_real` records per row which
    path ran, so fabricated features are never indistinguishable from
    real ones (round-4 ADVICE). fake=False is the strict mode that
    raises on the first undecodable payload.

    mapInPandas over binary payloads — one Arrow batch in, compact
    feature rows out; the binary column never survives the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, digests, ws, hs, means, feats, reals = (
                [], [], [], [], [], [], [], []
            )
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                buf = bytes(payload)
                img, real = _decode_image_checked(buf, fake=fake)
                flat = img.astype(np.float64).ravel()
                ids.append(int(mid))
                nbytes.append(len(buf))
                digests.append(hashlib.sha256(buf).hexdigest())
                ws.append(int(img.shape[1]))
                hs.append(int(img.shape[0]))
                means.append(float(flat.mean()))
                # 16-bin intensity histogram as the embedding stand-in
                hist, _ = np.histogram(flat, bins=16, range=(0, 256))
                feats.append((hist / max(flat.size, 1)).astype(float).tolist())
                reals.append(bool(real))
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": nbytes, "sha256": digests,
                 "width": ws, "height": hs,
                 "mean_intensity": means, "feature": feats,
                 "decoded_real": reals}
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            run,
            schema="media_id long, n_bytes int, sha256 string, "
                   "width int, height int, "
                   "mean_intensity double, feature array<double>, "
                   "decoded_real boolean",
        )
    )


def _fake_audio(payload: bytes) -> np.ndarray:
    """Deterministic hash-derived pseudo-waveform (shape semantics only)."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
    return rng.uniform(-1.0, 1.0, size=1024)


def decode_audio(payload: bytes, fake: bool = True) -> np.ndarray:
    """Decode an audio payload to a float64 waveform in [-1, 1].
    PCM-16 mono WAV decodes for REAL (struct + numpy); the magic-byte
    sniff opts into real decode regardless of `fake`. Other formats
    (mp3/ogg need a codec not in this container): fake=True (default)
    gives the deterministic hash-derived stand-in — including for
    corrupt RIFF-headered payloads — else NotImplementedError /
    the decode error."""
    try:
        if payload[:4] == b"RIFF":
            return decode_wav(payload)[0]
    except (*_DECODE_ERRORS, NotImplementedError):
        # NotImplementedError = valid-but-unsupported WAV variant
        # (stereo, non-PCM16) — lenient mode stands in for those the
        # same as for corrupt payloads (mirrors _decode_image_checked)
        if not fake:
            raise
        return _fake_audio(payload)
    if not fake:
        raise NotImplementedError(
            "only PCM WAV decode without a codec library; "
            "run with fake=True for the deterministic stand-in"
        )
    return _fake_audio(payload)


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, n_bytes, sha256, rms, zero_crossings, duration_ms,
    decoded_real) per audio row — the waveform analogue of
    image_features: compact features out, binary never survives the
    stage, no shuffle. duration_ms is MEASURED from the decoded
    samples/rate for real WAV payloads; the metadata column is only
    the fallback for fake decodes. fake=True (lenient) falls back to
    the stand-in for undecodable or corrupt payloads instead of
    failing the stage on one bad row — with decoded_real=False so the
    fabricated RMS/zero-crossing values stay distinguishable;
    fake=False raises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, digests, rmss, zcs, durs, reals = (
                [], [], [], [], [], [], []
            )
            for mid, payload, dur in zip(
                pdf["media_id"].values, pdf["payload"].values,
                pdf["duration_ms"].values,
            ):
                buf = bytes(payload)
                wave = rate = None
                try:
                    if buf[:4] == b"RIFF":
                        wave, rate = decode_wav(buf)
                except (*_DECODE_ERRORS, NotImplementedError):
                    if not fake:
                        raise
                if wave is not None:
                    measured = int(round(len(wave) * 1000.0 / rate))
                    real = True
                else:
                    wave = decode_audio(buf, fake=fake)
                    measured = int(dur) if dur is not None and not pd.isna(dur) else 0
                    real = False
                ids.append(int(mid))
                nbytes.append(len(buf))
                digests.append(hashlib.sha256(buf).hexdigest())
                rmss.append(float(np.sqrt((wave * wave).mean())))
                zcs.append(int((np.diff(np.signbit(wave)) != 0).sum()))
                durs.append(measured)
                reals.append(real)
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": nbytes, "sha256": digests,
                 "rms": rmss, "zero_crossings": zcs, "duration_ms": durs,
                 "decoded_real": reals}
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(
            run,
            schema="media_id long, n_bytes int, sha256 string, "
                   "rms double, zero_crossings int, duration_ms int, "
                   "decoded_real boolean",
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
