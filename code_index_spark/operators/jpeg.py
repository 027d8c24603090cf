"""Baseline JFIF JPEG codec — numpy + stdlib struct, no codec library
(round-4 VERDICT #3: the last real image format the container's synth
corpora use that still decoded fake; reference parity bar is its
any-file-type indexing via Magika mime gating, magika_detector.py:71-101).

Decoder (`decode_jpeg`): baseline sequential DCT (SOF0) with
- Huffman tables read from the file's DHT segments (works for Annex-K
  standard tables, optimized tables, or anything else a writer emits),
- generic per-component sampling factors — 4:4:4, 4:2:2 and 4:2:0
  interleaved MCUs all run through the same loop,
- restart markers (DRI/RSTn: byte realign + DC predictor reset),
- 8-bit quantization tables, 1- or 3-component scans.
Progressive (SOF2), arithmetic coding, 12-bit precision and 16-bit
quant tables raise a scoped NotImplementedError; truncated or corrupt
streams raise ValueError/EOFError (the multimodal _DECODE_ERRORS set).

Encoder (`encode_jpeg`): the fixture generator that makes the decoder
testable without external files — standard quality-scaled quantization
matrices, canonical fixed-length Huffman tables (all 12 DC symbols at
4 bits, all 162 AC symbols at 8; deliberately simple but fully valid
DHT BITS/HUFFVAL form — the decoder consumes whatever the file
declares, so table realism buys no extra coverage), optional 4:2:0
subsampling to exercise the decoder's interleaved-MCU path.

Everything is 8×8-block local: the DCT/quantization stages vectorize
over all blocks of a plane with one einsum, and only the entropy
coding walks blocks in Python (bit-serial by definition).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables
# zigzag scan order, generated (not transcribed): anti-diagonals d=r+c,
# even d walks up-right (r decreasing), odd d walks down-left
_ZZ = np.array(
    [
        r * 8 + (d - r)
        for d in range(15)
        for r in (
            range(max(0, d - 7), min(d, 7) + 1)
            if d % 2
            else range(min(d, 7), max(0, d - 7) - 1, -1)
        )
    ]
)

# standard luminance/chrominance quantization matrices (JPEG spec
# Annex K.1 — embedded in DQT, so the decoder never assumes them)
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

# orthonormal 8-point DCT-II basis: forward F = T @ X @ T.T,
# inverse X = T.T @ F @ T — matches JPEG's normalization
_K = np.arange(8)
_T = 0.5 * np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16)
_T[0] *= 1 / np.sqrt(2)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = the standard tables verbatim."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((q * scale + 50) / 100), 1, 255)


def _fixed_length_table(huffval: list[int], length: int) -> tuple[bytes, bytes]:
    """(BITS, HUFFVAL) for a canonical code giving every symbol the
    same `length` — valid iff len(huffval) <= 2^length - 1 (the
    all-ones code stays unassigned, as the spec's table generation
    procedure guarantees)."""
    assert len(huffval) <= (1 << length) - 1
    bits = [0] * 16
    bits[length - 1] = len(huffval)
    return bytes(bits), bytes(huffval)


_DC_HUFFVAL = list(range(12))
_AC_HUFFVAL = (
    [0x00]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
)


def _canonical_codes(bits: bytes, huffval: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: bytes, huffval: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, huffval).items()
    }


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category: (size, appended bits)."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# --------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) plane, H and W multiples of 8 → (H//8, W//8, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _encode_plane_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """All blocks DCT'd + quantized in one einsum → int32 coefficients
    in natural order, shape (by, bx, 8, 8)."""
    blocks = _blocks_of(plane.astype(np.float64) - 128.0)
    coeff = np.einsum("ij,abjk,lk->abil", _T, blocks, _T)
    return np.round(coeff / qtab).astype(np.int32)


def _entropy_encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, length = dc_codes[size]
    bw.put(code, length)
    if size:
        bw.put(bits, size)
    nz = np.nonzero(zz[1:])[0]
    last = 0
    for idx in nz:
        run = int(idx) - last
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.put(code, length)
            run -= 16
        size, bits = _magnitude(int(zz[1 + idx]))
        code, length = ac_codes[(run << 4) | size]
        bw.put(code, length)
        bw.put(bits, size)
        last = int(idx) + 1
    if last != 63:
        code, length = ac_codes[0x00]  # EOB
        bw.put(code, length)
    return dc


def _pad_edge(plane: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, th - h), (0, tw - w)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """HxWx3 uint8 RGB → baseline JFIF bytes. subsample=True emits
    4:2:0 (2×2-box-averaged chroma, interleaved 16×16 MCUs);
    restart_interval > 0 emits DRI + RSTn markers every that many MCUs
    (exercises the decoder's realign/reset path)."""
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0

    hv = (2, 2) if subsample else (1, 1)
    hmax, vmax = hv
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    planes = []
    for plane, (hc, vc) in ((y, hv), (cb, (1, 1)), (cr, (1, 1))):
        if (hc, vc) != (hmax, vmax):
            # box-average subsample after edge-padding to even dims
            sy, sx = vmax // vc, hmax // hc
            p = _pad_edge(plane, -(-h // sy) * sy, -(-w // sx) * sx)
            p = p.reshape(p.shape[0] // sy, sy, p.shape[1] // sx, sx).mean(
                axis=(1, 3)
            )
        else:
            p = plane
        planes.append(_pad_edge(p, mcus_y * vc * 8, mcus_x * hc * 8))

    comps = [(1, hv, 0), (2, (1, 1), 1), (3, (1, 1), 1)]  # (id, (h,v), qtab)
    coeffs = [
        _encode_plane_blocks(p, qy if qi == 0 else qc)
        for p, (_, _, qi) in zip(planes, comps)
    ]

    dc_codes = _canonical_codes(*_fixed_length_table(_DC_HUFFVAL, 4))
    ac_codes = _canonical_codes(*_fixed_length_table(_AC_HUFFVAL, 8))

    bw = _BitWriter()
    preds = [0, 0, 0]
    scan_parts: list[bytes] = []
    mcu = rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                scan_parts.append(bw.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst % 8]))
                rst += 1
                bw = _BitWriter()
                preds = [0, 0, 0]
            for ci, (_, (hc, vc), _) in enumerate(comps):
                for v in range(vc):
                    for hh in range(hc):
                        block = coeffs[ci][my * vc + v, mx * hc + hh]
                        zz = block.ravel()[_ZZ]
                        preds[ci] = _entropy_encode_block(
                            bw, zz, preds[ci], dc_codes, ac_codes
                        )
            mcu += 1
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    for tid, q in ((0, qy), (1, qc)):
        out += seg(0xFFDB, bytes([tid]) + bytes(
            q.ravel()[_ZZ].astype(np.uint8)
        ))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (hc, vc), qi in comps:
        sof += bytes([cid, (hc << 4) | vc, qi])
    out += seg(0xFFC0, sof)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    for cls, (bits, huffval) in (
        (0x00, _fixed_length_table(_DC_HUFFVAL, 4)),
        (0x10, _fixed_length_table(_AC_HUFFVAL, 8)),
    ):
        out += seg(0xFFC4, bytes([cls]) + bits + huffval)
    sos = bytes([3])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder
class _BitReader:
    """Entropy-segment bit reader over pre-unstuffed bytes, backed by
    np.unpackbits so receive() is a slice-dot, not a Python loop."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise EOFError("truncated JPEG entropy data")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise EOFError("truncated JPEG entropy data")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _decode_block(
    br: _BitReader,
    dc_tbl: dict,
    ac_tbl: dict,
    pred: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.float64)
    size = br.decode(dc_tbl)
    dc = pred + _extend(br.receive(size), size)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = br.decode(ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC coefficient run past end of block")
        zz[k] = _extend(br.receive(size), size)
        k += 1
    return zz, dc


def _split_scan(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy data from `pos` until the next non-RST marker, unstuffed
    and split into restart intervals."""
    chunks, cur = [], bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < n else None
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            pos += 2
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:  # RSTn
            chunks.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break  # real marker ends the scan
    chunks.append(bytes(cur))
    return chunks, pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF → HxWx3 uint8 RGB (grayscale replicated).

    Real Huffman + dequant + IDCT decode; see module docstring for the
    supported envelope."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan_chunks = None
    scan_comps = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tab = np.zeros(64)
                tab[_ZZ] = np.frombuffer(body, np.uint8, 64, i + 1)
                qtabs[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = body[i + 1 : i + 17]
                count = sum(bits)
                huffval = body[i + 17 : i + 17 + count]
                htabs[(cls, tid)] = _decode_table(bits, huffval)
                i += 17 + count
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0) supported, "
                f"got SOF marker 0x{marker:02x}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            # explicit length/shape checks: corrupt streams must raise
            # ValueError (the class multimodal._DECODE_ERRORS catches
            # in lenient mode), not IndexError
            if len(body) < 1:
                raise ValueError("JPEG SOS header empty")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise ValueError("JPEG SOS header truncated")
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            scan_chunks, pos = _split_scan(payload, pos)
            break  # single-scan baseline: decode below
        # APPn / COM / others: skipped
    if frame is None or scan_chunks is None:
        raise ValueError("JPEG missing SOF0 or SOS")

    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # per-component state, in scan order
    byid = {cid: (hc, vc, tq) for cid, hc, vc, tq in comps}
    state = []
    for cid, dc_id, ac_id in scan_comps:
        # missing-table / unknown-component streams must raise
        # ValueError, not KeyError (see SOS note above)
        if cid not in byid:
            raise ValueError(f"JPEG scan references unknown component {cid}")
        hc, vc, tq = byid[cid]
        if tq not in qtabs:
            raise ValueError(f"JPEG missing quantization table {tq}")
        if (0, dc_id) not in htabs or (1, ac_id) not in htabs:
            raise ValueError(
                f"JPEG missing Huffman table (dc={dc_id}, ac={ac_id})"
            )
        plane = np.zeros((mcus_y * vc * 8, mcus_x * hc * 8))
        state.append({
            "hc": hc, "vc": vc, "q": qtabs[tq],
            "dc": htabs[(0, dc_id)], "ac": htabs[(1, ac_id)],
            "plane": plane, "pred": 0,
        })

    chunk_i = 0
    br = _BitReader(scan_chunks[0])
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                chunk_i += 1  # RST: realign + reset predictors
                if chunk_i >= len(scan_chunks):
                    raise EOFError("JPEG missing restart interval data")
                br = _BitReader(scan_chunks[chunk_i])
                for st in state:
                    st["pred"] = 0
            for st in state:
                for v in range(st["vc"]):
                    for hh in range(st["hc"]):
                        zz, st["pred"] = _decode_block(
                            br, st["dc"], st["ac"], st["pred"]
                        )
                        blk = np.zeros(64)
                        blk[_ZZ] = zz
                        blk = blk.reshape(8, 8) * st["q"]
                        pix = _T.T @ blk @ _T + 128.0
                        y0 = (my * st["vc"] + v) * 8
                        x0 = (mx * st["hc"] + hh) * 8
                        st["plane"][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu += 1

    out_planes = []
    for st in state:
        p = st["plane"]
        ry, rx = vmax // st["vc"], hmax // st["hc"]
        if (ry, rx) != (1, 1):
            p = p.repeat(ry, axis=0).repeat(rx, axis=1)
        out_planes.append(p[:fh, :fw])

    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
