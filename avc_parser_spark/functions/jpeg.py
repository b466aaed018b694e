"""Baseline-sequential JPEG (JFIF) codec — pure stdlib + numpy, no external
codec, same in-sandbox discipline as the PNG/GIF kernels (multimodal.py).

Decoder scope (the dominant real-web-crawl image class):
- baseline DCT (SOF0), 8-bit precision;
- 1 component (grayscale) or 3 components (YCbCr) with sampling factors
  in {1,2} per axis (covers 4:4:4, 4:2:2, 4:2:0);
- Huffman tables from the stream's own DHT segments (so files from ANY
  conformant baseline encoder decode, not just ours);
- restart markers (DRI/RSTn) with DC-predictor reset;
- defensive: size caps, truncated-stream and invalid-table rejection —
  corrupt media must return None, never throw out of the kernel.

Encoder scope (for planted payloads + roundtrip property tests):
- grayscale or RGB 4:4:4, Annex K quantization tables scaled by the
  libjpeg quality formula, Annex K Huffman tables (emitted as DHT).

Exact-roundtrip plant subspace: for a BLOCK-CONSTANT 8×8 tile the FDCT has
a single nonzero coefficient DC = 8·(v−128); at quality 50 the luma
quantizer q00 = 16, so any even v quantizes losslessly and the decoder
reproduces the tile byte-exactly — that is what makes planted JPEGs
oracle-enumerable in DuckDB despite JPEG being lossy in general.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K — public spec) --------------------------

STD_LUMA_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

STD_CHROMA_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# (bits-per-length[1..16], symbol values) — Annex K.3.3
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _zigzag_pairs() -> list[tuple[int, int]]:
    """Zigzag index → (row, col): odd diagonals walk down-left, even walk
    up-right (generated, not typed — 64 constants invite typos)."""
    out: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(j, s - j) for j in range(s + 1) if j < 8 and s - j < 8]
        out.extend(diag if s % 2 == 1 else [(b, a) for a, b in diag])
    return out


ZIGZAG = _zigzag_pairs()
assert len(ZIGZAG) == 64 and ZIGZAG[:4] == [(0, 0), (0, 1), (1, 0), (2, 0)]
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: FDCT = M·B·Mᵀ (matches the
    T.81 1/4·C(u)C(v)·ΣΣ definition), IDCT = Mᵀ·S·M."""
    x = np.arange(8)
    u = x.reshape(8, 1)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return m


_DCT_M = _dct_matrix()


def scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → per-entry scale, clamped to
    [1, 255] (255 since baseline DQT entries are 8-bit)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (table * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


class _HuffTable:
    """Canonical Huffman table from a (bits, vals) DHT spec: decode via a
    (length, code) → symbol dict, encode via symbol → (code, length)."""

    def __init__(self, bits: list[int], vals: list[int]):
        if len(bits) != 16 or sum(bits) != len(vals) or sum(bits) > 256:
            raise ValueError("bad huffman spec")
        self.decode_map: dict[tuple[int, int], int] = {}
        self.encode_map: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if code >= (1 << length):
                    raise ValueError("oversubscribed huffman table")
                sym = vals[k]
                self.decode_map[(length, code)] = sym
                self.encode_map[sym] = (code, length)
                code += 1
                k += 1
            code <<= 1


# --- bit I/O over entropy-coded segments -----------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 destuffing;
    stops at any marker (0xFF xx, xx≠0) and exposes it for RST handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_and_consume_rst(self) -> bool:
        """At a restart boundary: drop partial bits, consume the RSTn
        marker (either pending from _fill or directly in the stream)."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            # marker bytes not yet reached via _fill: scan directly
            while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
                nxt = self.data[self.pos + 1]
                if 0xD0 <= nxt <= 0xD7:
                    self.pos += 2
                    return True
                break
            return False
        if 0xD0 <= self.marker <= 0xD7:
            self.marker = None
            return True
        return False

    def decode_symbol(self, table: _HuffTable) -> int | None:
        code = 0
        for length in range(1, 17):
            b = self.read_bit()
            if b is None:
                return None
            code = (code << 1) | b
            sym = table.decode_map.get((length, code))
            if sym is not None:
                return sym
        return None


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map `size` magnitude bits to the signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --- decoder ---------------------------------------------------------------

_MAX_PIXELS = 64 << 20


def decode_jpeg_pixels(payload: bytes):
    """Decode a baseline JFIF payload → (uint8 array of shape (H, W) or
    (H, W, 3) RGB, n_components); None for anything unsupported/corrupt."""
    try:
        return _decode_jpeg_inner(payload)
    except Exception:  # noqa: BLE001 — corrupt media must not fail the job
        return None


def _decode_jpeg_inner(payload: bytes):
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (h, w, comps) comps: list of (cid, hs, vs, tq)
    restart_interval = 0
    scan = None

    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        if pos + 2 > n:
            return None
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > n:
            return None
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0 or i + 65 > len(seg):  # 8-bit tables only
                    return None
                tbl = np.zeros((8, 8), dtype=np.int32)
                vals = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                if i + 17 + cnt > len(seg):
                    return None
                vals = list(seg[i + 17 : i + 17 + cnt])
                table = _HuffTable(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6 or seg[0] != 8:
                return None
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if (
                h <= 0 or w <= 0 or h * w > _MAX_PIXELS
                or nc not in (1, 3) or len(seg) < 6 + 3 * nc
            ):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    return None
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types unsupported
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                return None
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None or len(seg) < 1:
                return None
            ns = seg[0]
            if ns != len(frame[2]) or len(seg) < 1 + 2 * ns:
                return None
            sel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                sel[cid] = (tt >> 4, tt & 0x0F)
            scan = (sel, pos)
            break
        # APPn / COM / others: skipped via seglen
    if frame is None or scan is None:
        return None
    return _decode_scan(payload, frame, scan, qt, huff_dc, huff_ac,
                        restart_interval)


def _decode_scan(payload, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    sel, pos = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for _cid, hs, vs, tq in comps:
        if tq not in qt:
            return None
        planes.append(
            np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        )

    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not reader.align_and_consume_rst():
                    return None
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                if cid not in sel:
                    return None
                td, ta = sel[cid]
                dc_tab, ac_tab = huff_dc.get(td), huff_ac.get(ta)
                if dc_tab is None or ac_tab is None:
                    return None
                for by in range(vs):
                    for bx in range(hs):
                        block = _decode_block(reader, dc_tab, ac_tab, preds, ci)
                        if block is None:
                            return None
                        pix = _DCT_M.T @ (block * qt[tq]) @ _DCT_M
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix

    out_planes = []
    for ci, (_cid, hs, vs, _tq) in enumerate(comps):
        p = planes[ci]
        # upsample to full resolution by pixel replication, crop to (h, w)
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w] + 128.0)

    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return gray, 1
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8), 3


def _decode_block(reader, dc_tab, ac_tab, preds, ci):
    t = reader.decode_symbol(dc_tab)
    if t is None or t > 15:
        return None
    diff = 0
    if t:
        bits = reader.read_bits(t)
        if bits is None:
            return None
        diff = _extend(bits, t)
    preds[ci] += diff
    coeffs = np.zeros((8, 8), dtype=np.float64)
    coeffs[0, 0] = preds[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tab)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 0x0F
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += r
        if k > 63 or s == 0:
            return None
        bits = reader.read_bits(s)
        if bits is None:
            return None
        coeffs[ZIGZAG[k]] = _extend(bits, s)
        k += 1
    return coeffs


# --- encoder ---------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(writer, block, quant, dc_tab, ac_tab, pred):
    coeffs = _DCT_M @ block @ _DCT_M.T
    q = np.rint(coeffs / quant).astype(np.int64)
    zz = q[_ZZ_ROWS, _ZZ_COLS]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_tab.encode_map[s]
    writer.write(code, length)
    if s:
        writer.write(_mag_bits(diff, s), s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab.encode_map[0xF0]
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tab.encode_map[(run << 4) | s]
        writer.write(code, length)
        writer.write(_mag_bits(v, s), s)
        run = 0
    if last_nz < 63:
        code, length = ac_tab.encode_map[0x00]
        writer.write(code, length)
    return dc


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, vals = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    zz = table[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz


def encode_jpeg(
    img: np.ndarray,
    quality: int = 50,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode grayscale (H, W) or RGB (H, W, 3) uint8 → baseline JFIF
    (Annex K Huffman tables, quality-scaled Annex K quantizers).

    subsampling: '444' (no chroma subsampling), '422' (horizontal-only) or
    '420' (2×2 box-averaged chroma — the dominant real-crawl layout);
    ignored for grayscale.
    restart_interval > 0 emits DRI + RSTn markers every N MCUs (exercises
    the decoder's predictor-reset path)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    lq = scale_quant(STD_LUMA_QUANT, quality)
    cq = scale_quant(STD_CHROMA_QUANT, quality)

    if gray:
        channels = [img.astype(np.float64) - 128.0]
        quants = [lq]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        channels = [np.rint(c) - 128.0 for c in (y, cb, cr)]
        quants = [lq, cq, cq]
        samps = {
            "420": [(2, 2), (1, 1), (1, 1)],
            "422": [(2, 1), (1, 1), (1, 1)],
        }.get(subsampling, [(1, 1), (1, 1), (1, 1)])

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for ci, chan in enumerate(channels):
        hs, vs = samps[ci]
        # pad to the full MCU grid by edge replication, then box-downsample
        # subsampled components
        full_h, full_w = mcuy * vmax * 8, mcux * hmax * 8
        p = np.pad(chan, ((0, full_h - h), (0, full_w - w)), mode="edge")
        fy, fx = vmax // vs, hmax // hs
        if fy > 1 or fx > 1:
            p = p.reshape(full_h // fy, fy, full_w // fx, fx).mean(axis=(1, 3))
            p = np.rint(p)
        planes.append(p)

    dc_l, ac_l = _HuffTable(*DC_LUMA_SPEC), _HuffTable(*AC_LUMA_SPEC)
    dc_c, ac_c = _HuffTable(*DC_CHROMA_SPEC), _HuffTable(*AC_CHROMA_SPEC)
    writer = _BitWriter()
    preds = [0] * len(channels)
    out_chunks: list[bytes] = []
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out_chunks.append(writer.flush())
                out_chunks.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                writer = _BitWriter()
                preds = [0] * len(channels)
            mcu_count += 1
            for ci, plane in enumerate(planes):
                hs, vs = samps[ci]
                dc_tab = dc_l if ci == 0 else dc_c
                ac_tab = ac_l if ci == 0 else ac_c
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        preds[ci] = _encode_block(
                            writer, plane[y0 : y0 + 8, x0 : x0 + 8],
                            quants[ci], dc_tab, ac_tab, preds[ci],
                        )
    out_chunks.append(writer.flush())

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    nc = 1 if gray else 3
    sof_comps = b"".join(
        bytes([cid + 1, (samps[cid][0] << 4) | samps[cid][1],
               0 if cid == 0 else 1])
        for cid in range(nc)
    )
    sof = b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + bytes([8]) + \
        struct.pack(">HH", h, w) + bytes([nc]) + sof_comps
    sos_comps = b"".join(
        bytes([cid + 1, 0x00 if cid == 0 else 0x11]) for cid in range(nc)
    )
    sos = b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc]) + \
        sos_comps + b"\x00\x3f\x00"

    parts = [b"\xff\xd8", app0, _dqt_segment(0, lq)]
    if not gray:
        parts.append(_dqt_segment(1, cq))
    parts += [sof, _dht_segment(0, 0, DC_LUMA_SPEC),
              _dht_segment(1, 0, AC_LUMA_SPEC)]
    if not gray:
        parts += [_dht_segment(0, 1, DC_CHROMA_SPEC),
                  _dht_segment(1, 1, AC_CHROMA_SPEC)]
    if restart_interval:
        parts.append(
            b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        )
    parts += [sos] + out_chunks + [b"\xff\xd9"]
    return b"".join(parts)
