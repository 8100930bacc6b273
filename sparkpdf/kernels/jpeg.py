"""Baseline JPEG (ITU-T T.81) codec, pure Python + numpy — from the
public spec, like kernels/ccitt_g4.py.

Scope: baseline sequential DCT, 8-bit, grayscale or 3-component 4:4:4
(no chroma subsampling), restart markers tolerated; progressive /
subsampled / 12-bit files return None (quarantine discipline — the
reference passes ALL DCT payloads through undecoded,
/root/reference/filters.py:321-330, so any pixel decode exceeds it).

The encoder exists so fixtures and the oracle corpus are self-made:
both directions share only the constant tables, and the decoder is
additionally pinned against hand-derived DC-only vectors and an
independent per-test numpy reference (tests/test_jpeg.py).

All tables below are the public T.81 Annex K example tables.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

# Annex K.1 quantization tables (luminance / chrominance), row-major
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: spatial = T.T @ coeff @ T
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits: List[int], values: List[int]):
    """(length, code) -> symbol for decode; symbol -> (code, length)
    for encode. Canonical assignment per T.81 Annex C."""
    dec = {}
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            dec[(length, code)] = sym
            enc[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return dec, enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            while True:
                if self.pos >= len(self.data):
                    raise ValueError("truncated scan")
                b = self.data[self.pos]
                self.pos += 1
                if b == 0xFF:
                    nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                    if nxt == 0x00:
                        self.pos += 1  # stuffed
                    elif 0xD0 <= nxt <= 0xD7:
                        self.pos += 1  # restart marker: skip, reset bits
                        continue
                    else:
                        raise ValueError("marker inside scan")
                self.acc = b
                self.n = 8
                break
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> Tuple[int, int]:
    """Signed value -> (size, code bits) for encoding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


# --- encoder -----------------------------------------------------------------


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """8-bit image -> baseline JPEG. pixels: (h, w) grayscale or
    (h, w, 3) RGB; dimensions need not be multiples of 8 (edge blocks
    replicate). 4:4:4, Annex K tables, no restarts."""
    if pixels.ndim == 2:
        comps = [pixels.astype(np.float64)]
        color = False
    else:
        r = pixels[..., 0].astype(np.float64)
        g = pixels[..., 1].astype(np.float64)
        b = pixels[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        comps = [y, cb, cr]
        color = True
    h, w = comps[0].shape
    bh, bw = -(-h // 8), -(-w // 8)
    # pad by edge replication
    padded = []
    for c in comps:
        p = np.zeros((bh * 8, bw * 8))
        p[:h, :w] = c
        p[h:, :w] = c[-1:, :]
        p[:, w:] = p[:, w - 1: w]
        padded.append(p)

    qts = [QUANT_LUMA] + ([QUANT_CHROMA] if color else [])
    dc_dec0, dc_enc0 = _canonical_codes(*DC_LUMA)
    ac_dec0, ac_enc0 = _canonical_codes(*AC_LUMA)
    dc_enc = [dc_enc0]
    ac_enc = [ac_enc0]
    if color:
        _, dc_enc1 = _canonical_codes(*DC_CHROMA)
        _, ac_enc1 = _canonical_codes(*AC_CHROMA)
        dc_enc += [dc_enc1, dc_enc1]
        ac_enc += [ac_enc1, ac_enc1]

    bwr = _BitWriter()
    pred = [0] * len(comps)
    for by in range(bh):
        for bx in range(bw):
            for ci, comp in enumerate(padded):
                block = comp[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
                coeff = _T @ block @ _T.T
                q = qts[min(ci, len(qts) - 1)]
                quant = np.round(coeff / q).astype(np.int64)
                zz = [int(quant.flat[ZIGZAG[i]]) for i in range(64)]
                # DC
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                t, codebits = _magnitude(diff)
                c, ln = dc_enc[ci][t]
                bwr.put(c, ln)
                if t:
                    bwr.put(codebits, t)
                # AC with run-length + ZRL + EOB
                run = 0
                for k in range(1, 64):
                    v = zz[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_enc[ci][0xF0]  # ZRL
                        bwr.put(c, ln)
                        run -= 16
                    t, codebits = _magnitude(v)
                    c, ln = ac_enc[ci][(run << 4) | t]
                    bwr.put(c, ln)
                    bwr.put(codebits, t)
                    run = 0
                if run:
                    c, ln = ac_enc[ci][0x00]  # EOB
                    bwr.put(c, ln)
    bwr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    for ti, q in enumerate(qts):
        zzq = bytes(int(q.flat[ZIGZAG[i]]) for i in range(64))
        out += seg(0xDB, bytes([ti]) + zzq)
    nc = len(comps)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, min(ci, len(qts) - 1)])
    out += seg(0xC0, sof)
    hts = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if color:
        hts += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tid, (bits, vals) in hts:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Baseline JPEG -> (h, w) uint8 grayscale or (h, w, 3) uint8 RGB.
    None for progressive / subsampled / 12-bit / malformed input."""
    try:
        return _decode(data)
    except Exception:
        return None


def _decode(data: bytes):
    if data[:2] != b"\xff\xd8":
        return None
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    scan_comps = None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        ln = int.from_bytes(data[i + 2:i + 4], "big")
        seg = data[i + 4:i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: out of scope
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k in range(64):
                    tbl.flat[ZIGZAG[k]] = seg[j + 1 + k]
                qt[tq] = tbl
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                dec, _ = _canonical_codes(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                j += 17 + nv
        elif marker == 0xC0:
            prec = seg[0]
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    return None  # subsampling out of scope
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c:3 + 2 * c]
                scan_comps.append((cs, tables >> 4, tables & 0x0F))
            i = i + 2 + ln
            break
        i += 2 + ln
    if frame is None or scan_comps is None:
        return None
    h, w, comps = frame
    if len(scan_comps) != len(comps):
        return None
    bh, bw = -(-h // 8), -(-w // 8)
    rd = _BitReader(data, i)
    planes = [np.zeros((bh * 8, bw * 8)) for _ in comps]
    pred = [0] * len(comps)
    for by in range(bh):
        for bx in range(bw):
            for ci, (cid, tq) in enumerate(comps):
                _, dtab, atab = scan_comps[ci]
                dc_t = huff_dc[dtab]
                ac_t = huff_ac[atab]
                zz = [0] * 64
                t = rd.huff(dc_t)
                diff = _extend(rd.bits(t), t) if t else 0
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = rd.huff(ac_t)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC overflow")
                    zz[k] = _extend(rd.bits(s), s)
                    k += 1
                coeff = np.zeros((8, 8))
                for kk in range(64):
                    coeff.flat[ZIGZAG[kk]] = zz[kk]
                coeff *= qt[tq]
                block = _T.T @ coeff @ _T + 128.0
                planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = block
    crop = [p[:h, :w] for p in planes]
    if len(crop) == 1:
        return np.clip(np.round(crop[0]), 0, 255).astype(np.uint8)
    y, cb, cr = crop
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def jpeg_mean_luma(data: bytes):
    """Mean luminance of a decodable baseline JPEG (integer arithmetic
    over the decoded samples, single final division, 6dp — same oracle
    discipline as kernels/media.png_mean_luma)."""
    img = decode_jpeg(data)
    if img is None:
        return None
    a = img.astype(np.int64)
    if a.ndim == 2:
        total = int(a.sum() * 1000)
        npx = a.shape[0] * a.shape[1]
    else:
        total = int((a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114).sum())
        npx = a.shape[0] * a.shape[1]
    return round(total / (1000.0 * npx), 6)
