"""Baseline JPEG (ITU-T T.81) codec, pure Python + numpy — from the
public spec, like kernels/ccitt_g4.py.

Scope: baseline sequential DCT, 8-bit, grayscale or 3-component with
arbitrary integer sampling factors (4:4:4, 4:2:2, 4:2:0, ...), DRI /
restart markers decoded per T.81 E.2.4 (byte-align + DC predictor
reset at every RSTn); progressive / 12-bit / arithmetic files return
None (quarantine discipline — the reference passes ALL DCT payloads
through undecoded, /root/reference/filters.py:321-330, so any pixel
decode exceeds it).

The decode hot path is vectorized: entropy decoding uses a 16-bit
Huffman peek LUT (one list index per symbol instead of a Python loop
per BIT), coefficients are scattered sparsely into one (nblocks, 64)
array per component, and dezigzag + dequant + IDCT + chroma upsample
+ color convert all run as batched numpy ops.

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


import functools

_ZZ = np.array(ZIGZAG)


@functools.lru_cache(maxsize=32)
def _huff_lut(bits: tuple, values: tuple):
    """16-bit peek LUT: index the next 16 bits of the stream, get
    (code_length << 8) | symbol back (0 = invalid prefix). One list
    index replaces a Python loop per BIT — this is the decode hot
    path's main lever. Cached per table; real corpora overwhelmingly
    reuse the Annex K tables, so the 64 KiB build cost amortizes to
    zero."""
    lut = np.zeros(1 << 16, dtype=np.uint32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            k += 1
            lo = code << (16 - length)
            lut[lo: lo + (1 << (16 - length))] = (length << 8) | sym
            code += 1
        code <<= 1
    return lut.tolist()  # list indexing beats numpy scalar indexing


def _split_scan(data: bytes, i: int) -> List[bytes]:
    """Entropy-coded scan data from offset i, split at RSTn markers and
    destuffed (FF 00 -> FF). Segment boundaries are exactly the T.81
    E.2.4 restart boundaries: the decoder byte-aligns by construction
    (each segment starts fresh) and resets DC predictors per segment."""
    n = len(data)
    segs: List[bytes] = []
    start = p = i
    while True:
        f = data.find(b"\xff", p)
        if f == -1 or f + 1 >= n:
            segs.append(data[start:n])
            break
        m = data[f + 1]
        if m == 0x00:
            p = f + 2  # stuffed literal FF
        elif 0xD0 <= m <= 0xD7:
            segs.append(data[start:f])
            start = p = f + 2
        else:  # real marker terminates the scan
            segs.append(data[start:f])
            break
    return [s.replace(b"\xff\x00", b"\xff") for s in segs]


def _decode_mcus(seg: bytes, mcu_lo: int, mcu_hi: int, comp_meta,
                 sparse, pred) -> None:
    """Entropy-decode MCUs [mcu_lo, mcu_hi) from one destuffed restart
    segment. Nonzero coefficients append to per-component sparse
    (block_idx, zigzag_idx, value) lists — the dense scatter + IDCT
    happen once, batched, in the caller. pred[] is the running DC
    predictor (reset by the caller at restart boundaries)."""
    d = seg
    L = len(d)
    i = 0
    acc = 0
    nb = 0
    for m in range(mcu_lo, mcu_hi):
        for ci, nblk, dc_lut, ac_lut in comp_meta:
            bi_base = m * nblk
            bl, kl, vl = sparse[ci]
            for sb in range(nblk):
                bi = bi_base + sb
                while nb < 16:
                    acc = (acc << 8) | (d[i] if i < L else 0)
                    i += 1
                    nb += 8
                t = dc_lut[(acc >> (nb - 16)) & 0xFFFF]
                if t == 0:
                    raise ValueError("bad huffman code")
                nb -= t >> 8
                s = t & 0xFF
                if s:
                    while nb < s:
                        acc = (acc << 8) | (d[i] if i < L else 0)
                        i += 1
                        nb += 8
                    v = (acc >> (nb - s)) & ((1 << s) - 1)
                    nb -= s
                    pred[ci] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                if pred[ci]:
                    bl.append(bi)
                    kl.append(0)
                    vl.append(pred[ci])
                k = 1
                while k < 64:
                    while nb < 16:
                        acc = (acc << 8) | (d[i] if i < L else 0)
                        i += 1
                        nb += 8
                    t = ac_lut[(acc >> (nb - 16)) & 0xFFFF]
                    if t == 0:
                        raise ValueError("bad huffman code")
                    nb -= t >> 8
                    rs = t & 0xFF
                    s = rs & 0x0F
                    if s == 0:
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("AC overflow")
                    while nb < s:
                        acc = (acc << 8) | (d[i] if i < L else 0)
                        i += 1
                        nb += 8
                    v = (acc >> (nb - s)) & ((1 << s) - 1)
                    nb -= s
                    bl.append(bi)
                    kl.append(k)
                    vl.append(v if v >= (1 << (s - 1)) else v - (1 << s) + 1)
                    k += 1
                acc &= (1 << nb) - 1  # keep the int small
    if 8 * i - nb > 8 * L:
        # consumed virtual zero-padding past the segment end: the
        # stream was truncated (a well-formed segment never decodes
        # into its pad bits)
        raise ValueError("truncated scan")


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


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _pad_edge(p: np.ndarray, H: int, W: int) -> np.ndarray:
    h0, w0 = p.shape
    return np.pad(p, ((0, H - h0), (0, W - w0)), mode="edge")


def _mcu_zigzag_blocks(plane: np.ndarray, hi: int, vi: int, mcux: int,
                       mcuy: int, q: np.ndarray) -> list:
    """Component plane -> list of 64-int zigzagged quantized blocks in
    MCU-interleave order (my, mx, bv, bh). Transform + quantize run as
    one batched numpy op; only entropy coding stays per-block."""
    padded = _pad_edge(plane, mcuy * vi * 8, mcux * hi * 8)
    blocks = (
        padded.reshape(mcuy, vi, 8, mcux, hi, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1, 8, 8)
    )
    coeff = np.matmul(np.matmul(_T, blocks - 128.0), _T.T)
    quant = np.round(coeff / q).astype(np.int64).reshape(-1, 64)
    return quant[:, _ZZ].tolist()


def encode_jpeg(pixels: np.ndarray, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """8-bit image -> baseline JPEG. pixels: (h, w) grayscale or
    (h, w, 3) RGB; dimensions need not be multiples of 8 (edge blocks
    replicate). Annex K tables. subsampling: "444", "422" or "420"
    (color only; chroma is box-averaged). restart_interval > 0 emits a
    DRI segment and RSTn markers every that-many MCUs (byte-aligned,
    DC predictors reset — T.81 E.2.4)."""
    pixels = np.asarray(pixels)
    if pixels.ndim == 2:
        planes = [pixels.astype(np.float64)]
        color = False
        sfh = sfv = 1
    else:
        r = pixels[..., 0].astype(np.float64)
        g = pixels[..., 1].astype(np.float64)
        b = pixels[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        color = True
        sfh, sfv = _SUBSAMPLING[subsampling]
        if (sfh, sfv) != (1, 1):
            h0, w0 = y.shape
            H2, W2 = -(-h0 // sfv) * sfv, -(-w0 // sfh) * sfh
            cb = _pad_edge(cb, H2, W2).reshape(
                H2 // sfv, sfv, W2 // sfh, sfh).mean(axis=(1, 3))
            cr = _pad_edge(cr, H2, W2).reshape(
                H2 // sfv, sfv, W2 // sfh, sfh).mean(axis=(1, 3))
        planes = [y, cb, cr]
    h, w = planes[0].shape
    factors = [(sfh, sfv)] + [(1, 1)] * (len(planes) - 1)
    mcux = -(-w // (8 * sfh))
    mcuy = -(-h // (8 * sfv))
    n_mcus = mcux * mcuy

    qts = [QUANT_LUMA] + ([QUANT_CHROMA] if color else [])
    _, dc_enc0 = _canonical_codes(*DC_LUMA)
    _, ac_enc0 = _canonical_codes(*AC_LUMA)
    dc_enc = [dc_enc0]
    ac_enc = [ac_enc0]
    if color:
        _, dc_enc1 = _canonical_codes(*DC_CHROMA)
        _, ac_enc1 = _canonical_codes(*AC_CHROMA)
        dc_enc += [dc_enc1, dc_enc1]
        ac_enc += [ac_enc1, ac_enc1]

    zz_blocks = [
        _mcu_zigzag_blocks(
            planes[ci], fi[0], fi[1], mcux, mcuy, qts[min(ci, len(qts) - 1)]
        )
        for ci, fi in enumerate(factors)
    ]

    bwr = _BitWriter()
    pred = [0] * len(planes)
    ptr = [0] * len(planes)
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bwr.flush()  # byte-align with 1-fill before the marker
            bwr.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = [0] * len(planes)
        for ci, (hi_f, vi_f) in enumerate(factors):
            for _ in range(hi_f * vi_f):
                zz = zz_blocks[ci][ptr[ci]]
                ptr[ci] += 1
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
    nc = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        hi_f, vi_f = factors[ci]
        sof += bytes([ci + 1, (hi_f << 4) | vi_f, min(ci, len(qts) - 1)])
    out += seg(0xC0, sof)
    hts = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if color:
        hts += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tid, (bits, vals) in hts:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
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
    Handles arbitrary integer chroma subsampling (4:4:4/4:2:2/4:2:0/...)
    and DRI/RSTn restart intervals. None for progressive / 12-bit /
    arithmetic / malformed input."""
    try:
        return _decode(data)
    except Exception:
        return None


def _decode(data: bytes):
    if data[:2] != b"\xff\xd8":
        return None
    qt = {}
    huff_dc = {}  # th -> (bits tuple, values tuple)
    huff_ac = {}
    frame = None
    scan_comps = None
    restart_interval = 0
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
                bits = tuple(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = tuple(seg[j + 17:j + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = (bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            restart_interval = int.from_bytes(seg[:2], "big")
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
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    return None
                comps.append((cid, tq, hi, vi))
            if nc == 1:
                # single-component scans have no interleave: sampling
                # factors are ignored, the MCU is one block (T.81 A.2.2)
                comps = [(comps[0][0], comps[0][1], 1, 1)]
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
    if h == 0 or w == 0 or len(scan_comps) != len(comps):
        return None
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    if any(hmax % c[2] or vmax % c[3] for c in comps):
        return None  # non-integer upsampling ratios: out of scope
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    total_mcus = mcux * mcuy

    segs = _split_scan(data, i)
    if restart_interval:
        need = -(-total_mcus // restart_interval)
        if len(segs) < need:
            raise ValueError("missing restart segments")
    else:
        if len(segs) != 1:
            raise ValueError("RST markers without DRI")
        need = 1

    comp_meta = []
    sparse = []
    for ci, (cid, tq, hi, vi) in enumerate(comps):
        _, dtab, atab = scan_comps[ci]
        comp_meta.append((
            ci, hi * vi, _huff_lut(*huff_dc[dtab]), _huff_lut(*huff_ac[atab]),
        ))
        sparse.append(([], [], []))

    step = restart_interval or total_mcus
    for s in range(need):
        lo = s * step
        hi_m = min(lo + step, total_mcus)
        pred = [0] * len(comps)  # T.81 E.2.4: predictors reset per RST
        _decode_mcus(segs[s], lo, hi_m, comp_meta, sparse, pred)

    planes = []
    for ci, (cid, tq, hi, vi) in enumerate(comps):
        nblk = total_mcus * hi * vi
        arr = np.zeros((nblk, 64))
        bl, kl, vl = sparse[ci]
        if bl:
            arr[bl, kl] = vl
        nat = np.zeros_like(arr)
        nat[:, _ZZ] = arr  # dezigzag, batched
        deq = nat.reshape(-1, 8, 8) * qt[tq]
        blocks = np.matmul(np.matmul(_T.T, deq), _T) + 128.0
        plane = (
            blocks.reshape(mcuy, mcux, vi, hi, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * vi * 8, mcux * hi * 8)
        )
        cw = -(-w * hi // hmax)
        chh = -(-h * vi // vmax)
        plane = plane[:chh, :cw]
        ry, rx = vmax // vi, hmax // hi
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
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
