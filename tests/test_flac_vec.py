"""Round-9 FLAC vectorization parity: the numpy residual/subframe
paths and the slice-by-8 CRC must be value-identical to the scalar
forms they replaced."""

import random

import numpy as np
import pytest

import sparkpdf.kernels.media as M
from sparkpdf.testing.imagegen import encode_flac


def test_crc16_slice_by_8_matches_bytewise():
    rng = random.Random(99)
    for n in list(range(0, 25)) + [255, 256, 257, 1023, 4096, 4101]:
        d = bytes(rng.randrange(256) for _ in range(n))
        assert M._flac_crc16(d) == M._flac_crc16_byte(d)


def _cases():
    rng = np.random.default_rng(17)
    out = []
    for bsz in (192, 576, 1024, 4096):
        for amp in (3, 2000, 30000):
            out.append(
                (list(map(int, rng.integers(-amp, amp, 4096))),
                 dict(block_size=bsz))
            )
    out.append(([5] * 2048, dict(block_size=512)))       # constant
    out.append((list(range(-900, 1148)), dict(block_size=1024)))  # ramp
    return out


def test_round_trip_exact_all_shapes():
    for samples, kw in _cases():
        enc = encode_flac(samples, 44100, **kw)
        dec = M.flac_pcm_samples(enc)
        assert dec is not None
        assert dec[0].tolist() == samples


def test_fixed_cumsum_matches_scalar_fallback(monkeypatch):
    """Force the overflow gate so every FIXED subframe takes the exact
    scalar loop, and require identical samples to the vector path."""
    encs = [encode_flac(s, 44100, **kw) for s, kw in _cases()]
    fast = [M.flac_pcm_samples(e)[0].tolist() for e in encs]
    monkeypatch.setattr(
        M, "_flac_fixed_reconstruct", lambda *a, **k: None)
    slow = [M.flac_pcm_samples(e)[0].tolist() for e in encs]
    assert fast == slow


def test_corrupt_stream_still_quarantines():
    enc = bytearray(encode_flac([1, 2, 3, 4] * 256, 44100,
                                block_size=256))
    enc[len(enc) // 2] ^= 0x40  # flip a payload bit -> CRC16 fails
    assert M.flac_pcm_samples(bytes(enc)) is None
    assert M.flac_pcm_stats(bytes(enc)) is None


def _ima_mono_reference(data, block_align):
    """The pre-round-9 general-path mono decode (slice per 4-byte
    group), kept as the differential reference for the fast path."""
    out = []
    n_blocks = len(data) // block_align
    for k in range(0, n_blocks * block_align, block_align):
        pred = int.from_bytes(data[k:k + 2], "little", signed=True)
        idx = data[k + 2]
        assert idx <= 88
        out.append(pred)
        body = data[k + 4:k + block_align]
        run = []
        p, ix = pred, idx
        for g in range(0, len(body), 4):
            for byte in body[g:g + 4]:
                t = (ix << 4) | (byte & 0x0F)
                p += M._IMA_DIFF[t]
                p = -32768 if p < -32768 else (32767 if p > 32767 else p)
                run.append(p)
                t = (M._IMA_NEXT[t] << 4) | (byte >> 4)
                p += M._IMA_DIFF[t]
                p = -32768 if p < -32768 else (32767 if p > 32767 else p)
                run.append(p)
                ix = M._IMA_NEXT[t]
        out.extend(run)
    return out


def test_ima_mono_fast_path_matches_reference():
    from sparkpdf.testing.imagegen import ima_adpcm_block

    rng = np.random.default_rng(41)
    for start_idx in (0, 20, 70, 88):
        blk = ima_adpcm_block(
            [0], [start_idx], bytes(map(int, rng.integers(0, 256, 252))))
        data = blk * 8
        assert M._ima_adpcm_decode(data, 1, 256) == \
            _ima_mono_reference(data, 256)
