"""AES-128/192/256 + CBC — fast path via `cryptography`, pure-Python
FIPS-197 fallback.

Backs the /AESV2 (PDF 1.6, AES-128-CBC) and /AESV3 (PDF 2.0, AES-256)
crypt filters that the reference REJECTS outright (_security.py V<=3
only). The public cbc_encrypt/cbc_decrypt/ecb_encrypt_block dispatch to
OpenSSL via the `cryptography` package when importable (~100x faster —
this is what makes per-document V5 key material affordable in
kernels/write.py) and otherwise fall back to the from-scratch FIPS-197
implementation below. BOTH paths are validated against the published
FIPS-197 Appendix C known-answer vectors in tests/test_aes.py.
"""

from __future__ import annotations

from typing import List

try:  # optional OpenSSL-backed fast path (public `cryptography` pkg)
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _Cipher,
        algorithms as _algorithms,
        modes as _modes,
    )

    HAVE_CRYPTOGRAPHY = True
except ImportError:  # pragma: no cover - exercised via _py_* tests
    HAVE_CRYPTOGRAPHY = False

# S-box / inverse S-box (FIPS-197 Fig. 7 / Fig. 14 — public constants)
_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for i, v in enumerate(_SBOX):
    _INV_SBOX[v] = i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


# multiplication tables for the mix-columns coefficients
def _mul_table(c: int) -> bytes:
    out = bytearray(256)
    for x in range(256):
        r, a, b = 0, x, c
        while b:
            if b & 1:
                r ^= a
            a = _xtime(a)
            b >>= 1
        out[x] = r
    return bytes(out)


_M2, _M3 = _mul_table(2), _mul_table(3)
_M9, _M11, _M13, _M14 = (_mul_table(c) for c in (9, 11, 13, 14))


def _expand_key(key: bytes) -> List[bytes]:
    nk = len(key) // 4
    nr = nk + 6
    words = [key[4 * i:4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(
                (
                    _SBOX[t[1]] ^ _RCON[i // nk - 1],
                    _SBOX[t[2]],
                    _SBOX[t[3]],
                    _SBOX[t[0]],
                )
            )
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r:4 * r + 4]) for r in range(nr + 1)]


def _encrypt_block(block: bytes, rks: List[bytes]) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rks[0]))
    nr = len(rks) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows
        t = bytes(
            _SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)
        )
        # MixColumns + AddRoundKey
        rk = rks[rnd]
        s = bytearray(16)
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c:4 * c + 4]
            s[4 * c + 0] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3 ^ rk[4 * c + 0]
            s[4 * c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3 ^ rk[4 * c + 1]
            s[4 * c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3] ^ rk[4 * c + 2]
            s[4 * c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3] ^ rk[4 * c + 3]
    t = bytes(_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16))
    return bytes(a ^ b for a, b in zip(t, rks[nr]))


def _decrypt_block(block: bytes, rks: List[bytes]) -> bytes:
    nr = len(rks) - 1
    s = bytearray(a ^ b for a, b in zip(block, rks[nr]))
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        t = bytes(
            _INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)
        )
        # AddRoundKey + InvMixColumns
        rk = rks[rnd]
        u = bytes(a ^ b for a, b in zip(t, rk))
        s = bytearray(16)
        for c in range(4):
            a0, a1, a2, a3 = u[4 * c:4 * c + 4]
            s[4 * c + 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            s[4 * c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            s[4 * c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            s[4 * c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
    t = bytes(_INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16))
    return bytes(a ^ b for a, b in zip(t, rks[0]))


def _py_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC with PKCS#7 padding (the PDF convention) — pure Python."""
    rks = _expand_key(key)
    if pad:
        p = 16 - len(data) % 16
        data = data + bytes([p]) * p
    elif len(data) % 16:
        raise ValueError("unpadded CBC needs 16-byte multiple")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(block, rks)
        out += prev
    return bytes(out)


def _py_cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    rks = _expand_key(key)
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]  # tolerant truncation
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    if unpad and out:
        p = out[-1]
        if 1 <= p <= 16:
            out = out[:-p]
    return bytes(out)


def _py_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    return _encrypt_block(block, _expand_key(key))


def cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC with PKCS#7 padding (the PDF convention)."""
    if not HAVE_CRYPTOGRAPHY:
        return _py_cbc_encrypt(key, iv, data, pad)
    if pad:
        p = 16 - len(data) % 16
        data = data + bytes([p]) * p
    elif len(data) % 16:
        raise ValueError("unpadded CBC needs 16-byte multiple")
    enc = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    if not HAVE_CRYPTOGRAPHY:
        return _py_cbc_decrypt(key, iv, data, unpad)
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]  # tolerant truncation
    dec = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).decryptor()
    out = dec.update(data) + dec.finalize()
    if unpad and out:
        p = out[-1]
        if 1 <= p <= 16:
            out = out[:-p]
    return bytes(out)


def ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    if not HAVE_CRYPTOGRAPHY:
        return _py_ecb_encrypt_block(key, block)
    enc = _Cipher(_algorithms.AES(key), _modes.ECB()).encryptor()
    return enc.update(block) + enc.finalize()
