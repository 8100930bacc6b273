"""Standard security handler (RC4, V=1/2, R=2/3) — SURVEY.md §2.11.

Implemented from the public PDF 32000-1:2008 spec (§7.6.3, Algorithms
2/4/5); behavioral parity target is /root/reference/_security.py +
_reader.py:1285-1405 (V in {1,2} only, empty-password default, missing
/ID tolerated). RC4 itself is arc4-from-spec with a numpy-free keystream
loop — acceptable because encrypted docs are a rare path.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Any

from .cos import Name, PdfError, Ref, StreamObj

# standard 32-byte padding string, PDF 32000-1:2008 §7.6.3.3
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = byte ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _compute_key(password: bytes, o_entry: bytes, p: int, id1: bytes, rev: int, keylen: int, encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: file encryption key from the user password."""
    pwd = (password + _PAD)[:32]
    m = hashlib.md5(pwd)
    m.update(o_entry[:32])
    m.update(struct.pack("<i", p))
    m.update(id1)
    if rev >= 4 and not encrypt_metadata:
        m.update(b"\xff\xff\xff\xff")
    key = m.digest()
    if rev >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
    return key[:keylen]


def _user_password_hash(key: bytes, id1: bytes, rev: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U entry for a given key."""
    if rev == 2:
        return rc4(key, _PAD)
    m = hashlib.md5(_PAD)
    m.update(id1)
    val = rc4(key, m.digest())
    for i in range(1, 20):
        step_key = bytes(b ^ i for b in key)
        val = rc4(step_key, val)
    return val + val[:16]  # padded to 32 in files; compare first 16


def make_owner_entry(owner_pwd: bytes, user_pwd: bytes, rev: int, keylen: int) -> bytes:
    """Algorithm 3: the /O entry (write side, used by the fixture
    generator only)."""
    key = hashlib.md5((owner_pwd or user_pwd) + _PAD).digest()
    if rev >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:keylen]
    val = rc4(key, (user_pwd + _PAD)[:32])
    if rev >= 3:
        for i in range(1, 20):
            val = rc4(bytes(b ^ i for b in key), val)
    return val


def make_encrypt_parts(
    user_pwd: bytes, owner_pwd: bytes, p: int, id1: bytes, rev: int, keylen: int
):
    """Returns (o_entry, u_entry, file_key) for a standard-handler
    /Encrypt dict (fixture write side)."""
    o = make_owner_entry(owner_pwd, user_pwd, rev, keylen)
    key = _compute_key(user_pwd, o, p, id1, rev, keylen)
    u = _user_password_hash(key, id1, rev)
    if rev >= 3:
        u = u[:16] + b"\x00" * 16
    return o, u, key


def object_key(file_key: bytes, idnum: int, gen: int) -> bytes:
    m = hashlib.md5(
        file_key + struct.pack("<i", idnum)[:3] + struct.pack("<i", gen)[:2]
    )
    return m.digest()[: min(len(file_key) + 5, 16)]


class StandardDecryptor:
    def __init__(self, enc: dict, id1: bytes, password: bytes = b""):
        if enc.get("/Filter") != "/Standard":
            raise PdfError(f"unsupported security handler {enc.get('/Filter')!r}")
        v = int(enc.get("/V", 0))
        if v not in (1, 2):
            raise PdfError(f"unsupported /Encrypt /V={v}")
        self.rev = int(enc.get("/R", 2))
        keylen = int(enc.get("/Length", 40)) // 8 if v == 2 else 5
        o = enc["/O"]
        u = enc["/U"]
        if isinstance(o, str):
            o = o.encode("latin-1")
        if isinstance(u, str):
            u = u.encode("latin-1")
        p = int(enc["/P"])
        self.key = _compute_key(password, o, p, id1, self.rev, keylen)
        expect = _user_password_hash(self.key, id1, self.rev)
        got = u[:16] if self.rev >= 3 else u[:32]
        want = expect[:16] if self.rev >= 3 else expect[:32]
        if got != want:
            raise PdfError("wrong password (user-password check failed)")

    def _object_key(self, idnum: int, gen: int) -> bytes:
        # per-object key: filekey + idnum[0:3] + gen[0:2], md5, clamp
        # (parity: _reader.py:828-839)
        m = hashlib.md5(
            self.key + struct.pack("<i", idnum)[:3] + struct.pack("<i", gen)[:2]
        )
        return m.digest()[: min(len(self.key) + 5, 16)]

    def decrypt_object(self, obj: Any, idnum: int, gen: int) -> Any:
        key = self._object_key(idnum, gen)
        return self._walk(obj, key)

    def _walk(self, obj: Any, key: bytes) -> Any:
        if isinstance(obj, StreamObj):
            obj.raw = rc4(key, obj.raw)
            obj.sdict = self._walk(obj.sdict, key)
            return obj
        if isinstance(obj, (Name, bool)) or obj is None:
            return obj
        if isinstance(obj, bytes):
            return rc4(key, obj)
        if isinstance(obj, str):
            dec = rc4(key, obj.encode("latin-1", "replace"))
            if dec.startswith(b"\xfe\xff"):
                try:
                    return dec.decode("utf-16")
                except UnicodeDecodeError:
                    return dec
            return dec
        if isinstance(obj, list):
            return [self._walk(v, key) for v in obj]
        if isinstance(obj, dict):
            return {k: self._walk(v, key) for k, v in obj.items()}
        return obj
