"""/ToUnicode CMap parse + apply — SURVEY.md §2.9 (T4, T5).

A fresh PostScript-subset CMap parser built on our COS lexer
(the reference re-lexes byte-at-a-time through readObject,
toUnicode.py:265-461). Semantics matched to toUnicode.code2text
(toUnicode.py:176-261):

  * bfchar entries match first (greedy, file order),
  * bfrange per-byte interval test; offset computed from the LAST code
    byte; destination shifted big-endian (or indexed if an array),
  * unmatched code unit -> U+FFFD, advance one byte,
  * output assembled as UTF-16BE then decoded once.
"""

from __future__ import annotations

import re
import struct
from typing import Dict, List, Optional, Tuple, Union

from .cos import PdfError, parse_object, skip_ws

_TOKEN = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")

_CMD_SECTION_BEGIN = {b"begincodespacerange", b"beginbfchar", b"beginbfrange"}


class CMap:
    """Compiled ToUnicode mapping for one font."""

    __slots__ = ("fchars", "franges", "codespace", "codelengths")

    def __init__(self):
        self.fchars: Dict[bytes, bytes] = {}
        # (from_bytes, to_bytes, dst_bytes_or_list)
        self.franges: List[Tuple[bytes, bytes, Union[bytes, list]]] = []
        self.codespace: List[Tuple[bytes, bytes]] = []
        self.codelengths: List[int] = []

    def code2text(self, code: bytes) -> str:
        out = bytearray()
        i = 0
        n = len(code)
        fchars = self.fchars
        lengths = self.codelengths or [1, 2]
        while i < n:
            matched = False
            for ln in lengths:
                hit = fchars.get(code[i : i + ln])
                if hit is not None:
                    out += hit if isinstance(hit, bytes) else str(hit).encode("utf-16-be")
                    i += ln
                    matched = True
                    break
            if matched:
                continue
            for lo, hi, dst in self.franges:
                ln = len(lo)
                if i + ln > n:
                    continue
                if all(lo[k] <= code[i + k] <= hi[k] for k in range(ln)):
                    offset = code[i + ln - 1] - lo[ln - 1]
                    if isinstance(dst, list):
                        d = dst[offset] if offset < len(dst) else None
                        if isinstance(d, bytes):
                            out += d
                        elif isinstance(d, str):
                            out += d.encode("utf-16-be")
                    else:
                        out += _shift_be(dst, offset)
                    i += ln
                    matched = True
                    break
            if not matched:
                out += b"\xff\xfd"
                i += 1
        return out.decode("utf-16-be", "replace")


def _shift_be(dst: bytes, offset: int) -> bytes:
    if not dst:
        return b""
    width = len(dst)
    val = int.from_bytes(dst, "big") + offset
    return val.to_bytes(width, "big")


def _as_bytes(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("utf-16-be", "replace")
    return b""


def parse_cmap(data: bytes) -> CMap:
    """Single pass over the CMap program: operands accumulate on a stack
    until a command token; only the codespacerange/bfchar/bfrange
    sections matter (everything else is PostScript ceremony)."""
    cm = CMap()
    pos = 0
    n = len(data)
    operands: list = []
    while pos < n:
        pos = skip_ws(data, pos)
        if pos >= n:
            break
        c = data[pos]
        if c in b"/<([+-.0123456789":
            try:
                obj, pos = parse_object(data, pos)
            except PdfError:
                m = _TOKEN.match(data, pos)
                pos = m.end() if m else pos + 1
                continue
            operands.append(obj)
            continue
        m = _TOKEN.match(data, pos)
        if not m:
            pos += 1
            continue
        tok = m.group()
        pos = m.end()
        if tok == b"endcodespacerange":
            for i in range(0, len(operands) - 1, 2):
                lo, hi = _as_raw(operands[i]), _as_raw(operands[i + 1])
                if lo and hi:
                    cm.codespace.append((lo, hi))
            operands.clear()
        elif tok == b"endbfchar":
            for i in range(0, len(operands) - 1, 2):
                cm.fchars[_as_raw(operands[i])] = _as_bytes(operands[i + 1])
            operands.clear()
        elif tok == b"endbfrange":
            for i in range(0, len(operands) - 2, 3):
                lo, hi = _as_raw(operands[i]), _as_raw(operands[i + 1])
                dst = operands[i + 2]
                if isinstance(dst, list):
                    cm.franges.append((lo, hi, [_as_bytes(d) for d in dst]))
                else:
                    cm.franges.append((lo, hi, _as_bytes(dst)))
            operands.clear()
        elif tok in _CMD_SECTION_BEGIN:
            # entries follow until the matching end token; the count
            # operand (and any stray ceremony) is dropped here
            operands.clear()
        else:
            # def/begin/end/dict/begincmap/... — drop pending operands
            operands.clear()
    cm.codelengths = sorted({len(lo) for lo, _ in cm.codespace}) or sorted(
        {len(k) for k in cm.fchars} | {len(lo) for lo, _, _ in cm.franges}
    ) or [1, 2]
    return cm


def _as_raw(v) -> bytes:
    """Hex-string operand as raw code bytes. parse_object turns
    UTF-16BE-BOM'd hex strings into str; recover the original bytes."""
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        try:
            return b"\xfe\xff" + v.encode("utf-16-be")
        except UnicodeEncodeError:
            return b""
    return b""
