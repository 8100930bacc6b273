"""Content-stream tokenizer — SURVEY.md §2.12 (C2a, C2b).

Parity target: ContentStream.__parseContentStream
(/root/reference/generic.py:1189-1220) and _readInlineImage
(generic.py:1222-1280), re-built as a single regex-driven pass over the
decoded content bytes. Yields (operands, operator) pairs in byte order —
the ordering contract every span derives from (SURVEY §2.6 O1).
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

from .cos import (Name, PdfError, parse_dict, parse_hex_string,
                  parse_literal_string, parse_object, skip_ws)

_OPERATOR = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")
# the reference ends an inline image only at "EI" + whitespace + "Q"
# (generic.py:1262-1276); raw "EI" bytes inside the data are skipped
# unless that exact pattern follows. Fallback for images not wrapped in
# q/Q: "EI" preceded and followed by whitespace (or end-of-stream).
_EI_Q = re.compile(rb"EI[\x00\t\n\x0c\r ]+(?=Q)")
_EI_WS = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")

INLINE_IMAGE_OP = "INLINE IMAGE"


_SCAN = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*"
    rb"(?:"
    rb"(?P<lit>\()"
    rb"|(?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+))"
    rb"|(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<op>[A-Za-z'\"][^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<arr>[\[\]])"
    rb"|(?P<dict><<)"
    rb"|(?P<hex><)"
    rb"|(?P<nul>\x00)"
    rb"|(?P<bad>.)"
    rb")"
)

_KEYWORDS = {b"true": True, b"false": False, b"null": None}


def tokenize(data: bytes) -> List[Tuple[list, str]]:
    """Decoded content bytes -> ordered [(operands, operator)].

    Single combined-scanner regex (one C-level match per token, ~1.2-
    1.4x the dispatch-per-token version); semantics identical to the
    reference tokenizer (hypothesis-tested): alpha tokens are operators
    at top level, but true/false/null INSIDE an array are values
    (readObject parses whole arrays, generic.py:278-330)."""
    ops: List[Tuple[list, str]] = []
    operands: list = []
    stack: List[list] = []
    pos = 0
    n = len(data)
    scan = _SCAN.match
    append_op = ops.append
    while pos < n:
        m = scan(data, pos)
        if m is None or m.end() == pos:
            break
        g = m.lastgroup
        pos = m.end()
        if g == "num":
            tok = m.group("num")
            if b"." in tok:
                try:
                    v = float(tok)
                except ValueError:  # malformed real -> 0
                    v = 0.0
            else:
                try:
                    v = int(tok)
                except ValueError:  # overflow -> 0
                    v = 0
            operands.append(v)
        elif g == "lit":
            try:
                v, pos = parse_literal_string(data, m.start("lit"))
            except PdfError:
                break  # tolerate trailing garbage
            operands.append(v)
        elif g == "op":
            tok = m.group("op")
            if stack and tok in _KEYWORDS:
                operands.append(_KEYWORDS[tok])
            elif tok == b"BI":
                try:
                    settings, img, pos = _read_inline_image(data, pos)
                except PdfError:
                    break
                append_op(
                    ([{"settings": settings, "data": img}], INLINE_IMAGE_OP)
                )
                operands = []
            else:
                append_op((operands, tok.decode("latin-1")))
                operands = []
        elif g == "name":
            operands.append(
                Name(m.group("name").decode("utf-8", "surrogateescape"))
            )
        elif g == "arr":
            if m.group("arr") == b"[":
                stack.append(operands)
                operands = []
            else:
                arr = operands
                operands = stack.pop() if stack else []
                operands.append(arr)
        elif g == "dict":
            try:
                v, pos = parse_dict(data, m.start("dict"))
            except PdfError:
                break
            operands.append(v)
        elif g == "hex":
            try:
                v, pos = parse_hex_string(data, m.start("hex"))
            except PdfError:
                break
            operands.append(v)
        else:  # NUL terminates (generic.py:1196); "bad" bytes stop too
            break
    return ops


_LIT_ESC = {0x5C: b"\\\\", 0x28: b"\\(", 0x29: b"\\)",
            0x0A: b"\\n", 0x0D: b"\\r", 0x09: b"\\t",
            0x08: b"\\b", 0x0C: b"\\f"}


def _ser_string(raw: bytes) -> bytes:
    """Literal string with octal escapes for non-printables — every
    byte round-trips through parse_literal_string."""
    out = bytearray(b"(")
    for b in raw:
        esc = _LIT_ESC.get(b)
        if esc is not None:
            out += esc
        elif 0x20 <= b <= 0x7E:
            out.append(b)
        else:
            out += b"\\%03o" % b
    out += b")"
    return bytes(out)


def _ser_value(v) -> bytes:
    """One COS operand -> bytes that tokenize back to an equal value."""
    if isinstance(v, Name):
        return str(v).encode("utf-8", "surrogateescape")
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if v is None:
        return b"null"
    if isinstance(v, int):
        return b"%d" % v
    if isinstance(v, float):
        s = repr(v)
        if "e" in s or "E" in s:  # scanner has no exponent syntax
            s = format(v, ".20f").rstrip("0") or "0."
        return s.encode()
    if isinstance(v, str):
        # text strings re-enter via the literal-string BOM sniff (hex
        # strings are never sniffed, cos.py parity)
        return _ser_string(b"\xfe\xff" + v.encode("utf-16-be"))
    if isinstance(v, (bytes, bytearray)):
        return _ser_string(bytes(v))
    if isinstance(v, list):
        return b"[" + b" ".join(_ser_value(x) for x in v) + b"]"
    if isinstance(v, dict):
        parts = []
        for k, val in v.items():
            parts.append(_ser_value(k if isinstance(k, Name) else Name(k)))
            parts.append(_ser_value(val))
        return b"<< " + b" ".join(parts) + b" >>"
    raise PdfError(f"unserializable operand {type(v).__name__}")


def serialize_ops(ops: List[Tuple[list, str]]) -> bytes:
    """[(operands, operator)] -> content-stream bytes; the inverse of
    tokenize at op-list granularity (C2c):
    tokenize(serialize_ops(tokenize(x))) == tokenize(x), property-tested.

    Inline images re-frame per the tokenizer's own EI contract: data
    captured via the EI-ws-Q path is re-emitted bare before 'EI' (the
    following Q op completes the pattern); data from the ws-EI path
    already carries its trailing whitespace byte, which the re-parse
    returns to it."""
    toks: List[bytes] = []
    for operands, operator in ops:
        if operator == INLINE_IMAGE_OP:
            img = operands[0]
            parts = [b"BI"]
            for k, val in img["settings"].items():
                parts.append(_ser_value(k if isinstance(k, Name) else Name(k)))
                parts.append(_ser_value(val))
            parts.append(b"ID")
            head = b" ".join(parts) + b" "
            toks.append(head + img["data"] + b"EI")
        else:
            toks.append(
                b" ".join([_ser_value(v) for v in operands]
                          + [operator.encode("latin-1")])
            )
    return b" ".join(toks)


def _read_inline_image(data: bytes, pos: int):
    """BI <k v ...> ID <raw> EI."""
    settings: dict = {}
    n = len(data)
    while True:
        pos = skip_ws(data, pos)
        if pos >= n:
            raise PdfError("unterminated inline image dict")
        m = _OPERATOR.match(data, pos)
        if m and m.group() == b"ID":
            pos = m.end()
            break
        key, pos = parse_object(data, pos)
        pos = skip_ws(data, pos)
        val, pos = parse_object(data, pos)
        settings[key] = val
    # exactly one whitespace byte after ID separates it from the data
    if pos < n and data[pos] in b"\x00\t\n\x0c\r ":
        pos += 1
    m = _EI_Q.search(data, pos)
    if m:
        return settings, data[pos : m.start()], m.end()
    m = _EI_WS.search(data, max(pos - 1, 0))
    if not m:
        raise PdfError("inline image without EI")
    # the whitespace byte before EI belongs to the image data
    return settings, data[pos : m.start() + 1], m.end()
