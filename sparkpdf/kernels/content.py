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

from .cos import PdfError, parse_object, skip_ws

_OPERATOR = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")
# the reference ends an inline image only at "EI" + whitespace + "Q"
# (generic.py:1262-1276); raw "EI" bytes inside the data are skipped
# unless that exact pattern follows. Fallback for images not wrapped in
# q/Q: "EI" preceded and followed by whitespace (or end-of-stream).
_EI_Q = re.compile(rb"EI[\x00\t\n\x0c\r ]+(?=Q)")
_EI_WS = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")

INLINE_IMAGE_OP = "INLINE IMAGE"


def tokenize(data: bytes) -> List[Tuple[list, str]]:
    """Decoded content bytes -> ordered [(operands, operator)]."""
    ops: List[Tuple[list, str]] = []
    operands: list = []
    pos = 0
    n = len(data)
    while pos < n:
        pos = skip_ws(data, pos)
        if pos >= n:
            break
        c = data[pos]
        if (65 <= c <= 90) or (97 <= c <= 122) or c in (0x27, 0x22):
            # alpha / ' / " starts an operator token
            m = _OPERATOR.match(data, pos)
            tok = m.group()
            pos = m.end()
            if tok == b"BI":
                settings, img_data, pos = _read_inline_image(data, pos)
                ops.append(([{"settings": settings, "data": img_data}], INLINE_IMAGE_OP))
            else:
                ops.append((operands, tok.decode("latin-1")))
            operands = []
        elif c == 0x00:
            # NUL terminates parse in the reference (generic.py:1196)
            break
        else:
            try:
                obj, pos = parse_object(data, pos)
            except PdfError:
                break  # tolerate trailing garbage: keep what we have
            operands.append(obj)
    return ops


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
