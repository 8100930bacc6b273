"""Span-table -> PDF serializer — the write side (SURVEY §2.2 K1-K4).

Inverts the extraction contract exactly: for spans produced by
extract_doc, `extract_doc(spans_to_pdf(pages))` returns equal spans
(kind, text, media_ref, order), and the REFERENCE's extractText on the
written file returns the same text (verified in tests/test_write.py).

Emission inverse (see kernels/extract.py):
    text chunk "...\\n"         -> (str) Tj          (Tj appends \\n)
    text chunk "\\n"            -> T*
    text chunk "\\n..."         -> (str) '           (' prepends \\n)
    media_ref "__inline__"      -> BI .. ID .. EI
    media_ref name              -> /name Do (+ XObject resource)

Text encoding: cp1252-encodable spans use a WinAnsi simple font;
anything else is written as UTF-16BE hex strings under a Type0 font
with an identity /ToUnicode CMap built from 256 per-high-byte bfranges
(the reference's bfrange offset only reads the LAST code byte,
toUnicode.py:243-254, so a single <0000><FFFF> range would drop high
bytes — 256 aligned ranges sidestep that and stay parseable by both
CMap readers).
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Optional, Sequence, Tuple

HEADER = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"

_IDENTITY_CMAP_HEAD = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /SparkPDF-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
"""
_IDENTITY_CMAP_TAIL = b"""endcmap
CMapName currentdict /CMap defineresource pop
end
end
"""


def identity_cmap() -> bytes:
    parts = [_IDENTITY_CMAP_HEAD]
    for start in range(0, 256, 100):
        hi_bytes = range(start, min(start + 100, 256))
        parts.append(b"%d beginbfrange\n" % len(list(hi_bytes)))
        for hb in range(start, min(start + 100, 256)):
            parts.append(
                b"<%02x00> <%02xff> <%02x00>\n" % (hb, hb, hb)
            )
        parts.append(b"endbfrange\n")
    parts.append(_IDENTITY_CMAP_TAIL)
    return b"".join(parts)


def esc_literal(s: bytes) -> bytes:
    return (
        s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def _emit_text(op_parts: List[bytes], text: str, operator: bytes, state: dict):
    """Append a show-text op, switching fonts as needed."""
    try:
        raw = text.encode("cp1252")
        font = b"/F1"
        token = b"(" + esc_literal(raw) + b")"
    except UnicodeEncodeError:
        font = b"/F2"
        token = b"<" + text.encode("utf-16-be").hex().encode() + b">"
        state["needs_cmap"] = True
    if state.get("font") != font:
        op_parts.append(font + b" 12 Tf")
        state["font"] = font
    op_parts.append(token + b" " + operator)


def page_content(spans: Sequence[dict], state: dict) -> bytes:
    """Ordered spans (one page) -> content-stream bytes."""
    ops: List[bytes] = [b"BT"]
    for s in spans:
        if s["kind"] == "text":
            t = s["text"] or ""
            if t == "\n":
                ops.append(b"T*")
            elif t.endswith("\n"):
                _emit_text(ops, t[:-1], b"Tj", state)
            elif t.startswith("\n"):
                _emit_text(ops, t[1:], b"'", state)
            else:
                # not producible by extraction; normalize via Tj
                _emit_text(ops, t, b"Tj", state)
        else:
            ref = s["media_ref"] or ""
            if ref == "__inline__":
                ops.append(
                    b"ET q BI /W 1 /H 1 /BPC 8 /CS /G ID \x00 EI Q BT"
                )
                state["font"] = None  # conservative: re-Tf after ET/BT
            else:
                name = ref.encode("latin-1", "replace")
                state.setdefault("xobjects", {}).setdefault(
                    name, b"\xff\xd8\xff\xdbsparkpdf-img\xff\xd9"
                )
                ops.append(b"ET q /" + name + b" Do Q BT")
                state["font"] = None
    ops.append(b"ET")
    return b" ".join(ops)


def spans_to_pdf(pages: Sequence[Sequence[dict]], compress: bool = True) -> bytes:
    """pages = list of span-lists (ordered) -> complete PDF bytes."""
    bodies: List[bytes] = []

    def add(body: bytes) -> int:
        bodies.append(body)
        return len(bodies)

    def add_stream(extra: bytes, raw: bytes) -> int:
        if compress:
            raw = zlib.compress(raw)
            extra = extra + b" /Filter /FlateDecode" if extra else b"/Filter /FlateDecode"
        return add(
            b"<< " + extra + b" /Length %d >>\nstream\n" % len(raw)
            + raw
            + b"\nendstream"
        )

    state: dict = {"font": None, "needs_cmap": False, "xobjects": {}}
    content_refs: List[int] = []
    for spans in pages:
        state["font"] = None  # each page declares its own font
        content_refs.append(add_stream(b"", page_content(spans, state)))

    f1 = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    font_entries = [b"/F1 %d 0 R" % f1]
    if state["needs_cmap"]:
        cm = add_stream(b"", identity_cmap())
        f2 = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SparkPDF-UCS"
            b" /Encoding /Identity-H /ToUnicode %d 0 R >>" % cm
        )
        font_entries.append(b"/F2 %d 0 R" % f2)
    xo_entries = []
    for name, payload in state["xobjects"].items():
        xo = add_stream(
            b"/Type /XObject /Subtype /Image /Width 1 /Height 1"
            b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode",
            payload,
        )
        xo_entries.append(b"/" + name + b" %d 0 R" % xo)
    res = b"<< /Font << " + b" ".join(font_entries) + b" >>"
    if xo_entries:
        res += b" /XObject << " + b" ".join(xo_entries) + b" >>"
    res += b" >>"

    pages_num = len(bodies) + len(content_refs) + 1
    page_refs = [
        add(
            b"<< /Type /Page /Parent %d 0 R /Contents %d 0 R >>"
            % (pages_num, cref)
        )
        for cref in content_refs
    ]
    assert add(
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % p for p in page_refs)
        + b"] /Count %d /Resources " % len(page_refs)
        + res
        + b" /MediaBox [0 0 612 792] >>"
    ) == pages_num
    root = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)

    out = bytearray(HEADER)
    offsets: Dict[int, int] = {}
    for i, body in enumerate(bodies, start=1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(bodies) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(bodies) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(bodies) + 1, root, xref_pos)
    )
    return bytes(out)
