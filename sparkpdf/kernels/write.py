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


# viewer preference values the reference accepts (parity:
# _writer.py _valid_layouts:1147-1155, _valid_modes:1207-1214)
_VALID_LAYOUTS = (
    "/NoLayout", "/SinglePage", "/OneColumn", "/TwoColumnLeft",
    "/TwoColumnRight", "/TwoPageLeft", "/TwoPageRight",
)
_VALID_MODES = (
    "/UseNone", "/UseOutlines", "/UseThumbs", "/FullScreen",
    "/UseOC", "/UseAttachments",
)


def spans_to_pdf(
    pages: Sequence[Sequence[dict]],
    compress: bool = True,
    title: Optional[str] = None,
    bookmarks: Optional[Sequence[tuple]] = None,
    links: Optional[Sequence[tuple]] = None,
    attachments: Optional[Sequence[Tuple[str, bytes]]] = None,
    form_fields: Optional[Sequence[Tuple[str, str]]] = None,
    named_dests: Optional[Sequence[Tuple[str, int]]] = None,
    javascript: Optional[str] = None,
    media_payloads: Optional[Dict[str, bytes]] = None,
    user_password: Optional[bytes] = None,
    owner_password: Optional[bytes] = None,
    encryption: str = "rc4-128",
    permissions: int = -3904,
    page_layout: Optional[str] = None,
    page_mode: Optional[str] = None,
    xref_stream: bool = False,
) -> bytes:
    """pages = list of span-lists (ordered) -> complete PDF bytes.

    Write-side enrichment (parity: _writer.py addBookmark:768-842,
    addNamedDestination:852-869, addJS:237-279, addURI/addLink:999-1145,
    /Info) and write-side encryption (parity: _writer.py encrypt:443-496
    — RC4 V=2/R=3, 128-bit, strings and streams encrypted per-object,
    /Encrypt dict exempt):
      * title       -> /Info /Title + XMP-free trailer metadata
      * bookmarks   -> /Outlines tree: (title, page_idx) items are
        roots; (title, page_idx, parent_idx) nests under the bookmark
        at position parent_idx (reference addBookmark's parent= arg) —
        /First//Last//Count//Prev//Next maintained per PDF 32000 §12.3.3
      * links       -> /Annots on (page_idx, uri) -> URI action, OR
        (page_idx, dest_page[, rect[, fit]]) -> internal GoTo /Dest
        (reference addLink: rect + border + fit modes)
      * named_dests -> /Names//Dests name tree of (name, page_idx)
      * javascript  -> document-open JS: /OpenAction action + a
        /Names//JavaScript entry (reference addJS)
      * media_payloads -> real bytes for media_ref XObjects (keyed by
        ref name; refs without an entry keep the default stub payload)
      * user_password (+ optional owner_password) -> standard security
        handler; all key material derives from a per-document content
        digest so output stays deterministic across executors (a Spark
        operator must be pure) while no two documents share keys/IVs.
        encryption in {rc4-40, rc4-128, aes-128, aes-256}; permissions
        is the /P flag (parity: _writer.py encrypt(use_128bit=False,
        permissions_flag=...), :443-496).
      * page_layout / page_mode -> catalog /PageLayout //PageMode
        (parity: setPageLayout/setPageMode, _writer.py:1157-1258);
        values validated against the reference's accepted lists.
      * xref_stream=True -> a PDF 1.5 cross-reference STREAM instead of
        the classic table (the reference only writes classic tables but
        reads both; §7.5.8, never encrypted).
    """
    import hashlib

    bodies: List[bytes] = []
    enc_key = None
    enc_parts: dict = {}
    file_id = b""
    # permissions flag (parity: _writer.py encrypt(permissions_flag=),
    # :443-496); default -3904 = print+extract allowed, modify denied
    perms = int(permissions)
    if page_layout is not None and page_layout not in _VALID_LAYOUTS:
        raise ValueError(f"invalid page_layout {page_layout!r}")
    if page_mode is not None and page_mode not in _VALID_MODES:
        raise ValueError(f"invalid page_mode {page_mode!r}")

    # page contents are encryption-independent — build them first so the
    # per-document digest (below) can cover every byte that will differ
    # between documents
    state: dict = {"font": None, "needs_cmap": False, "xobjects": {}}
    page_payloads: List[bytes] = []
    for spans in pages:
        state["font"] = None  # each page declares its own font
        page_payloads.append(page_content(spans, state))
    user_payload_names = set()
    for mp_name, mp_data in (media_payloads or {}).items():
        key = mp_name.encode("latin-1", "replace")
        if key in state["xobjects"]:
            state["xobjects"][key] = bytes(mp_data)
            user_payload_names.add(key)

    if user_password is not None:
        from . import crypto as _crypto

        if encryption not in ("rc4-40", "rc4-128", "aes-128", "aes-256"):
            raise ValueError(f"unknown encryption mode {encryption!r}")
        # Per-DOCUMENT entropy for all key material: two documents that
        # differ in any content, title, enrichment payload, or password
        # get distinct file /ID (hence distinct RC4 per-object keys and
        # distinct AES IVs — no two-time pad / CBC prefix-equality leak)
        # and, for V5, distinct file encryption keys. Deterministic by
        # construction: a Spark writer must be a pure function.
        dg = hashlib.sha256()
        dg.update((title or "").encode("utf-8") + b"\x00")
        for payload in page_payloads:
            dg.update(payload + b"\x00")
        for bm in bookmarks or ():
            dg.update(repr(bm).encode("utf-8"))
        for link in links or ():
            dg.update(repr(link).encode("utf-8"))
        for att_name, att_data in attachments or ():
            dg.update(att_name.encode("utf-8") + b"\x00" + bytes(att_data))
        for f_name, f_value in form_fields or ():
            dg.update(f"ff:{f_name}:{f_value}".encode("utf-8"))
        for mp_name in sorted(media_payloads or {}):
            dg.update(
                b"mp:" + mp_name.encode("utf-8") + b"\x00"
                + bytes(media_payloads[mp_name])
            )
        for nd_name, nd_page in named_dests or ():
            dg.update(f"nd:{nd_name}:{nd_page}".encode("utf-8"))
        if javascript:
            dg.update(b"js:" + javascript.encode("utf-8"))
        dg.update(encryption.encode())
        dg.update(f"perms:{perms}".encode())
        dg.update(f"vp:{page_layout}:{page_mode}".encode())
        doc_digest = dg.digest()
        file_id = hashlib.md5(b"sparkpdf:" + doc_digest).digest()
        if encryption == "aes-256":
            # V5 file key mixes the PASSWORDS with the document digest —
            # it is not derivable from the source or the ciphertext
            # alone, so the /UE//OE password wrapping is the real gate.
            # Affordable per-document since kernels/aes.py dispatches
            # hash_2b's AES rounds to OpenSSL when `cryptography` is
            # importable (~1 ms vs ~1 s pure-Python).
            seed = doc_digest
            enc_key = hashlib.sha256(
                b"sparkpdf-fk:" + user_password + b"\x00"
                + (owner_password or user_password) + b"\x00" + doc_digest
            ).digest()
            u48, ue, o48, oe = _crypto.make_encrypt_parts_v5(
                user_password, owner_password or user_password,
                enc_key, seed, rev=6,
            )
            enc_parts = {
                "u": u48, "o": o48, "ue": ue, "oe": oe,
                "perms": _crypto.make_perms_entry(enc_key, perms),
            }
        else:
            # rc4-40: V=1 R=2, 40-bit key (parity: _writer.py
            # encrypt(use_128bit=False), :443-496)
            rev = {"aes-128": 4, "rc4-128": 3, "rc4-40": 2}[encryption]
            keylen = 5 if encryption == "rc4-40" else 16
            o_entry, u_entry, enc_key = _crypto.make_encrypt_parts(
                user_password, owner_password or user_password,
                perms, file_id, rev, keylen,
            )
            enc_parts = {"u": u_entry, "o": o_entry}

    def add(body: bytes) -> int:
        bodies.append(body)
        return len(bodies)

    def enc_bytes(idnum: int, data: bytes) -> bytes:
        if enc_key is None:
            return data
        from . import crypto as _crypto

        if encryption in ("rc4-40", "rc4-128"):
            return _crypto.rc4(_crypto.object_key(enc_key, idnum, 0), data)
        from . import aes as _aes

        # deterministic per-object IV: a pure Spark writer cannot use
        # randomness; uniqueness per object is what CBC needs here
        iv = hashlib.md5(file_id + idnum.to_bytes(4, "big")).digest()
        key = (
            enc_key
            if encryption == "aes-256"
            else _crypto.object_key(enc_key, idnum, 0, aes=True)
        )
        return iv + _aes.cbc_encrypt(key, iv, data)

    def lit_str(idnum: int, s) -> bytes:
        """Literal string token, encrypted with the OWNING object's key."""
        raw = s.encode("cp1252", "replace") if isinstance(s, str) else bytes(s)
        return b"(" + esc_literal(enc_bytes(idnum, raw)) + b")"

    def add_stream(extra: bytes, raw: bytes, deflate: Optional[bool] = None) -> int:
        # deflate=False for already-compressed payloads (JPEG XObjects):
        # stacking /FlateDecode onto an extra carrying /Filter /DCTDecode
        # would emit DUPLICATE /Filter keys, and first-wins readers then
        # hand back deflated bytes as the "image"
        if compress if deflate is None else deflate:
            raw = zlib.compress(raw)
            extra = extra + b" /Filter /FlateDecode" if extra else b"/Filter /FlateDecode"
        raw = enc_bytes(len(bodies) + 1, raw)
        return add(
            b"<< " + extra + b" /Length %d >>\nstream\n" % len(raw)
            + raw
            + b"\nendstream"
        )

    content_refs: List[int] = []
    for payload in page_payloads:
        content_refs.append(add_stream(b"", payload))

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
        from .media import image_dims as _image_dims, png_pixels as _png_pixels

        # colorspace follows the PAYLOAD, not a fixed stamp: a 3-component
        # JPEG gets /DeviceRGB, PNGs are re-wrapped as raw FlateDecode
        # samples, anything else user-supplied is rejected rather than
        # mislabeled as grayscale DCT
        dims = _image_dims(payload)
        _CS = {1: b"/DeviceGray", 3: b"/DeviceRGB", 4: b"/DeviceCMYK"}
        if dims is not None and dims["format"] == "jpeg":
            cs = _CS.get(dims.get("components", 1))
            if cs is None:
                raise ValueError(
                    f"unsupported JPEG component count for media payload "
                    f"{name.decode('latin-1')!r}"
                )
            # PDF BitsPerComponent must be 1/2/4/8/16 (§8.9.5.1): deep
            # payloads (12-bit SOF1/SOF2, 12/16-bit lossless SOF3)
            # label 16, everything else 8
            bpc = 16 if dims.get("bits", 8) > 8 else 8
            xo = add_stream(
                b"/Type /XObject /Subtype /Image /Width %d /Height %d"
                % (dims["width"], dims["height"])
                + b" /ColorSpace " + cs
                + b" /BitsPerComponent %d /Filter /DCTDecode" % bpc,
                payload,
                deflate=False,
            )
        elif dims is not None and dims["format"] == "png":
            px = _png_pixels(payload)
            if px is None:
                raise ValueError(
                    f"PNG media payload {name.decode('latin-1')!r} is not "
                    f"an 8-bit non-interlaced PNG"
                )
            pw, ph, ch, raw = px
            if ch in (2, 4):  # strip alpha: PDF image XObjects carry none
                import numpy as _np

                arr = _np.frombuffer(raw, dtype=_np.uint8)
                raw = arr.reshape(ph, pw, ch)[..., : ch - 1].tobytes()
                ch -= 1
            xo = add_stream(
                b"/Type /XObject /Subtype /Image /Width %d /Height %d"
                % (pw, ph)
                + b" /ColorSpace " + _CS[ch] + b" /BitsPerComponent 8",
                raw,
            )
        elif dims is not None and dims["format"] == "jp2":
            # /JPXDecode passthrough (round 8): the JPEG 2000
            # codestream itself carries dims/depth/colorspace, and PDF
            # 32000-1 §7.4.9 makes ColorSpace/BitsPerComponent
            # optional-and-codestream-authoritative for this filter —
            # so only Width/Height are stamped (from the SIZ/ihdr
            # parse), mirroring the reference's JPX passthrough
            # (/root/reference/filters.py:327-330)
            xo = add_stream(
                b"/Type /XObject /Subtype /Image /Width %d /Height %d"
                % (dims["width"], dims["height"])
                + b" /Filter /JPXDecode",
                payload,
                deflate=False,
            )
        elif name in user_payload_names:
            raise ValueError(
                f"media payload {name.decode('latin-1')!r} is not an "
                f"embeddable image (JPEG, PNG or JPEG 2000 required)"
            )
        else:
            # the deterministic placeholder for refs with no payload
            xo = add_stream(
                b"/Type /XObject /Subtype /Image /Width 1 /Height 1"
                b" /ColorSpace /DeviceGray /BitsPerComponent 8"
                b" /Filter /DCTDecode",
                payload,
                deflate=False,
            )
        xo_entries.append(b"/" + name + b" %d 0 R" % xo)
    res = b"<< /Font << " + b" ".join(font_entries) + b" >>"
    if xo_entries:
        res += b" /XObject << " + b" ".join(xo_entries) + b" >>"
    res += b" >>"

    # link annotations (before pages so page bodies can reference them);
    # GoTo /Dest arrays need FORWARD page refs — page object numbers are
    # fixed once the annot count is known, so compute the base up front
    def _num(v) -> bytes:
        f = float(v)
        return b"%d" % int(f) if f.is_integer() else repr(f).encode()

    n_pages = len(content_refs)
    first_page_obj = len(bodies) + len(links or ()) + 1
    annots_by_page: Dict[int, List[int]] = {}
    for link in links or ():
        page_idx, target = link[0], link[1]
        idn = len(bodies) + 1
        if isinstance(target, str):  # URI action (reference addURI)
            ann = add(
                b"<< /Type /Annot /Subtype /Link /Rect [0 0 100 20]"
                b" /A << /S /URI /URI " + lit_str(idn, target) + b" >> >>"
            )
        else:  # internal GoTo (reference addLink:1061-1145)
            rect = link[2] if len(link) > 2 and link[2] is not None else (0, 0, 100, 20)
            fit = link[3] if len(link) > 3 and link[3] else "/Fit"
            dest_obj = first_page_obj + min(max(int(target), 0), n_pages - 1)
            ann = add(
                b"<< /Type /Annot /Subtype /Link /Rect ["
                + b" ".join(_num(v) for v in rect)
                + b"] /Border [0 0 0] /Dest [%d 0 R " % dest_obj
                + fit.encode("ascii") + b"] >>"
            )
        annots_by_page.setdefault(page_idx, []).append(ann)

    pages_num = len(bodies) + len(content_refs) + 1
    assert len(bodies) + 1 == first_page_obj
    page_refs = []
    for page_idx, cref in enumerate(content_refs):
        extra = b""
        if page_idx in annots_by_page:
            extra = (
                b" /Annots ["
                + b" ".join(b"%d 0 R" % a for a in annots_by_page[page_idx])
                + b"]"
            )
        page_refs.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /Contents %d 0 R" % (pages_num, cref)
                + extra
                + b" >>"
            )
        )
    assert add(
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % p for p in page_refs)
        + b"] /Count %d /Resources " % len(page_refs)
        + res
        + b" /MediaBox [0 0 612 792] >>"
    ) == pages_num

    # bookmark TREE (after pages: items hold /Dest page refs). Items are
    # (title, page_idx) roots or (title, page_idx, parent_idx) children
    # of the item at parent_idx — /First//Last//Prev//Next//Count per
    # PDF 32000 §12.3.3 (parity: addBookmark parent=, _writer.py:768-842
    # via TreeObject.addChild)
    outlines_num = None
    if bookmarks:
        n_bm = len(bookmarks)
        first_bm = len(bodies) + 1
        outlines_num = first_bm + n_bm
        items = []
        for k, bm in enumerate(bookmarks):
            par = bm[2] if len(bm) > 2 else None
            if par is not None and not (0 <= int(par) < n_bm and int(par) != k):
                par = None  # out-of-range / self parent -> root
            items.append((bm[0], bm[1], par))
        if all(par is not None for _t, _p, par in items):
            # parent cycle with no root: force the first item to root
            items[0] = (items[0][0], items[0][1], None)
        children: Dict[int, List[int]] = {}  # parent idx (-1 = root) -> kids
        for k, (_t, _p, par) in enumerate(items):
            children.setdefault(-1 if par is None else int(par), []).append(k)

        def obj_of(k: int) -> int:
            return first_bm + k

        for k, (bm_title, page_idx, par) in enumerate(items):
            idn = len(bodies) + 1
            pg = page_refs[min(max(page_idx, 0), len(page_refs) - 1)]
            sibs = children[-1 if par is None else int(par)]
            pos = sibs.index(k)
            parts = [
                b"<< /Title " + lit_str(idn, bm_title),
                b"/Parent %d 0 R"
                % (outlines_num if par is None else obj_of(int(par))),
                b"/Dest [%d 0 R /Fit]" % pg,
            ]
            if pos > 0:
                parts.append(b"/Prev %d 0 R" % obj_of(sibs[pos - 1]))
            if pos < len(sibs) - 1:
                parts.append(b"/Next %d 0 R" % obj_of(sibs[pos + 1]))
            kids = children.get(k)
            if kids:
                parts.append(
                    b"/First %d 0 R /Last %d 0 R /Count %d"
                    % (obj_of(kids[0]), obj_of(kids[-1]), len(kids))
                )
            add(b" ".join(parts) + b" >>")
        roots = children.get(-1, [])
        assert add(
            b"<< /Type /Outlines /First %d 0 R /Last %d 0 R /Count %d >>"
            % (obj_of(roots[0]), obj_of(roots[-1]), n_bm)
        ) == outlines_num

    # embedded files (parity: addAttachment, _writer.py:280-358):
    # EmbeddedFile stream + /Filespec per attachment, flat name tree
    name_pairs = []
    for att_name, att_data in attachments or ():
        fs_stream = add_stream(b"/Type /EmbeddedFile", bytes(att_data))
        idn = len(bodies) + 1
        name_pairs.append(
            (
                att_name,
                add(
                    b"<< /Type /Filespec /F " + lit_str(idn, att_name)
                    + b" /EF << /F %d 0 R >> >>" % fs_stream
                ),
            )
        )
    # filled text fields (parity: updatePageFormFieldValues,
    # _writer.py:237-259 — the reference mutates /V on existing fields;
    # the span writer EMITS fields with values directly)
    field_refs = []
    for f_name, f_value in form_fields or ():
        idn = len(bodies) + 1
        field_refs.append(
            add(
                b"<< /FT /Tx /T " + lit_str(idn, f_name)
                + b" /V " + lit_str(idn, f_value) + b" /Ff 0 >>"
            )
        )

    # document-open JavaScript action (parity: addJS, _writer.py:237-279
    # — /OpenAction + a /Names//JavaScript name-tree entry)
    js_num = None
    if javascript:
        idn = len(bodies) + 1
        js_num = add(
            b"<< /Type /Action /S /JavaScript /JS "
            + lit_str(idn, javascript) + b" >>"
        )

    # root-resident strings (name-tree keys) encrypt with the ROOT's
    # object key — so all pre-root objects must already be added here
    names_parts: List[bytes] = []
    root_id = len(bodies) + 1
    if name_pairs:
        names_parts.append(
            b"/EmbeddedFiles << /Names ["
            + b" ".join(
                lit_str(root_id, n) + b" %d 0 R" % s for n, s in name_pairs
            )
            + b"] >>"
        )
    if named_dests:
        # name-tree keys must be lexicographically sorted (§7.9.6);
        # values are inline [page /Fit] arrays (parity:
        # addNamedDestination, _writer.py:852-869)
        entries = []
        for nd_name, nd_page in sorted(named_dests, key=lambda t: t[0]):
            pg = page_refs[min(max(int(nd_page), 0), len(page_refs) - 1)]
            entries.append(lit_str(root_id, nd_name) + b" [%d 0 R /Fit]" % pg)
        names_parts.append(b"/Dests << /Names [" + b" ".join(entries) + b"] >>")
    if js_num:
        names_parts.append(
            b"/JavaScript << /Names ["
            + lit_str(root_id, "js0") + b" %d 0 R" % js_num
            + b"] >>"
        )
    names_extra = b""
    if names_parts:
        names_extra = b" /Names << " + b" ".join(names_parts) + b" >>"
    if js_num:
        names_extra += b" /OpenAction %d 0 R" % js_num
    acroform_extra = b""
    if field_refs:
        # /NeedAppearances true — without it, filled /V values render
        # blank in most viewers (parity: set_need_appearances_writer,
        # _writer.py:133-152)
        acroform_extra = (
            b" /AcroForm << /Fields ["
            + b" ".join(b"%d 0 R" % r for r in field_refs)
            + b"] /NeedAppearances true >>"
        )

    root_extra = names_extra + acroform_extra
    if page_layout is not None:
        root_extra += b" /PageLayout " + page_layout.encode("ascii")
    if page_mode is not None:
        root_extra += b" /PageMode " + page_mode.encode("ascii")
    if outlines_num:
        root_extra += b" /Outlines %d 0 R" % outlines_num
    root = add(b"<< /Type /Catalog /Pages %d 0 R" % pages_num + root_extra + b" >>")

    info_num = None
    if title is not None:
        idn = len(bodies) + 1
        info_num = add(
            b"<< /Title " + lit_str(idn, title)
            + b" /Producer " + lit_str(idn, "sparkpdf") + b" >>"
        )

    encrypt_num = None
    if enc_key is not None:
        # the /Encrypt dict itself is never encrypted (PDF 32000 §7.6.2)
        p_entry = b" /P %d >>" % perms
        if encryption == "rc4-40":
            body = (
                b"<< /Filter /Standard /V 1 /R 2"
                b" /O (" + esc_literal(enc_parts["o"]) + b")"
                b" /U (" + esc_literal(enc_parts["u"]) + b")"
                + p_entry
            )
        elif encryption == "rc4-128":
            body = (
                b"<< /Filter /Standard /V 2 /R 3 /Length 128"
                b" /O (" + esc_literal(enc_parts["o"]) + b")"
                b" /U (" + esc_literal(enc_parts["u"]) + b")"
                + p_entry
            )
        elif encryption == "aes-128":
            body = (
                b"<< /Filter /Standard /V 4 /R 4 /Length 128"
                b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
                b" /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
                b" /O (" + esc_literal(enc_parts["o"]) + b")"
                b" /U (" + esc_literal(enc_parts["u"]) + b")"
                + p_entry
            )
        else:  # aes-256, PDF 2.0
            body = (
                b"<< /Filter /Standard /V 5 /R 6 /Length 256"
                b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
                b" /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
                b" /O (" + esc_literal(enc_parts["o"]) + b")"
                b" /U (" + esc_literal(enc_parts["u"]) + b")"
                b" /OE (" + esc_literal(enc_parts["oe"]) + b")"
                b" /UE (" + esc_literal(enc_parts["ue"]) + b")"
                b" /Perms (" + esc_literal(enc_parts["perms"]) + b")"
                + p_entry
            )
        encrypt_num = add(body)

    out = bytearray(HEADER)
    offsets: Dict[int, int] = {}
    for i, body in enumerate(bodies, start=1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    if xref_stream:
        # PDF 1.5 cross-reference STREAM (§7.5.8) — the reference only
        # ever writes classic tables but reads both, as do we (S5).
        # Never encrypted, like the /Encrypt dict itself.
        xref_num = len(bodies) + 1
        xref_pos = len(out)
        rows = bytearray()
        rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        for i in range(1, xref_num):
            rows += bytes([1]) + offsets[i].to_bytes(4, "big") + b"\x00\x00"
        rows += bytes([1]) + xref_pos.to_bytes(4, "big") + b"\x00\x00"
        data = zlib.compress(bytes(rows))
        dct = (
            b"<< /Type /XRef /Size %d /W [1 4 2] /Filter /FlateDecode"
            b" /Length %d /Root %d 0 R" % (xref_num + 1, len(data), root)
        )
        if info_num:
            dct += b" /Info %d 0 R" % info_num
        if encrypt_num:
            dct += b" /Encrypt %d 0 R" % encrypt_num
        fid = (file_id or b"\x00" * 16).hex().encode()
        dct += b" /ID [<%s> <%s>] >>" % (fid, fid)
        out += (
            b"%d 0 obj\n" % xref_num + dct + b"\nstream\n" + data
            + b"\nendstream\nendobj\n"
        )
        out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
        return bytes(out)
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(bodies) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(bodies) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    trailer = b"trailer\n<< /Size %d /Root %d 0 R" % (len(bodies) + 1, root)
    if info_num:
        trailer += b" /Info %d 0 R" % info_num
    if encrypt_num:
        trailer += (
            b" /Encrypt %d 0 R /ID [<%s> <%s>]"
            % (encrypt_num, file_id.hex().encode(), file_id.hex().encode())
        )
    out += trailer + b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)
