"""Per-document object graph navigation — SURVEY.md §2.1 (S8-S11) + §2.13.

A `PdfDocument` wraps one document's bytes: xref bootstrap, cached object
resolution (including /ObjStm-packed objects), page-tree flattening with
attribute inheritance, and metadata projection. This object lives ONLY
inside a vectorized-UDF invocation (SURVEY §1.3) — nothing graph-shaped
crosses the DataFrame boundary.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

from .cos import Name, PdfError, Ref, StreamObj, parse_object, skip_ws
from .xref import _OBJ_HEADER, XRef, read_xref, rebuild_xref

# attributes pages inherit from ancestor /Pages nodes
# (parity: _reader.py:696-701)
_INHERITABLE = ("/Resources", "/MediaBox", "/CropBox", "/Rotate")


class PdfDocument:
    def __init__(self, data: bytes, password: bytes = b""):
        if not isinstance(data, (bytes, bytearray)):
            raise PdfError("PdfDocument wants bytes")
        self.buf = bytes(data)
        self.xref: XRef = read_xref(self.buf)
        # memo table, parity: resolvedObjects cache (_reader.py:895-907)
        self._cache: Dict[int, Any] = {}
        self._objstm_cache: Dict[int, List[Tuple[int, Any]]] = {}
        self._pages: Optional[List[dict]] = None
        self._decryptor = None
        enc = self.xref.trailer.get("/Encrypt")
        if enc is not None:
            from . import crypto

            enc_dict = self.resolve(enc)
            ids = self.xref.trailer.get("/ID") or [b"", b""]
            first_id = ids[0] if isinstance(ids, list) and ids else b""
            if isinstance(first_id, str):
                first_id = first_id.encode("latin-1", "replace")
            self._decryptor = crypto.StandardDecryptor(enc_dict, first_id, password)
            if isinstance(enc, Ref):
                self._cache[enc.idnum] = enc_dict  # never re-decrypt /Encrypt

    # -- object resolution ----------------------------------------------------

    def resolve(self, obj):
        """Follow a Ref (one hop); non-refs pass through."""
        while isinstance(obj, Ref):
            obj = self.get_object(obj.idnum, obj.gen)
        return obj

    def get_object(self, idnum: int, gen: int = 0):
        if idnum in self._cache:
            return self._cache[idnum]
        off = self.xref.offsets.get(idnum)
        if off is not None:
            obj = self._parse_at(idnum, off)
        elif idnum in self.xref.in_objstm:
            stm_num, idx = self.xref.in_objstm[idnum]
            obj = self._from_object_stream(idnum, stm_num, idx)
        elif not self.xref.rebuilt:
            rebuild_xref(self.buf, self.xref)
            self._cache.pop(idnum, None)
            return self.get_object(idnum, gen)
        else:
            return None  # unresolvable ref -> null (tolerant)
        self._cache[idnum] = obj
        return obj

    def _parse_at(self, idnum: int, off: int):
        pos = skip_ws(self.buf, off)
        m = _OBJ_HEADER.match(self.buf, pos)
        if not m or int(m.group(1)) != idnum:
            # stale/off xref entry: rebuild once, then retry
            if not self.xref.rebuilt:
                rebuild_xref(self.buf, self.xref)
                off2 = self.xref.offsets.get(idnum)
                if off2 is not None and off2 != off:
                    return self._parse_at(idnum, off2)
            raise PdfError(f"object {idnum} not at offset {off}")
        gen = int(m.group(2))
        obj, _ = parse_object(self.buf, skip_ws(self.buf, m.end()), self.resolve)
        if self._decryptor is not None:
            obj = self._decryptor.decrypt_object(obj, idnum, gen)
        return obj

    def _from_object_stream(self, idnum: int, stm_num: int, idx: int):
        """Objects packed in /ObjStm: decode once, slice per member
        (parity: _getObjectFromStream, _reader.py:734-778)."""
        members = self._objstm_cache.get(stm_num)
        if members is None:
            stm = self.resolve(Ref(stm_num, 0))
            if not isinstance(stm, StreamObj):
                raise PdfError(f"/ObjStm {stm_num} is not a stream")
            data = stm.get_data(self.resolve)
            n = int(self.resolve(stm.sdict.get("/N", 0)))
            first = int(self.resolve(stm.sdict.get("/First", 0)))
            pairs = []
            pos = 0
            for _ in range(n):
                onum, pos = _read_int(data, pos)
                ooff, pos = _read_int(data, pos)
                pairs.append((onum, ooff))
            members = []
            for onum, ooff in pairs:
                try:
                    obj, _ = parse_object(data, first + ooff, self.resolve)
                except PdfError:
                    obj = None
                members.append((onum, obj))
            self._objstm_cache[stm_num] = members
        if idx < len(members) and members[idx][0] == idnum:
            return members[idx][1]
        for onum, obj in members:  # tolerant: index off, match by number
            if onum == idnum:
                return obj
        raise PdfError(f"object {idnum} not found in /ObjStm {stm_num}")

    # -- catalog / metadata ---------------------------------------------------

    @property
    def root(self) -> dict:
        r = self.resolve(self.xref.trailer.get("/Root"))
        if not isinstance(r, dict):
            raise PdfError("no /Root catalog")
        return r

    def doc_info(self) -> Optional[dict]:
        """DocInfo dictionary with values resolved
        (parity: getDocumentInfo, _reader.py:244-260)."""
        info = self.resolve(self.xref.trailer.get("/Info"))
        if not isinstance(info, dict):
            return None
        return {k: self.resolve(v) for k, v in info.items()}

    # -- page tree ------------------------------------------------------------

    def pages(self) -> List[dict]:
        """Flattened page list with inherited attributes pushed down
        (parity: _flatten, _reader.py:695-732 — iterative, not recursive)."""
        if self._pages is not None:
            return self._pages
        pages: List[dict] = []
        top = self.resolve(self.root.get("/Pages"))
        if not isinstance(top, dict):
            self._pages = []
            return self._pages
        # stack of (node_ref_or_dict, inherited) — DFS preserving /Kids order
        stack: List[Tuple[Any, dict]] = [(top, {})]
        seen: set = set()
        while stack:
            node, inherited = stack.pop()
            if isinstance(node, Ref):
                if node.idnum in seen:
                    continue  # cycle guard
                seen.add(node.idnum)
                node = self.resolve(node)
            if not isinstance(node, dict):
                continue
            ntype = node.get("/Type")
            if ntype == "/Page" or ("/Kids" not in node and ntype != "/Pages"):
                page = dict(inherited)
                page.update(node)
                pages.append(page)
            else:
                inh = dict(inherited)
                for attr in _INHERITABLE:
                    if attr in node:
                        inh[attr] = node[attr]
                kids = self.resolve(node.get("/Kids")) or []
                for kid in reversed(kids):
                    stack.append((kid, inh))
        self._pages = pages
        return pages

    def num_pages(self) -> int:
        return len(self.pages())

    def page_contents(self, page: dict) -> bytes:
        """Concatenated, decoded content bytes for one page
        (parity: ContentStream.__init__ concat, generic.py:1173-1187)."""
        contents = self.resolve(page.get("/Contents"))
        if contents is None:
            return b""
        if isinstance(contents, StreamObj):
            return contents.get_data(self.resolve)
        if isinstance(contents, list):
            parts = []
            for part in contents:
                part = self.resolve(part)
                if isinstance(part, StreamObj):
                    parts.append(part.get_data(self.resolve))
            return b"".join(parts)
        return b""


def _read_int(data: bytes, pos: int) -> Tuple[int, int]:
    m = re.compile(rb"[\x00\t\n\x0c\r ]*(\d+)").match(data, pos)
    if not m:
        raise PdfError("bad /ObjStm header pairs")
    return int(m.group(1)), m.end()
