"""XMP (RDF/XML) metadata projection — SURVEY.md §2.3 P7.

Fresh ElementTree-based parser with the reference's property surface
(/root/reference/xmp.py:57-397): bag/seq/alt container shapes, simple
attribute-or-element values, and ISO-8601 date conversion
(xmp.py:102-125). Values come back as plain Python (lists / dict /
datetime) ready for a Spark struct.
"""

from __future__ import annotations

import datetime
import re
import xml.etree.ElementTree as ET
from typing import Any, Dict, List, Optional

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
DC_NS = "http://purl.org/dc/elements/1.1/"
XMP_NS = "http://ns.adobe.com/xap/1.0/"
PDF_NS = "http://ns.adobe.com/pdf/1.3/"
XMPMM_NS = "http://ns.adobe.com/xap/1.0/mm/"
# the undocumented "custom metadata" key/value schema; element names
# encode arbitrary keys by replacing each invalid XML identifier char
# with U+2182 + the 4-hex-digit code of the original char (reference
# xmp.py:15-35, 368-390)
PDFX_NS = "http://ns.adobe.com/pdfx/1.3/"

_ISO = re.compile(
    r"(\d{4})(?:-(\d{2})(?:-(\d{2})(?:T(\d{2}):(\d{2})"
    r"(?::(\d{2}(?:\.\d+)?))?(Z|[+-]\d{2}:\d{2})?)?)?)?"
)


def parse_iso8601(value: str) -> datetime.datetime:
    """Tolerant ISO-8601 (parity: xmp.py:102-125 semantics: partial
    dates fill with defaults; timezone kept as offset-aware when given)."""
    m = _ISO.match(value.strip())
    if not m:
        raise ValueError(f"bad ISO-8601 date {value!r}")
    year, month, day, hour, minute, sec, tz = m.groups()
    seconds = float(sec) if sec else 0.0
    tzinfo = None
    if tz == "Z":
        tzinfo = datetime.timezone.utc
    elif tz:
        sign = 1 if tz[0] == "+" else -1
        hh, mm = int(tz[1:3]), int(tz[4:6])
        tzinfo = datetime.timezone(sign * datetime.timedelta(hours=hh, minutes=mm))
    return datetime.datetime(
        int(year), int(month or 1), int(day or 1),
        int(hour or 0), int(minute or 0), int(seconds),
        int((seconds % 1) * 1e6), tzinfo,
    )


class XmpInfo:
    def __init__(self, xml_bytes: bytes):
        self.root = ET.fromstring(xml_bytes)

    def _descriptions(self):
        yield from self.root.iter(f"{{{RDF_NS}}}Description")

    def _values(self, ns: str, name: str) -> List[ET.Element]:
        out = []
        for desc in self._descriptions():
            el = desc.find(f"{{{ns}}}{name}")
            if el is not None:
                out.append(el)
        return out

    def _container_items(self, ns: str, name: str, shape: str) -> List[str]:
        items: List[str] = []
        for el in self._values(ns, name):
            cont = el.find(f"{{{RDF_NS}}}{shape}")
            if cont is None:
                if el.text and el.text.strip():
                    items.append(el.text.strip())
                continue
            for li in cont.findall(f"{{{RDF_NS}}}li"):
                items.append((li.text or "").strip())
        return items

    def single(self, ns: str, name: str) -> Optional[str]:
        for el in self._values(ns, name):
            if el.text and el.text.strip():
                return el.text.strip()
        # attribute form: <rdf:Description pdf:Producer="...">
        for desc in self._descriptions():
            v = desc.get(f"{{{ns}}}{name}")
            if v is not None:
                return v
        return None

    def bag(self, ns: str, name: str) -> List[str]:
        return self._container_items(ns, name, "Bag")

    def seq(self, ns: str, name: str) -> List[str]:
        return self._container_items(ns, name, "Seq")

    def langalt(self, ns: str, name: str) -> Dict[str, str]:
        out: Dict[str, str] = {}
        for el in self._values(ns, name):
            alt = el.find(f"{{{RDF_NS}}}Alt")
            if alt is None:
                continue
            for li in alt.findall(f"{{{RDF_NS}}}li"):
                lang = li.get("{http://www.w3.org/XML/1998/namespace}lang", "x-default")
                out[lang] = (li.text or "").strip()
        return out

    def _date(self, ns: str, name: str) -> Optional[datetime.datetime]:
        v = self.single(ns, name)
        return parse_iso8601(v) if v else None

    # -- the reference's property surface (xmp.py:212-361: same names,
    # snake_cased; container shape per property matches theirs) ----------------

    @property
    def dc_contributor(self) -> List[str]:
        return self.bag(DC_NS, "contributor")

    @property
    def dc_coverage(self) -> Optional[str]:
        return self.single(DC_NS, "coverage")

    @property
    def dc_creator(self) -> List[str]:
        return self.seq(DC_NS, "creator")

    @property
    def dc_date(self) -> List[datetime.datetime]:
        return [parse_iso8601(v) for v in self.seq(DC_NS, "date")]

    @property
    def dc_description(self) -> Dict[str, str]:
        return self.langalt(DC_NS, "description")

    @property
    def dc_format(self) -> Optional[str]:
        return self.single(DC_NS, "format")

    @property
    def dc_identifier(self) -> Optional[str]:
        return self.single(DC_NS, "identifier")

    @property
    def dc_language(self) -> List[str]:
        return self.bag(DC_NS, "language")

    @property
    def dc_publisher(self) -> List[str]:
        return self.bag(DC_NS, "publisher")

    @property
    def dc_relation(self) -> List[str]:
        return self.bag(DC_NS, "relation")

    @property
    def dc_rights(self) -> Dict[str, str]:
        return self.langalt(DC_NS, "rights")

    @property
    def dc_source(self) -> Optional[str]:
        return self.single(DC_NS, "source")

    @property
    def dc_subject(self) -> List[str]:
        return self.bag(DC_NS, "subject")

    @property
    def dc_title(self) -> Dict[str, str]:
        return self.langalt(DC_NS, "title")

    @property
    def dc_type(self) -> List[str]:
        return self.bag(DC_NS, "type")

    @property
    def pdf_keywords(self) -> Optional[str]:
        return self.single(PDF_NS, "Keywords")

    @property
    def pdf_pdfversion(self) -> Optional[str]:
        return self.single(PDF_NS, "PDFVersion")

    @property
    def pdf_producer(self) -> Optional[str]:
        return self.single(PDF_NS, "Producer")

    @property
    def xmp_create_date(self) -> Optional[datetime.datetime]:
        return self._date(XMP_NS, "CreateDate")

    @property
    def xmp_modify_date(self) -> Optional[datetime.datetime]:
        return self._date(XMP_NS, "ModifyDate")

    @property
    def xmp_metadata_date(self) -> Optional[datetime.datetime]:
        return self._date(XMP_NS, "MetadataDate")

    @property
    def xmp_creator_tool(self) -> Optional[str]:
        return self.single(XMP_NS, "CreatorTool")

    @property
    def xmpmm_document_id(self) -> Optional[str]:
        return self.single(XMPMM_NS, "DocumentID")

    @property
    def xmpmm_instance_id(self) -> Optional[str]:
        return self.single(XMPMM_NS, "InstanceID")

    @property
    def custom_properties(self) -> Dict[str, str]:
        """pdfx key/value pairs with the U+2182-escaped key decoded
        (parity: xmp.py:368-390); both attribute and element forms."""
        out: Dict[str, str] = {}
        for desc in self._descriptions():
            for attr, v in desc.attrib.items():
                if attr.startswith(f"{{{PDFX_NS}}}"):
                    out[_unescape_pdfx(attr.split("}", 1)[1])] = v
            for el in desc:
                if el.tag.startswith(f"{{{PDFX_NS}}}"):
                    out[_unescape_pdfx(el.tag.split("}", 1)[1])] = (
                        el.text or ""
                    )
        return out

    def as_dict(self) -> Dict[str, Any]:
        return {
            "title": self.dc_title.get("x-default"),
            "creators": self.dc_creator,
            "subjects": self.dc_subject,
            "description": self.dc_description.get("x-default"),
            "contributors": self.dc_contributor,
            "coverage": self.dc_coverage,
            "dates": self.dc_date,
            "format": self.dc_format,
            "identifier": self.dc_identifier,
            "languages": self.dc_language,
            "publishers": self.dc_publisher,
            "relations": self.dc_relation,
            "rights": self.dc_rights.get("x-default"),
            "source": self.dc_source,
            "types": self.dc_type,
            "keywords": self.pdf_keywords,
            "pdfversion": self.pdf_pdfversion,
            "producer": self.pdf_producer,
            "create_date": self.xmp_create_date,
            "modify_date": self.xmp_modify_date,
            "metadata_date": self.xmp_metadata_date,
            "creator_tool": self.xmp_creator_tool,
            "document_id": self.xmpmm_document_id,
            "instance_id": self.xmpmm_instance_id,
            "custom": self.custom_properties,
        }


def _unescape_pdfx(key: str) -> str:
    """Decode a pdfx element name back to the original key: each
    U+2182 + XXXX hex quad becomes chr(0xXXXX)."""
    while True:
        idx = key.find("ↂ")
        if idx == -1:
            return key
        key = key[:idx] + chr(int(key[idx + 1 : idx + 5], 16)) + key[idx + 5 :]


def doc_xmp(doc) -> Optional[XmpInfo]:
    """PdfDocument -> XmpInfo from the catalog's /Metadata stream
    (parity: getXmpMetadata, _reader.py:270-292)."""
    from .cos import StreamObj

    meta = doc.resolve(doc.root.get("/Metadata"))
    if not isinstance(meta, StreamObj):
        return None
    try:
        return XmpInfo(meta.get_data(doc.resolve))
    except ET.ParseError:
        return None
