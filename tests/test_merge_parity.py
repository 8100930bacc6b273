"""Merge/split parity (SURVEY §2.7 U1, §2.13 D4/D5): the engine's
span-level union must agree with what the reference's PdfFileMerger
physically produces."""

import io

from sparkpdf.kernels import extract_doc, page_text
from sparkpdf.testing.fixtures import op_tj, op_tstar, pagetree_deep
from sparkpdf.testing.reference import load_reference


def _ref_merge(*pdfs: bytes) -> bytes:
    ref = load_reference()
    merger = ref.PdfFileMerger(strict=False)
    for p in pdfs:
        merger.append(io.BytesIO(p))
    out = io.BytesIO()
    merger.write(out)
    return out.getvalue()


def _engine_pages(pdf: bytes):
    res = extract_doc(pdf)
    assert res["error"] is None
    return [page_text(res["spans"], p) for p in range(res["n_pages"])]


def test_merge_is_ordered_page_union():
    a, b = op_tj(), pagetree_deep()
    merged = _ref_merge(a, b)
    # the engine must parse the REFERENCE-WRITTEN merged file...
    merged_pages = _engine_pages(merged)
    # ...and its page texts must equal pages(a) ++ pages(b)
    assert merged_pages == _engine_pages(a) + _engine_pages(b)


def test_merge_three_way():
    a, b, c = op_tj(), op_tstar(), op_tj()
    merged = _ref_merge(a, b, c)
    assert _engine_pages(merged) == (
        _engine_pages(a) + _engine_pages(b) + _engine_pages(c)
    )


def test_split_then_merge_roundtrip():
    """split(merge(a,b)) pages == individual pages, via the reference
    writer's single-page extraction (PdfFileWriter.addPage)."""
    ref = load_reference()
    a, b = op_tj(), op_tstar()
    merged = _ref_merge(a, b)
    rd = ref.PdfFileReader(io.BytesIO(merged), strict=False)
    singles = []
    for i in range(rd.getNumPages()):
        w = ref.PdfFileWriter()
        w.addPage(rd.getPage(i))
        buf = io.BytesIO()
        w.write(buf)
        singles.append(buf.getvalue())
    all_pages = _engine_pages(a) + _engine_pages(b)
    for i, single in enumerate(singles):
        pages = _engine_pages(single)
        assert pages == [all_pages[i]]


def test_engine_reads_reference_encrypted():
    """The reference WRITER encrypts (RC4, _writer.py:443-496); the
    engine must decrypt and extract its output — crypto interop in the
    direction the fixtures don't cover."""
    ref = load_reference()
    src = op_tj()
    rd = ref.PdfFileReader(io.BytesIO(src), strict=False)
    for user_pwd in ("", "s3cret"):
        w = ref.PdfFileWriter()
        w.addPage(rd.getPage(0))
        w.encrypt(user_pwd, use_128bit=True)
        buf = io.BytesIO()
        w.write(buf)
        res = extract_doc(buf.getvalue(), password=user_pwd.encode())
        assert res["error"] is None, res["error"]
        assert page_text(res["spans"], 0) == "one\ntwo\n"
