"""Write-side round-trips (SURVEY §2.2): extract(write(spans)) == spans
and the REFERENCE can read engine-written PDFs."""

import io

import pytest

from sparkpdf.kernels import extract_doc, page_text
from sparkpdf.kernels.write import spans_to_pdf
from sparkpdf.testing.fixtures import ALL
from sparkpdf.testing.reference import load_reference


def _pages_of(res):
    pages = {}
    for s in res["spans"]:
        pages.setdefault(s["page_no"], []).append(s)
    return [pages[p] for p in sorted(pages)] or [[]]


@pytest.mark.parametrize("tag", sorted(ALL))
def test_roundtrip_fixture(tag, fixture_pdfs):
    orig = extract_doc(fixture_pdfs[tag])
    assert orig["error"] is None
    written = spans_to_pdf(_pages_of(orig))
    again = extract_doc(written)
    assert again["error"] is None, f"{tag}: {again['error']}"
    key = lambda r: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
    assert key(again) == key(orig), tag
    # offsets stay the contiguous 0..n-1 contract
    assert [s["offset"] for s in again["spans"]] == list(
        range(len(again["spans"]))
    )


@pytest.mark.parametrize("tag", sorted(ALL))
def test_reference_reads_written(tag, fixture_pdfs):
    """The reference's own extractText on an engine-written file must
    equal the engine's text — interoperability, not just self-parity."""
    orig = extract_doc(fixture_pdfs[tag])
    written = spans_to_pdf(_pages_of(orig))
    ref = load_reference()
    rd = ref.PdfFileReader(io.BytesIO(written), strict=False)
    assert rd.getNumPages() == orig["n_pages"] or orig["n_pages"] == 0
    for p in range(rd.getNumPages()):
        assert rd.getPage(p).extractText() == page_text(
            extract_doc(written)["spans"], p
        )


def test_unicode_fidelity():
    spans = [
        {"kind": "text", "text": "CJK 你好 + emoji 🚀 + ascii\n", "media_ref": None},
        {"kind": "media_ref", "text": None, "media_ref": "imgX"},
        {"kind": "text", "text": "\nquoted-continuation ünïcode", "media_ref": None},
        {"kind": "text", "text": "\n", "media_ref": None},
    ]
    pdf = spans_to_pdf([spans])
    res = extract_doc(pdf)
    assert res["error"] is None
    got = [(s["kind"], s["text"], s["media_ref"]) for s in res["spans"]]
    assert got == [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    # and the reference agrees on the text
    ref = load_reference()
    rd = ref.PdfFileReader(io.BytesIO(pdf), strict=False)
    assert rd.getPage(0).extractText() == page_text(res["spans"], 0)
