"""The correctness gate (BASELINE.json input_hint): span-sequence
equality (kind, text, media_ref, order) against the reference, per
fixture. full_text must equal the reference's extractText byte-for-byte
(media spans excluded — the reference ignores Do/inline images)."""

import pytest

from sparkpdf.kernels import extract_doc, page_text
from sparkpdf.testing.fixtures import ALL, REFERENCE_DIVERGENT
from sparkpdf.testing.reference import reference_extract


@pytest.mark.parametrize("tag", sorted(ALL))
def test_fixture_parity(tag, fixture_pdfs):
    pdf = fixture_pdfs[tag]
    res = extract_doc(pdf)
    assert res["error"] is None, f"{tag}: engine error {res['error']}"
    if tag in REFERENCE_DIVERGENT:
        return  # asserted in test_divergent_fixtures instead
    ref = reference_extract(pdf)
    assert not ref["errors"] or all(
        e is None for e in ref["errors"]
    ), f"{tag}: reference itself failed: {ref['errors']} (classify as divergent?)"
    assert res["n_pages"] == ref["n_pages"], f"{tag}: page count"
    for page_no, ref_text in enumerate(ref["texts"]):
        eng_text = page_text(res["spans"], page_no)
        assert eng_text == ref_text, (
            f"{tag} page {page_no}:\n engine {eng_text!r}\n ref    {ref_text!r}"
        )


def test_span_order_contract(fixture_pdfs):
    """offsets strictly increasing & contiguous per doc; op_idx
    increasing per page; media spans carry no text and vice versa."""
    for tag, pdf in fixture_pdfs.items():
        res = extract_doc(pdf)
        offsets = [s["offset"] for s in res["spans"]]
        assert offsets == list(range(len(offsets))), tag
        for s in res["spans"]:
            if s["kind"] == "text":
                assert s["text"] is not None and s["media_ref"] is None, tag
            else:
                assert s["kind"] == "media_ref", tag
                assert s["media_ref"] is not None and s["text"] is None, tag


def test_media_spans_interleave(fixture_pdfs):
    res = extract_doc(fixture_pdfs["op-media-do"])
    kinds = [(s["kind"], s["media_ref"]) for s in res["spans"]]
    assert kinds == [
        ("text", None),
        ("media_ref", "Im0"),
        ("text", None),
    ]
    res = extract_doc(fixture_pdfs["op-inline-image"])
    kinds = [(s["kind"], s["media_ref"]) for s in res["spans"]]
    assert kinds == [
        ("text", None),
        ("media_ref", "__inline__"),
        ("text", None),
    ]


def test_divergent_fixtures(fixture_pdfs):
    """enc-differences: the reference's dict-decode path is dead code
    (undefined var `encodng`, toUnicode.py:763) and yields '?' for every
    byte; the engine implements the intended table lookup."""
    res = extract_doc(fixture_pdfs["enc-differences"])
    eng = page_text(res["spans"], 0)
    # /Differences: 65->alpha 66->beta 67->gamma, 97->adieresis 98->emdash
    # 99->euro; all other bytes (spaces, X, Y) have no table entry -> "?"
    assert eng == "αβγ?ä—€???\n"
    ref = reference_extract(fixture_pdfs["enc-differences"])
    assert ref["texts"][0] is None or set(ref["texts"][0].rstrip("\n")) <= {"?"}
    # enc-type3: reference gets encoding=None and crashes on the assert
    # (_page.py:808); engine falls back to StandardEncoding
    res3 = extract_doc(fixture_pdfs["enc-type3"])
    assert page_text(res3["spans"], 0) == "type3\xa0text\n"
    ref3 = reference_extract(fixture_pdfs["enc-type3"])
    assert ref3["texts"][0] is None and "AssertionError" in (
        ref3["errors"][0] or ""
    )


def test_encrypted_docs(fixture_pdfs):
    for tag in ("encrypt-rc4-40", "encrypt-rc4-128"):
        res = extract_doc(fixture_pdfs[tag])
        assert res["error"] is None, f"{tag}: {res['error']}"
        # StandardEncoding maps space -> NBSP (reference table parity)
        assert page_text(res["spans"], 0) == "secret\xa0rc4\xa0text\n", tag
