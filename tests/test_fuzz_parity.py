"""Randomized whole-document parity: hypothesis composes PDFs from
random feature combinations (xref style, filters, fonts, page counts,
string forms, kerning arrays) and the engine must match the reference's
extractText byte-for-byte on every one — generalizing the fixed
46-fixture matrix to the cartesian feature space."""

import io

from hypothesis import given, settings, strategies as st

from sparkpdf.kernels import extract_doc, page_text
from sparkpdf.testing import pdfgen
from sparkpdf.testing.reference import load_reference

_words = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC 0123()%\\éü",
    min_size=0,
    max_size=24,
)

_fonts = st.sampled_from(
    [pdfgen.FONT_STD, pdfgen.FONT_WINANSI, pdfgen.FONT_MACROMAN, pdfgen.FONT_SYMBOL]
)
_filters = st.sampled_from(
    [
        (),
        ("FlateDecode",),
        ("FlatePred12",),
        ("LZWDecode",),
        ("ASCIIHexDecode",),
        ("ASCII85Decode",),
        ("ASCII85Decode", "FlateDecode"),
    ]
)
_xref = st.sampled_from(["table", "stream"])


@st.composite
def _random_page(draw):
    ops = [b"BT /F1 12 Tf"]
    for _ in range(draw(st.integers(min_value=0, max_value=6))):
        kind = draw(st.sampled_from(["Tj", "TJ", "T*", "'", "hex"]))
        if kind == "Tj":
            ops.append(b"(" + pdfgen.esc_string(draw(_words)) + b") Tj")
        elif kind == "'":
            ops.append(b"(" + pdfgen.esc_string(draw(_words)) + b") '")
        elif kind == "T*":
            ops.append(b"T*")
        elif kind == "hex":
            raw = draw(st.binary(min_size=0, max_size=8))
            ops.append(b"<" + raw.hex().encode() + b"> Tj")
        else:
            els = []
            for _ in range(draw(st.integers(min_value=0, max_value=3))):
                if draw(st.booleans()):
                    els.append(b"(" + pdfgen.esc_string(draw(_words)) + b")")
                else:
                    els.append(b"%d" % draw(st.integers(-200, 200)))
            ops.append(b"[" + b" ".join(els) + b"] TJ")
    ops.append(b"ET")
    return b" ".join(ops)


@given(
    pages=st.lists(_random_page(), min_size=1, max_size=4),
    font=_fonts,
    filters=_filters,
    xref_style=_xref,
    startxref_delta=st.sampled_from([0, 0, 0, 3]),
)
@settings(max_examples=120, deadline=None)
def test_random_pdf_parity(pages, font, filters, xref_style, startxref_delta):
    kwargs = {}
    if xref_style == "table" and startxref_delta:
        kwargs["startxref_delta"] = startxref_delta
    pdf = pdfgen.simple_pdf(
        pages,
        fonts={b"/F1": font},
        content_filters=list(filters),
        xref_style=xref_style,
        **kwargs,
    )
    res = extract_doc(pdf)
    assert res["error"] is None
    ref = load_reference()
    rd = ref.PdfFileReader(io.BytesIO(pdf), strict=False)
    assert rd.getNumPages() == res["n_pages"] == len(pages)
    for p in range(len(pages)):
        assert rd.getPage(p).extractText() == page_text(res["spans"], p)
    # write round-trip on the same random doc: spans -> PDF -> spans
    from sparkpdf.kernels.write import spans_to_pdf

    by_page = {}
    for s in res["spans"]:
        by_page.setdefault(s["page_no"], []).append(s)
    again = extract_doc(spans_to_pdf([by_page[p] for p in sorted(by_page)] or [[]]))
    assert again["error"] is None
    key = lambda r: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
    assert key(again) == key(res)


@given(st.binary(min_size=0, max_size=2048))
@settings(max_examples=150, deadline=None)
def test_never_crashes_on_garbage(data):
    """extract_doc must QUARANTINE, never raise — a poisoned doc at
    10^12 scale must not kill its partition (SURVEY §4.1)."""
    res = extract_doc(data)
    assert isinstance(res["spans"], list)
    assert res["error"] is None or isinstance(res["error"], str)


@st.composite
def _mutated_pdf(draw):
    from sparkpdf.testing.fixtures import ALL

    tag = draw(st.sampled_from(sorted(ALL)))
    pdf = bytearray(ALL[tag]())
    mode = draw(st.sampled_from(["truncate", "flip", "splice", "zero"]))
    if mode == "truncate":
        cut = draw(st.integers(min_value=0, max_value=len(pdf)))
        pdf = pdf[:cut]
    elif mode == "flip":
        for _ in range(draw(st.integers(min_value=1, max_value=8))):
            i = draw(st.integers(min_value=0, max_value=max(len(pdf) - 1, 0)))
            pdf[i] ^= draw(st.integers(min_value=1, max_value=255))
    elif mode == "splice":
        i = draw(st.integers(min_value=0, max_value=max(len(pdf) - 1, 0)))
        pdf[i:i] = draw(st.binary(min_size=1, max_size=64))
    else:
        i = draw(st.integers(min_value=0, max_value=max(len(pdf) - 1, 0)))
        j = min(len(pdf), i + draw(st.integers(min_value=1, max_value=64)))
        pdf[i:j] = b"\x00" * (j - i)
    return bytes(pdf)


@given(_mutated_pdf())
@settings(max_examples=200, deadline=None)
def test_never_crashes_on_corrupted_pdfs(pdf):
    """Mutated real PDFs (truncation, bit flips, splices, zero runs):
    quarantine or recover, never raise."""
    res = extract_doc(pdf)
    assert isinstance(res["spans"], list)
    for s in res["spans"]:
        assert s["kind"] in ("text", "media_ref")
