"""AES kernel (FIPS-197) + /AESV2 & /AESV3 security handlers.

The AES core is validated against the PUBLISHED FIPS-197 Appendix C
known-answer vectors (independent ground truth); the PDF handler levels
are validated by write->decrypt round-trips over the full feature
surface. The reference rejects V>3 outright (_security.py), so these
EXCEED it — no parity possible."""

import pytest

from sparkpdf.kernels.aes import (
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    cbc_decrypt,
    cbc_encrypt,
)
from sparkpdf.kernels.cos import PdfError


def test_fips197_appendix_c_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for klen, want in (
        (16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (32, "8ea2b7ca516745bfeafc49904b496089"),
    ):
        key = bytes(range(klen))
        rks = _expand_key(key)
        ct = _encrypt_block(pt, rks)
        assert ct.hex() == want, klen
        assert _decrypt_block(ct, rks) == pt


def test_cbc_roundtrip_and_padding():
    key, iv = bytes(range(16)), bytes(range(16, 32))
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes(range(256))[:n]
        enc = cbc_encrypt(key, iv, data)
        assert len(enc) % 16 == 0 and len(enc) > len(data)  # PKCS#7
        assert cbc_decrypt(key, iv, enc) == data


@pytest.mark.parametrize("mode", ["aes-128", "aes-256"])
def test_pdf_aes_roundtrip_full_surface(mode):
    """Write with AES, decrypt-extract EVERYTHING back: text spans,
    attachments, form fields, bookmarks; wrong password rejected."""
    from sparkpdf.kernels.document import PdfDocument
    from sparkpdf.kernels.extract import doc_text, extract_doc
    from sparkpdf.kernels.write import spans_to_pdf

    pages = [
        [{"kind": "text", "text": "secret one\n", "media_ref": None},
         {"kind": "media_ref", "text": None, "media_ref": "img00"}],
        [{"kind": "text", "text": "page two\n", "media_ref": None}],
    ]
    pdf = spans_to_pdf(
        pages, title="t", bookmarks=[("c", 0)],
        links=[(0, "https://e.org/x")], attachments=[("a.txt", b"att")],
        form_fields=[("f", "v")], user_password=b"pw",
        owner_password=b"own", encryption=mode,
    )
    doc = PdfDocument(pdf, password=b"pw")
    res = extract_doc(pdf, password=b"pw")
    assert res["error"] is None
    assert doc_text(res["spans"]) == "secret one\npage two\n"
    assert doc.attachments()[0]["data"] == b"att"
    assert {f["name"]: f["value"] for f in doc.form_fields()} == {"f": "v"}
    assert [o["title"] for o in doc.outlines()] == ["c"]
    with pytest.raises(PdfError):
        PdfDocument(pdf, password=b"wrong")
    # determinism (pure Spark writer)
    assert pdf == spans_to_pdf(
        pages, title="t", bookmarks=[("c", 0)],
        links=[(0, "https://e.org/x")], attachments=[("a.txt", b"att")],
        form_fields=[("f", "v")], user_password=b"pw",
        owner_password=b"own", encryption=mode,
    )


def test_aes256_owner_password_path():
    from sparkpdf.kernels.document import PdfDocument
    from sparkpdf.kernels.write import spans_to_pdf

    pdf = spans_to_pdf(
        [[{"kind": "text", "text": "x\n", "media_ref": None}]],
        title="t", user_password=b"pw", owner_password=b"own",
        encryption="aes-256",
    )
    # both passwords recover the same file key -> same content
    for password in (b"pw", b"own"):
        doc = PdfDocument(pdf, password=password)
        assert doc.num_pages() == 1


def test_v5_wrong_everything_quarantines():
    """Corrupt /UE: key recovery yields a garbage file key; the doc
    quarantines or salvages empty — never yields the true text and
    never raises uncaught."""
    from sparkpdf.kernels.extract import extract_doc
    from sparkpdf.kernels.write import spans_to_pdf

    pdf = spans_to_pdf(
        [[{"kind": "text", "text": "x\n", "media_ref": None}]],
        title="t", user_password=b"pw", encryption="aes-256",
    )
    i = pdf.index(b"/UE (")
    bad = pdf[: i + 6] + bytes([pdf[i + 6] ^ 0xFF]) + pdf[i + 7:]
    res = extract_doc(bad, password=b"pw")
    # a garbage file key can only yield an error OR salvage-empty
    # output — never the true text, never an uncaught exception
    from sparkpdf.kernels.extract import doc_text

    assert res["error"] is not None or doc_text(res["spans"]) != "x\n"
