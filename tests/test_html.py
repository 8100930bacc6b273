"""HTML main-content extraction (north rule's boilerplate-strip leg)."""

from sparkpdf.kernels.html import extract_main_html, synthesize_html


def test_boilerplate_stripped():
    html = synthesize_html(7, "Real article body with several words here.")
    res = extract_main_html(html)
    assert res["title"] == "doc-7"
    assert res["main_text"] == "Real article body with several words here."
    # nothing from nav/footer/script/style/related leaked
    for leak in ("Home", "About", "Site Name", "tracking", "font",
                 "Read more", "rights reserved"):
        assert leak not in res["main_text"]


def test_link_density_rule():
    # > half anchor text -> dropped; mostly-prose block with a link kept
    navish = '<div><a href="/x">All of this text is links</a> hi</div>'
    prose = ('<p>This paragraph has plenty of real prose and just '
             '<a href="/y">one link</a> inside it.</p>')
    res = extract_main_html("<html><body>" + navish + prose + "</body></html>")
    assert "All of this" not in res["main_text"]
    assert "plenty of real prose" in res["main_text"]
    assert "one link" in res["main_text"]  # anchor TEXT in prose is kept


def test_entities_and_blocks():
    res = extract_main_html(
        "<p>a &amp; b &lt;c&gt;</p><h2>Head</h2><ul><li>x</li><li>y</li></ul>"
    )
    assert res["main_text"] == "a & b <c>\nHead\nx\ny"


def test_nested_boilerplate_and_malformed():
    # unclosed tags, stray </div>, boilerplate nesting: never raises
    res = extract_main_html(
        "<nav><div><p>menu</p></div></nav><p>keep me</p></div><b>tail"
    )
    assert res["main_text"] == "keep me\ntail"
    assert extract_main_html("")["main_text"] == ""
    # bare < and & that form no tag/entity pass through as text
    assert extract_main_html("<<<>>>&&&")["main_text"] == "<<<>>>&&&"


def test_fuzz_never_raises():
    import random

    rng = random.Random(3)
    alphabet = "<>ab/&;# \"='pdiv" + "\x00"
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        out = extract_main_html(s)
        assert isinstance(out["main_text"], str)
