"""HTML main-content extraction — the north rule's 'HTML boilerplate
strip / DOM heuristics' leg (the PDF leg is kernels/extract.py).

Readability-style heuristics on a stdlib html.parser DOM walk, no
third-party dependency:

  * tag blacklist: script/style/noscript/template contents dropped
    outright; nav/header/footer/aside/form subtrees are boilerplate
  * link-density rule: a block whose anchor text is more than half of
    its text is navigation-shaped -> dropped
  * block assembly: block-level boundaries emit newlines; inline text
    concatenates; entities unescaped; whitespace collapsed per block

Deterministic and pure — safe inside a vectorized batch kernel at
10^12 docs. The quarantine discipline matches extraction: the operator
layer catches everything and emits NULL main_text for poison inputs.
"""

from __future__ import annotations

import html as _htmlmod
from html.parser import HTMLParser
from typing import List, Optional, Tuple

_DROP_ENTIRELY = {"script", "style", "noscript", "template"}
_BOILERPLATE = {"nav", "header", "footer", "aside", "form"}
_BLOCK = {
    "p", "div", "article", "section", "main", "li", "ul", "ol",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "th",
    "blockquote", "pre", "br",
}


class _MainTextParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.boiler_depth = 0
        self.anchor_depth = 0
        self.title_depth = 0
        self.title_parts: List[str] = []
        # blocks under construction: [(text_parts, anchor_chars)]
        self.blocks: List[Tuple[List[str], int]] = [([], 0)]
        self.done: List[str] = []

    # -- tree state -----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _DROP_ENTIRELY:
            self.drop_depth += 1
        elif tag in _BOILERPLATE:
            self.boiler_depth += 1
        elif tag == "a":
            self.anchor_depth += 1
        elif tag == "title":
            self.title_depth += 1
        if tag in _BLOCK:
            self._flush_block()

    def handle_endtag(self, tag):
        if tag in _DROP_ENTIRELY:
            self.drop_depth = max(0, self.drop_depth - 1)
        elif tag in _BOILERPLATE:
            self.boiler_depth = max(0, self.boiler_depth - 1)
        elif tag == "a":
            self.anchor_depth = max(0, self.anchor_depth - 1)
        elif tag == "title":
            self.title_depth = max(0, self.title_depth - 1)
        if tag in _BLOCK:
            self._flush_block()

    def handle_data(self, data):
        if self.drop_depth or self.boiler_depth:
            return
        if self.title_depth:
            self.title_parts.append(data)
            return
        parts, anchors = self.blocks[-1]
        parts.append(data)
        if self.anchor_depth:
            self.blocks[-1] = (parts, anchors + len(data.strip()))

    # -- block assembly ---------------------------------------------------
    def _flush_block(self):
        parts, anchor_chars = self.blocks.pop()
        text = " ".join("".join(parts).split())
        if text:
            # link-density: navigation-shaped blocks are boilerplate
            if anchor_chars * 2 <= len(text):
                self.done.append(text)
        self.blocks.append(([], 0))

    def result(self) -> Tuple[str, Optional[str]]:
        self._flush_block()
        title = " ".join("".join(self.title_parts).split()) or None
        return "\n".join(self.done), title


def extract_main_html(html_text: str) -> dict:
    """HTML -> {main_text, title}. Never raises on parser-tolerable
    input; the operator layer quarantines anything else."""
    p = _MainTextParser()
    p.feed(html_text or "")
    p.close()
    main_text, title = p.result()
    return {"main_text": main_text, "title": title}


def synthesize_html(doc_id: int, text: str) -> str:
    """Deterministic page around `text` (sanitized like doc_to_pdf):
    real boilerplate (nav with links, header/footer, script/style, a
    link-dense related-articles div) that the extractor must strip,
    leaving exactly the planted paragraphs."""
    printable = "".join(ch if " " <= ch <= "~" else "?" for ch in text)
    body = _htmlmod.escape(printable)
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>doc-{doc_id}</title>"
        "<style>body{font:16px serif}</style>"
        "<script>var tracking='pixel';</script>"
        "</head><body>"
        "<header><h1>Site Name</h1></header>"
        '<nav><a href="/">Home</a> <a href="/about">About</a>'
        ' <a href="/contact">Contact</a></nav>'
        f"<article><p>{body}</p></article>"
        '<div class="related"><a href="/a">Read more stuff here</a>'
        ' <a href="/b">Another related article link</a> also</div>'
        "<footer>(c) 2024 Site Name - all rights reserved</footer>"
        "</body></html>"
    )
