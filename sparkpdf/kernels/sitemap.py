"""sitemap.xml parsing (sitemaps.org protocol) — the discovery leg of
the crawl stack (robots.txt points here; the frontier seeds from it).

Pure Python over the stdlib HTMLParser (tag-tolerant, namespace- and
case-insensitive — real-world sitemaps are messy XML): <urlset>
entries with loc/lastmod/changefreq/priority, <sitemapindex> entries
with loc/lastmod. Never raises; unrecognized documents yield an empty
entry list with kind None.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional


class _SitemapParser(HTMLParser):
    _FIELDS = {"loc", "lastmod", "changefreq", "priority"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.kind: Optional[str] = None
        self.entries: List[dict] = []
        self._entry: Optional[dict] = None
        self._field: Optional[str] = None
        self._parts: List[str] = []

    @staticmethod
    def _local(tag: str) -> str:
        return tag.rsplit(":", 1)[-1]

    def handle_starttag(self, tag, attrs):
        tag = self._local(tag)
        if tag in ("urlset", "sitemapindex") and self.kind is None:
            self.kind = tag
        elif tag in ("url", "sitemap") and self.kind is not None:
            self._entry = {}
        elif tag in self._FIELDS and self._entry is not None:
            self._field = tag
            self._parts = []

    def handle_endtag(self, tag):
        tag = self._local(tag)
        if tag in self._FIELDS and self._field == tag:
            if self._entry is not None:
                self._entry[tag] = "".join(self._parts).strip()
            self._field = None
        elif tag in ("url", "sitemap") and self._entry is not None:
            if self._entry.get("loc"):
                self.entries.append(self._entry)
            self._entry = None

    def handle_data(self, data):
        if self._field is not None:
            self._parts.append(data)


def parse_sitemap(text: str) -> dict:
    """sitemap XML -> {kind: 'urlset'|'sitemapindex'|None, entries:
    [{loc, lastmod?, changefreq?, priority?}]}. Tolerant: namespaced
    tags, mixed case, junk around the document."""
    p = _SitemapParser()
    p.feed(text or "")
    p.close()
    return {"kind": p.kind, "entries": p.entries}


def synthesize_sitemap(doc_id: int) -> str:
    """Deterministic sitemap for doc d (formula oracle): d%5==0 docs
    get a <sitemapindex> with 1 + d%2 child sitemaps; others a
    <urlset> with 1 + d%4 urls at loc
    https://example.com/doc/{d}/{i}, lastmod 2024-01-{1+(d+i)%28},
    priority (d+i)%10/10."""
    d = int(doc_id)
    if d % 5 == 0:
        items = "".join(
            f"<sitemap><loc>https://example.com/sm{d}-{i}.xml</loc>"
            f"<lastmod>2024-02-{1 + (d + i) % 28:02d}</lastmod>"
            "</sitemap>"
            for i in range(1 + d % 2)
        )
        return ('<?xml version="1.0" encoding="UTF-8"?>'
                '<sitemapindex xmlns="http://www.sitemaps.org/'
                f'schemas/sitemap/0.9">{items}</sitemapindex>')
    items = "".join(
        f"<url><loc>https://example.com/doc/{d}/{i}</loc>"
        f"<lastmod>2024-01-{1 + (d + i) % 28:02d}</lastmod>"
        f"<priority>{(d + i) % 10 / 10:.1f}</priority></url>"
        for i in range(1 + d % 4)
    )
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/'
            f'sitemap/0.9">{items}</urlset>')
