"""Sitemap XML parsing (role of reference sitemap.rs): urlset + sitemapindex."""

from __future__ import annotations

from dataclasses import dataclass

import lxml.etree


@dataclass
class SitemapEntry:
    url: str
    lastmod: str = ""
    is_sitemap: bool = False  # nested sitemap index entry


def parse_sitemap(content: str | bytes) -> list[SitemapEntry]:
    if isinstance(content, str):
        content = content.encode("utf-8", errors="replace")
    parser = lxml.etree.XMLParser(recover=True, resolve_entities=False, no_network=True)
    try:
        root = lxml.etree.fromstring(content, parser=parser)
    except (lxml.etree.XMLSyntaxError, ValueError):
        return []
    if root is None:
        return []

    def local(t):
        return t.rsplit("}", 1)[-1].lower() if isinstance(t, str) else ""

    is_index = local(root.tag) == "sitemapindex"
    out = []
    for el in root:
        if local(el.tag) not in ("url", "sitemap"):
            continue
        loc, lastmod = "", ""
        for f in el:
            if local(f.tag) == "loc":
                loc = "".join(f.itertext()).strip()
            elif local(f.tag) == "lastmod":
                lastmod = "".join(f.itertext()).strip()
        if loc:
            out.append(SitemapEntry(loc, lastmod, is_sitemap=is_index))
    return out
