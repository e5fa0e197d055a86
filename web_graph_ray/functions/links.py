"""Per-anchor link resolution — the loop body of the reference's
``ScrapeLinksFromURL`` (``pkg/linkprocessor/linkprocessor.go:136-166``):

    href → TrimSpace → url.Parse (silently skip on error)
         → if !IsAbs: base.ResolveReference(link)
         → ScrapeDaTing filter (F1∧F2∧F3)
         → emit (from=page, to=resolved, text=anchor text)

Combined with the extractor this yields one output row per surviving
anchor — the engine's 1→N flat-map shape.
"""

from __future__ import annotations

from dataclasses import dataclass

from .extract import Anchor, extract_html
from .filters import FilterConfig, DEFAULT_FILTERS, scrape_da_ting
from .urlnorm import GoURL, URLError, page_id_from_parts, parse

__all__ = ["ResolvedLink", "RejectedHref", "resolve_anchor", "extract_links", "extract_links_full"]


@dataclass
class ResolvedLink:
    anchor_index: int  # document-order index of the emitting anchor
    to_url: str  # resolved URL string (u.String(); may keep query+fragment)
    to_page_id: str
    to_host: str  # host[:port] (blocklist key)
    to_hostname: str  # port-stripped (bucketing + identity key)
    to_escaped_path: str
    text: str  # anchor text (already UTF-8-sanitized by the extractor)


def resolve_anchor(
    base: GoURL, anchor: Anchor, cfg: FilterConfig = DEFAULT_FILTERS
) -> ResolvedLink | None:
    """Resolve + filter one anchor; None ⇒ silently skipped (as Go does)."""
    href = anchor.href.strip()
    try:
        link = parse(href)
    except URLError:
        return None
    if not link.is_abs():
        link = base.resolve_reference(link)
    if not scrape_da_ting(link, cfg):
        return None
    hostname = link.hostname()
    epath = link.escaped_path()
    return ResolvedLink(
        anchor_index=anchor.index,
        to_url=link.string(),
        to_page_id=page_id_from_parts(hostname, epath),
        to_host=link.host,
        to_hostname=hostname,
        to_escaped_path=epath,
        text=anchor.text,
    )


@dataclass
class RejectedHref:
    """An anchor whose href failed to parse — the extract UDF's rejects
    side output (SURVEY S6: the analogue of the reference's poison-row
    skip at ``pkg/linkstorage/linkstorage.go:434-476``; the Go scraper
    itself drops these silently at ``linkprocessor.go:141-144``)."""

    anchor_index: int
    href: str
    reason: str  # 'unparseable'


def extract_links_full(
    page_url: GoURL, html: bytes | str, cfg: FilterConfig = DEFAULT_FILTERS
) -> tuple[list[ResolvedLink], str, list[RejectedHref]]:
    """Full E1 transform for one page: (surviving links, document text,
    rejected hrefs).  Filter drops (F1–F3) are semantic, not rejects;
    only parse failures are surfaced."""
    result = extract_html(html)
    links: list[ResolvedLink] = []
    rejects: list[RejectedHref] = []
    for anchor in result.anchors:
        href = anchor.href.strip()
        try:
            link = parse(href)
        except URLError:
            rejects.append(RejectedHref(anchor.index, href, "unparseable"))
            continue
        if not link.is_abs():
            link = page_url.resolve_reference(link)
        if not scrape_da_ting(link, cfg):
            continue
        hostname = link.hostname()
        epath = link.escaped_path()
        links.append(
            ResolvedLink(
                anchor_index=anchor.index,
                to_url=link.string(),
                to_page_id=page_id_from_parts(hostname, epath),
                to_host=link.host,
                to_hostname=hostname,
                to_escaped_path=epath,
                text=anchor.text,
            )
        )
    return links, result.doc_text, rejects


def extract_links(
    page_url: GoURL, html: bytes | str, cfg: FilterConfig = DEFAULT_FILTERS
) -> tuple[list[ResolvedLink], str]:
    """E1 without the rejects channel (reference-identical silent skip)."""
    links, doc_text, _ = extract_links_full(page_url, html, cfg)
    return links, doc_text
