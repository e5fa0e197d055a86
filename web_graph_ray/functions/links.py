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

__all__ = ["ResolvedLink", "resolve_anchor", "extract_links"]


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


def extract_links(
    page_url: GoURL, html: bytes | str, cfg: FilterConfig = DEFAULT_FILTERS
) -> tuple[list[ResolvedLink], str]:
    """Full E1 transform for one page: (surviving links, document text)."""
    result = extract_html(html)
    links = []
    for anchor in result.anchors:
        resolved = resolve_anchor(page_url, anchor, cfg)
        if resolved is not None:
            links.append(resolved)
    return links, result.doc_text
