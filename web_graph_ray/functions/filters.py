"""URL admission filters + content-type gate.

Semantics mirror the reference's ``pkg/linkutils/linkutils.go``:

- F1 scheme filter: accept only http/https (``linkutils.go:17-21,30-33``)
- F2 host blocklist: exact match on ``u.Host`` — note this is host
  *including port*, so ``t.co:80`` is NOT blocked, faithfully
  reproducing the Go map lookup on ``u.Host`` (``linkutils.go:22-26,34-36``)
- F3 file-type filter: ``filepath.Ext(u.EscapedPath())`` must be
  ``.html``, ``.htm`` or empty — case-sensitive (``linkutils.go:41-50``)
- F4 content-type gate: header split on ';', first token must be
  exactly ``text/html`` or ``application/xhtml+xml`` — no whitespace
  trimming, like Go's ``strings.Split(h, ";")[0]`` (``linkutils.go:53-63``)

All are pure scalar predicates; the batch stages vectorize over them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .urlnorm import GoURL, URLError, go_path_ext, parse

__all__ = [
    "FilterConfig",
    "DEFAULT_FILTERS",
    "scheme_ok",
    "host_ok",
    "file_type_ok",
    "scrape_da_ting",
    "happy_content_type",
    "parse_url",
]


@dataclass(frozen=True)
class FilterConfig:
    """Config-driven filter tables (reference hard-codes these)."""

    accept_schemes: frozenset[str] = frozenset({"http", "https"})
    ignore_hosts: frozenset[str] = frozenset({"t.co", "pbs.twimg.com"})
    nice_extensions: frozenset[str] = frozenset({".html", ".htm", ""})
    happy_content_types: frozenset[str] = frozenset(
        {"text/html", "application/xhtml+xml"}
    )


DEFAULT_FILTERS = FilterConfig()


def scheme_ok(u: GoURL, cfg: FilterConfig = DEFAULT_FILTERS) -> bool:
    return u.scheme in cfg.accept_schemes


def host_ok(u: GoURL, cfg: FilterConfig = DEFAULT_FILTERS) -> bool:
    return u.host not in cfg.ignore_hosts


def file_type_ok(u: GoURL, cfg: FilterConfig = DEFAULT_FILTERS) -> bool:
    return go_path_ext(u.escaped_path()) in cfg.nice_extensions


def scrape_da_ting(u: GoURL, cfg: FilterConfig = DEFAULT_FILTERS) -> bool:
    """F1 ∧ F2 ∧ F3 — the single URL admission gate (``linkutils.go:29-38``)."""
    return scheme_ok(u, cfg) and host_ok(u, cfg) and file_type_ok(u, cfg)


def happy_content_type(content_type: str, cfg: FilterConfig = DEFAULT_FILTERS) -> bool:
    """F4 — proceed only for HTML-ish responses (``linkutils.go:53-63``)."""
    return content_type.split(";")[0] in cfg.happy_content_types


def parse_url(s: str, cfg: FilterConfig = DEFAULT_FILTERS) -> GoURL | None:
    """Port of ``linkutils.ParseURL`` (``linkutils.go:75-85``): trim
    whitespace, parse, apply the admission gate; None where Go errors."""
    s = s.strip()
    try:
        u = parse(s)
    except URLError:
        return None
    if not scrape_da_ting(u, cfg):
        return None
    return u
