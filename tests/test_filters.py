"""Filter-table parity tests (``pkg/linkutils/linkutils.go:17-63``)."""

import pytest

from web_graph_ray.functions.filters import (
    happy_content_type,
    parse_url,
    scrape_da_ting,
)
from web_graph_ray.functions.urlnorm import parse


class TestScrapeDaTing:
    @pytest.mark.parametrize(
        "url,want",
        [
            ("http://example.com/a", True),
            ("https://example.com/a.html", True),
            ("https://example.com/a.htm", True),
            ("https://example.com/", True),
            ("https://example.com", True),
            # F1 scheme
            ("ftp://example.com/a", False),
            ("mailto:bob@example.com", False),
            ("javascript:void(0)", False),
            ("file:///etc/passwd", False),
            # F2 blocklist (exact u.Host match — port variant is NOT blocked)
            ("https://t.co/abc", False),
            ("https://pbs.twimg.com/img", False),
            ("https://t.co:443/abc", True),
            ("https://sub.t.co/abc", True),
            # F3 extension (case-sensitive)
            ("https://example.com/a.pdf", False),
            ("https://example.com/a.jpg", False),
            ("https://example.com/a.css", False),
            ("https://example.com/a.HTML", False),
            ("https://example.com/dir.x/file", True),
            ("https://example.com/.hidden", False),
            ("https://example.com/a.", False),
        ],
    )
    def test_cases(self, url, want):
        assert scrape_da_ting(parse(url)) is want


class TestHappyContentType:
    @pytest.mark.parametrize(
        "ct,want",
        [
            ("text/html", True),
            ("text/html; charset=utf-8", True),
            ("application/xhtml+xml", True),
            ("application/xhtml+xml;q=1", True),
            # no whitespace trimming — Go splits on ';' only
            ("text/html ; x", False),
            (" text/html", False),
            ("application/pdf", False),
            ("text/plain", False),
            ("", False),
        ],
    )
    def test_cases(self, ct, want):
        assert happy_content_type(ct) is want


class TestParseURL:
    def test_trims_whitespace(self):
        u = parse_url("  https://example.com/a  \n")
        assert u is not None and u.string() == "https://example.com/a"

    def test_rejects_filtered(self):
        assert parse_url("ftp://example.com/a") is None

    def test_rejects_unparseable(self):
        assert parse_url("http://x .com/") is None
