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


class TestRobotsGroupsAndAllow:
    """Robots parser: per-agent groups + Allow rules with Google-REP
    longest-prefix-match semantics (exceeds the reference, which has no
    robots at all)."""

    BODY = """
# comment
User-agent: specialbot
Disallow: /private/

User-agent: *
Disallow: /docs/
Allow: /docs/public/
Disallow:
"""

    def test_star_group_allow_overrides(self):
        from web_graph_ray.state.politeness import RobotsRules, parse_robots

        r = RobotsRules({"h": parse_robots(self.BODY)})
        assert not r.is_allowed("h", "/docs/secret.html")
        assert r.is_allowed("h", "/docs/public/x.html")  # longer Allow wins
        assert r.is_allowed("h", "/other/")
        assert r.is_allowed("h", "")  # empty path -> "/"

    def test_specific_agent_group(self):
        from web_graph_ray.state.politeness import RobotsRules, parse_robots

        r = RobotsRules({"h": parse_robots(self.BODY, user_agent="SpecialBot")})
        assert not r.is_allowed("h", "/private/x")
        assert r.is_allowed("h", "/docs/secret.html")  # * group not applied

    def test_shared_agent_lines(self):
        from web_graph_ray.state.politeness import parse_robots

        body = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
        assert parse_robots(body, "a") == [[False, "/x/"]]
        assert parse_robots(body, "b") == [[False, "/x/"]]
        assert parse_robots(body, "c") == []  # no * group

    def test_tie_prefers_allow(self):
        from web_graph_ray.state.politeness import RobotsRules

        r = RobotsRules({"h": [[False, "/a/"], [True, "/a/"]]})
        assert r.is_allowed("h", "/a/x")

    def test_denied_mask_matches_scalar(self):
        import pandas as pd

        from web_graph_ray.state.politeness import RobotsRules, parse_robots

        r = RobotsRules({"h": parse_robots(self.BODY), "h2": [[False, "/"]]})
        hosts = pd.Series(["h", "h", "h", "h2", "free", "h"])
        paths = pd.Series(["/docs/a", "/docs/public/a", "/ok", "/anything", "/x", ""])
        mask = r.denied_mask(hosts, paths)
        exp = [not r.is_allowed(h, p) for h, p in zip(hosts, paths)]
        assert list(mask) == exp

    def test_denied_mask_null_and_empty_paths(self):
        # None/NaN paths must normalize to "/" exactly like is_allowed
        # does (a 'Disallow: /' host denies them on BOTH code paths)
        import pandas as pd

        from web_graph_ray.state.politeness import RobotsRules

        r = RobotsRules({"h2": [[False, "/"]], "ok": [[False, "/x/"]]})
        hosts = pd.Series(["h2", "h2", "h2", "ok"])
        paths = pd.Series([None, "", "/y", None])
        mask = r.denied_mask(hosts, paths)
        exp = [not r.is_allowed(h, p) for h, p in zip(hosts, paths)]
        assert list(mask) == exp == [True, True, True, False]

    def test_legacy_prefix_list_form(self):
        from web_graph_ray.state.politeness import RobotsRules

        # old robots.json files stored plain Disallow prefixes
        r = RobotsRules({"h": ["/a/", "/b/"]})
        assert not r.is_allowed("h", "/a/x")
        assert r.is_allowed("h", "/c/")


class TestSitemapDirectives:
    """robots.txt Sitemap: lines (RFC 9309 §2.3) — host-wide,
    group-independent, order-preserving dedup; feeds
    sources.sitemap.parse_sitemap."""

    def test_collects_across_groups(self):
        from web_graph_ray.state.politeness import (
            parse_robots,
            parse_sitemap_directives,
        )

        body = """
User-agent: a
Disallow: /x/
Sitemap: https://h.example/sitemap-1.xml   # trailing comment
User-agent: b
Sitemap: https://h.example/sitemap-2.xml
Sitemap: https://h.example/sitemap-1.xml
Sitemap:
"""
        assert parse_sitemap_directives(body) == [
            "https://h.example/sitemap-1.xml",
            "https://h.example/sitemap-2.xml",
        ]
        # group parsing is untouched by the sitemap lines
        assert parse_robots(body, "a") == [[False, "/x/"]]

    def test_roundtrip_into_sitemap_parser(self):
        from web_graph_ray.sources.sitemap import encode_urlset, parse_sitemap
        from web_graph_ray.state.politeness import parse_sitemap_directives

        urls = parse_sitemap_directives("Sitemap: https://h.example/s.xml")
        assert urls == ["https://h.example/s.xml"]
        kind, got, _ = parse_sitemap(
            encode_urlset([("https://h.example/p/1", None)])
        )
        assert kind == "urlset" and got == ["https://h.example/p/1"]
