"""Property-based tests (hypothesis) for the identity-critical layer.

The URL parser decides page identity for the whole engine; fuzz it for
crash-freedom and the invariants that dedup correctness rests on.
"""

import string

from hypothesis import given, settings, strategies as st

from web_graph_ray.functions.extract import extract_html, to_valid_utf8
from web_graph_ray.functions.filters import parse_url
from web_graph_ray.functions.urlnorm import URLError, page_id_from_parts, parse, resolve_path

url_chars = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=-._~% 💡é\x00\x1f",
    max_size=80,
)


class TestParseFuzz:
    @given(url_chars)
    @settings(max_examples=400, deadline=None)
    def test_parse_never_crashes_unexpectedly(self, s):
        """parse() either returns a GoURL or raises URLError — nothing else."""
        try:
            u = parse(s)
        except URLError:
            return
        # accessors are total on any parsed URL
        u.hostname(); u.port(); u.escaped_path(); u.string(); u.is_abs()

    @given(url_chars)
    @settings(max_examples=400, deadline=None)
    def test_string_fixed_point(self, s):
        """u.string() re-parses to the same serialization (idempotence —
        the dequeue-revalidation invariant)."""
        try:
            once = parse(s).string()
        except URLError:
            return
        try:
            twice = parse(once).string()
        except URLError:
            return  # Go has the same property (String() of odd URLs may not reparse)
        assert twice == once

    @given(url_chars)
    @settings(max_examples=300, deadline=None)
    def test_identity_stable_through_roundtrip(self, s):
        """page_id survives string() → parse() — variants never split."""
        u = parse_url("https://h.example/" + s.replace("#", "").replace("?", ""))
        if u is None:
            return
        pid = page_id_from_parts(u.hostname(), u.escaped_path())
        u2 = parse_url(u.string())
        if u2 is None:
            return
        assert page_id_from_parts(u2.hostname(), u2.escaped_path()) == pid


class TestResolvePathProps:
    segs = st.lists(
        st.sampled_from(["a", "b", "..", ".", "", "x%20y", "c.d"]), max_size=8
    )

    @given(segs, segs)
    @settings(max_examples=300, deadline=None)
    def test_resolved_is_clean(self, base, ref):
        """Output starts with '/' and contains no '.'/'..' segments."""
        out = resolve_path("/" + "/".join(base), "/".join(ref))
        assert out == "" or out.startswith("/")
        for seg in out.split("/"):
            assert seg not in (".", "..")


class TestExtractFuzz:
    @given(st.binary(max_size=400))
    @settings(max_examples=300, deadline=None)
    def test_extract_never_crashes(self, data):
        r = extract_html(data)
        # emitted text is always valid UTF-8 (Go ToValidUTF8 contract)
        r.doc_text.encode("utf-8")
        for a in r.anchors:
            a.text.encode("utf-8")

    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_to_valid_utf8_total(self, s):
        to_valid_utf8(s).encode("utf-8")
