"""Extractor parity tests (``pkg/linkprocessor/linkprocessor.go:127-168``
+ UTF-8 sanitize ``pkg/linkstorage/linkstorage.go:408``)."""

from web_graph_ray.functions.extract import extract_html, to_valid_utf8
from web_graph_ray.functions.links import extract_links
from web_graph_ray.functions.urlnorm import parse


class TestExtractHtml:
    def test_document_order(self):
        html = b'<a href="/1">one</a><p><a href="/2">two</a></p><a href="/3">three</a>'
        r = extract_html(html)
        assert [a.href for a in r.anchors] == ["/1", "/2", "/3"]
        assert [a.index for a in r.anchors] == [0, 1, 2]

    def test_no_href_skipped(self):
        html = b'<a name="x">anchor</a><a href="/y">link</a>'
        r = extract_html(html)
        assert [a.href for a in r.anchors] == ["/y"]

    def test_nested_markup_text(self):
        html = b'<a href="/x">Hello <b>bold <i>italic</i></b> world</a>'
        r = extract_html(html)
        assert r.anchors[0].text == "Hello bold italic world"

    def test_entity_decoding(self):
        html = b'<a href="/a?x=1&amp;y=2">a &amp; b &lt;c&gt;</a>'
        r = extract_html(html)
        assert r.anchors[0].href == "/a?x=1&y=2"
        assert r.anchors[0].text == "a & b <c>"

    def test_implicit_anchor_close(self):
        # HTML5: a new <a> closes the open one
        html = b'<a href="/1">one <a href="/2">two</a>'
        r = extract_html(html)
        assert [a.href for a in r.anchors] == ["/1", "/2"]
        assert r.anchors[0].text == "one "
        assert r.anchors[1].text == "two"

    def test_unclosed_anchor_at_eof(self):
        html = b'<a href="/1">dangling'
        r = extract_html(html)
        assert [a.href for a in r.anchors] == ["/1"]
        assert r.anchors[0].text == "dangling"

    def test_duplicate_href_attr_first_wins(self):
        html = b'<a href="/first" href="/second">t</a>'
        r = extract_html(html)
        assert r.anchors[0].href == "/first"

    def test_invalid_utf8_deleted(self):
        # 0xff is not valid UTF-8 anywhere; Go's ToValidUTF8(s, "") deletes it
        html = b'<a href="/x">bad\xffbyte</a>'
        r = extract_html(html)
        assert r.anchors[0].text == "badbyte"

    def test_doc_text(self):
        html = b"<html><head><title>T</title></head><body><p>Hello</p> <a href='/x'>link</a>!</body></html>"
        r = extract_html(html)
        assert r.doc_text == "THello link!"

    def test_empty_href(self):
        html = b'<a href>empty</a><a href="">also</a>'
        r = extract_html(html)
        assert [a.href for a in r.anchors] == ["", ""]


class TestToValidUtf8:
    def test_valid_passthrough(self):
        assert to_valid_utf8("héllo ✓") == "héllo ✓"

    def test_deletes_invalid(self):
        s = b"a\xff\xfeb".decode("utf-8", "surrogateescape")
        assert to_valid_utf8(s) == "ab"


class TestExtractLinks:
    BASE = parse("https://example.com/dir/page.html")

    def test_relative_resolution(self):
        links, _ = extract_links(self.BASE, b'<a href="other.html">x</a>')
        assert links[0].to_url == "https://example.com/dir/other.html"

    def test_href_whitespace_trimmed(self):
        links, _ = extract_links(self.BASE, b'<a href="  /abs  ">x</a>')
        assert links[0].to_url == "https://example.com/abs"

    def test_filtered_schemes_skipped(self):
        html = (
            b'<a href="mailto:a@b.c">m</a>'
            b'<a href="javascript:void(0)">j</a>'
            b'<a href="ftp://x.com/f">f</a>'
            b'<a href="https://ok.com/page">ok</a>'
        )
        links, _ = extract_links(self.BASE, html)
        assert [l.to_url for l in links] == ["https://ok.com/page"]

    def test_blocked_host_skipped(self):
        links, _ = extract_links(self.BASE, b'<a href="https://t.co/x">t</a>')
        assert links == []

    def test_bad_extension_skipped(self):
        links, _ = extract_links(self.BASE, b'<a href="/doc.pdf">p</a>')
        assert links == []

    def test_query_and_fragment_kept_in_url(self):
        links, _ = extract_links(self.BASE, b'<a href="/a?q=1#f">x</a>')
        assert links[0].to_url == "https://example.com/a?q=1#f"
        # ...but excluded from identity
        links2, _ = extract_links(self.BASE, b'<a href="/a">x</a>')
        assert links[0].to_page_id == links2[0].to_page_id

    def test_protocol_relative(self):
        links, _ = extract_links(self.BASE, b'<a href="//other.com/p">x</a>')
        assert links[0].to_url == "https://other.com/p"

    def test_page_id_of_resolved(self):
        links, _ = extract_links(self.BASE, b'<a href="../up.html">x</a>')
        assert links[0].to_url == "https://example.com/up.html"
        assert links[0].to_hostname == "example.com"
        assert links[0].to_escaped_path == "/up.html"

    def test_unparseable_href_skipped(self):
        links, _ = extract_links(self.BASE, b'<a href="http://bad host/">x</a><a href="/ok">y</a>')
        assert [l.to_url for l in links] == ["https://example.com/ok"]

    def test_anchor_index_is_document_position(self):
        html = b'<a href="mailto:x@y.z">skip</a><a href="/keep">keep</a>'
        links, _ = extract_links(self.BASE, html)
        # index 1: second anchor in the document (filters don't renumber)
        assert links[0].anchor_index == 1
