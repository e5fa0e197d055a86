"""Pluggable fetch seam: HttpFetcher outcome semantics (via an injected
opener — no network in this sandbox) and full-crawl equivalence when the
engine runs with fetcher_factory instead of the corpus FetchSim."""

import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from web_graph_ray.config import CrawlConfig
from web_graph_ray.pipelines.crawl import CrawlEngine
from web_graph_ray.sources.synth import CorpusConfig, seed_urls, write_corpus
from web_graph_ray.stages.fetch import HttpFetcher


class FakeResponse:
    def __init__(self, body=b"", ct="text/html", status=200):
        self._body, self.status = body, status
        self.headers = {"Content-Type": ct} if ct is not None else {}

    def read(self, n=-1):
        return self._body if n < 0 else self._body[:n]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class TestHttpFetcherOutcomes:
    def _batch(self, rows):
        return pa.Table.from_pydict(
            {
                "status": pa.array([r[0] for r in rows]),
                "page_id": pa.array([r[1] for r in rows]),
                "url": pa.array([r[2] for r in rows]),
                "bucket": pa.array([0] * len(rows), pa.int32()),
            }
        )

    def test_status_fanout(self):
        def opener(url):
            return {
                "http://a/ok": FakeResponse(b"<html>x</html>", "text/html; charset=utf-8"),
                "http://a/404": FakeResponse(b"", "text/html", status=404),
                "http://a/pdf": FakeResponse(b"%PDF", "application/pdf"),
                "http://a/noct": FakeResponse(b"x", ct=None),
                "http://a/big": FakeResponse(b"y" * 100, "text/html"),
            }[url]

        f = HttpFetcher(opener=opener, max_bytes=50)
        out = f(
            self._batch(
                [
                    ("admitted", "p1", "http://a/ok"),
                    ("admitted", "p2", "http://a/404"),
                    ("admitted", "p3", "http://a/pdf"),
                    ("admitted", "p4", "http://a/noct"),
                    ("admitted", "p5", "http://a/big"),
                    ("admitted", "p6", "http://a/raises"),  # KeyError → dead
                    ("robots_denied", "p7", "http://a/denied"),
                ]
            )
        )
        got = dict(zip(out["page_id"].to_pylist(), out["status"].to_pylist()))
        assert got == {
            "p1": "ok",
            "p2": "dead",
            "p3": "bad_content_type",
            "p4": "bad_content_type",  # missing CT header → F4 gate, like null-CT corpus rows
            "p5": "dead",  # oversized body, never truncated html
            "p6": "dead",
            "p7": "robots_denied",
        }
        html = dict(zip(out["page_id"].to_pylist(), out["html"].to_pylist()))
        assert html["p1"] == b"<html>x</html>" and html["p2"] is None
        ct = dict(zip(out["page_id"].to_pylist(), out["content_type"].to_pylist()))
        assert ct["p1"] == "text/html"  # parameters stripped before the gate


class FakeHTTPResponse:
    """Shape of http.client.HTTPResponse: status/headers/read/isclosed."""

    def __init__(self, body=b"<html>x</html>", status=200, headers=None):
        self._buf, self._len = io.BytesIO(body), len(body)
        self.status = status
        self.headers = {"Content-Type": "text/html"} if headers is None else headers

    def read(self, n=-1):
        return self._buf.read() if n is None or n < 0 else self._buf.read(n)

    def isclosed(self):
        return self._buf.tell() >= self._len


class FakeConn:
    def __init__(self, script=None):
        # script: list of FakeHTTPResponse | Exception, served in order;
        # None = endless default responses
        self.script = script
        self.requests: list[tuple] = []
        self.closed = False

    def request(self, method, path, headers=None):
        self.requests.append((method, path, dict(headers or {})))

    def getresponse(self):
        if self.script is None:
            return FakeHTTPResponse()
        item = self.script.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


    def close(self):
        self.closed = True


class TestHttpKeepAlive:
    """VERDICT r3 item 9: reference-ST4 transport parity — host-keyed
    connection reuse, stale-socket retry, redirects, DNS memo."""

    def _fetcher(self, scripts=None, **kw):
        made = []

        def factory(scheme, host, port, timeout):
            conn = FakeConn((scripts or {}).get(host))
            made.append((host, conn))
            return conn

        f = HttpFetcher(conn_factory=factory, **kw)
        return f, made

    def test_connections_reused_per_host(self):
        f, made = self._fetcher()
        rows = [("p1", "http://a.example/x", 0), ("p2", "http://a.example/y", 0),
                ("p3", "http://b.example/z", 0)]
        out = f.retrieve(rows)
        assert set(out) == {"p1", "p2", "p3"}
        hosts = [h for h, _ in made]
        assert hosts.count("a.example") == 1 and hosts.count("b.example") == 1
        a_conn = made[0][1]
        assert [p for _, p, _ in a_conn.requests] == ["/x", "/y"]
        # Host header carried explicitly (plain HTTP dials the resolved IP)
        assert a_conn.requests[0][2]["Host"] == "a.example"

    def test_stale_keepalive_retries_once_on_fresh_conn(self):
        scripts = {"a.example": [ConnectionResetError("stale"), FakeHTTPResponse()]}
        # first conn serves the error then would serve the response, but a
        # fresh conn gets a fresh script copy — model this with a factory
        # that serves the error only from the FIRST connection
        made = []

        def factory(scheme, host, port, timeout):
            conn = FakeConn([ConnectionResetError("stale")] if not made else None)
            made.append(conn)
            return conn

        f = HttpFetcher(conn_factory=factory)
        out = f.retrieve([("p1", "http://a.example/x", 0)])
        assert "p1" in out and len(made) == 2
        assert made[0].closed  # stale conn evicted and closed

    def test_redirect_followed_and_relative_location(self):
        scripts = {
            "a.example": [
                FakeHTTPResponse(b"", 301, {"Location": "/moved"}),
                FakeHTTPResponse(b"<html>dest</html>"),
            ]
        }
        f, made = self._fetcher(scripts)
        out = f.retrieve([("p1", "http://a.example/x", 0)])
        assert out["p1"][0] == b"<html>dest</html>"
        # same kept-alive connection served both hops
        assert len(made) == 1
        assert [p for _, p, _ in made[0][1].requests] == ["/x", "/moved"]

    def test_oversized_body_evicts_connection(self):
        scripts = {"a.example": [FakeHTTPResponse(b"y" * 100), FakeHTTPResponse(b"ok")]}
        f, made = self._fetcher(scripts, max_bytes=10)
        out = f.retrieve([("p1", "http://a.example/x", 0),
                          ("p2", "http://a.example/y", 0)])
        assert "p1" not in out and "p2" in out
        # half-read keep-alive socket is not reusable: second fetch got a
        # fresh connection
        assert len(made) == 2 and made[0][1].closed

    def test_lru_bound_closes_oldest(self):
        f, made = self._fetcher(max_conns=1)
        f.retrieve([("p1", "http://a.example/x", 0)])
        f.retrieve([("p2", "http://b.example/y", 0)])
        assert made[0][1].closed and not made[1][1].closed

    def test_dns_memo_bounded_and_cached(self, monkeypatch):
        import socket

        calls = []

        def fake_gai(host, port):
            calls.append(host)
            return [(socket.AF_INET, socket.SOCK_STREAM, 6, "", (f"10.0.0.{len(calls)}", 0))]

        monkeypatch.setattr(socket, "getaddrinfo", fake_gai)
        f = HttpFetcher(dns_cache_size=2)
        assert f._resolve("a") == "10.0.0.1"
        assert f._resolve("a") == "10.0.0.1"  # memo hit
        assert calls == ["a"]
        f._resolve("b")
        f._resolve("c")  # evicts the LRU entry ("a")
        f._resolve("a")
        assert calls == ["a", "b", "c", "a"]

    def test_doh_resolver_tier(self, monkeypatch):
        """VERDICT r4 item 7: optional DNS-over-HTTPS tier through the
        same conn_factory seam and the same 1000-entry memo — the DoH
        endpoint receives one dns-json GET per uncached host, answers
        are memoized, and a failing DoH responder falls back to the
        system resolver."""
        import json
        import socket

        doh_conns = []

        def doh_body(ip):
            return json.dumps(
                {"Answer": [{"type": 5, "data": "cname.skip"},
                            {"type": 1, "data": ip}]}
            ).encode()

        def factory(scheme, host, port, timeout):
            assert (scheme, host) == ("https", "9.9.9.9")
            conn = FakeConn(None)
            conn.script = [
                FakeHTTPResponse(doh_body("203.0.113.7"),
                                 headers={"Content-Type": "application/dns-json"}),
                FakeHTTPResponse(b"not json", status=500, headers={}),
            ]
            doh_conns.append(conn)
            return conn

        sys_calls = []

        def fake_gai(host, port):
            sys_calls.append(host)
            return [(socket.AF_INET, socket.SOCK_STREAM, 6, "", ("10.9.9.9", 0))]

        monkeypatch.setattr(socket, "getaddrinfo", fake_gai)
        f = HttpFetcher(conn_factory=factory,
                        doh_url="https://9.9.9.9/dns-query")
        # first resolve: one DoH GET, A record wins (CNAME skipped)
        assert f._resolve("a.example") == "203.0.113.7"
        assert sys_calls == []
        _, path, _ = doh_conns[0].requests[0]
        assert path == "/dns-query?name=a.example&type=A"
        # memo hit: no second DoH request
        assert f._resolve("a.example") == "203.0.113.7"
        assert len(doh_conns[0].requests) == 1
        # DoH failure (500): system resolver fallback, still memoized
        assert f._resolve("b.example") == "10.9.9.9"
        assert sys_calls == ["b.example"]
        assert f._resolve("b.example") == "10.9.9.9"
        assert sys_calls == ["b.example"]


class TestHttpCrawlEquivalence:
    def test_http_crawl_equals_corpus_crawl(self, ray_session, tmp_path_factory):
        """A crawl through the HTTP seam (fake opener serving the corpus
        by canonical page id) produces byte-identical pages/links to the
        default corpus-lookup fetch."""
        from web_graph_ray.pipelines.queries import page_id_of_url

        ccfg = CorpusConfig(n_pages=120, seed=7)
        d = tmp_path_factory.mktemp("seam")
        corpus = write_corpus(str(d / "corpus"), ccfg)

        t = pq.read_table(corpus, columns=["url", "html", "content_type"])
        by_pid = {
            page_id_of_url(u): (h, c)
            for u, h, c in zip(
                t["url"].to_pylist(), t["html"].to_pylist(), t["content_type"].to_pylist()
            )
        }

        def opener(url):
            row = by_pid.get(page_id_of_url(url))
            if row is None:
                raise OSError("404")
            return FakeResponse(row[0], row[1])

        def factory():
            return HttpFetcher(opener=opener)

        def run(work, fetcher_factory=None):
            cfg = CrawlConfig(
                num_buckets=8, work_dir=str(work), fetcher_factory=fetcher_factory
            )
            eng = CrawlEngine(corpus, cfg)
            eng.run(seed_urls(ccfg))
            return eng

        base = run(d / "w_corpus")
        http = run(d / "w_http", fetcher_factory=factory)

        for getter in ("pages", "links", "visits"):
            a = getattr(base, getter)().to_pandas()
            b = getattr(http, getter)().to_pandas()
            cols = sorted(a.columns)
            a = a[cols].sort_values(cols).reset_index(drop=True)
            b = b[cols].sort_values(cols).reset_index(drop=True)
            assert a.equals(b), f"{getter} diverged through the HTTP seam"


def test_repetition_metrics_edges():
    """No Ray needed: degenerate inputs of the repetition metrics."""
    from web_graph_ray.functions.text import repetition_metrics

    z = repetition_metrics("")
    assert z == {
        "dup_line_frac": 0.0,
        "dup_line_char_frac": 0.0,
        "top_bigram_frac": 0.0,
        "top_trigram_frac": 0.0,
    }
    one = repetition_metrics("hello")
    assert one["top_bigram_frac"] == 0.0 and one["dup_line_frac"] == 0.0
    # pure repetition: every line identical, every bigram identical
    r = repetition_metrics("ab ab ab ab\nab ab ab ab\nab ab ab ab")
    assert r["dup_line_frac"] == 2 / 3
    assert r["top_bigram_frac"] == 1.0
