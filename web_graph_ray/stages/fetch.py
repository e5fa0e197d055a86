"""Fetch stage (actor-pool / per-worker-cached batch transform) with a
pluggable retrieval seam.

The reference fetches live URLs with a shared HTTP client + DNS cache
(``pkg/linkprocessor/linkprocessor.go:51-75,110-121``).  In this
sandbox "fetch" is a keyed lookup of the page body in the
Common-Crawl-style corpus (the input_hint contract): identity-keyed
(page_id), so any URL variant of a page retrieves the one stored
capture — mirroring the reference's worldview that scheme/port/query
variants are the same page.

The OUTCOME semantics (dead / bad_content_type / ok, robots_denied
pass-through) are shared policy in ``apply_fetch``; WHERE bytes come
from is a ``retrieve`` callable — the seam the reference's HTTP client
would plug into:

- ``FetchSim``      — corpus lookup (the sandbox contract; default)
- ``HttpFetcher``   — stdlib live-HTTP retrieval (timeout, size cap,
  UA).  Never exercised live here (no network); the seam is unit-
  tested with a patched opener.  A production drop-in would add
  keep-alive pooling + DNS caching like the reference's DoH client.

Scale design (FetchSim): the corpus is pre-partitioned into per-host-
bucket Parquet files sorted by page_id (see CrawlEngine.prepare).  Each
worker resolves a batch by selective, predicate-pushdown reads of only
the needed bucket files (row-group pruning via the sorted page_id
column) — no broadcast of the corpus, no per-batch reshipping; file
bytes ride the OS page cache across rounds (a per-worker whole-bucket
dict cache was measured to be anti-scaling: cold builds multiply with
workers).

Outcome semantics (per reference):
- id absent / retrieval error   → status "dead"   (fetch error: logged &
  dropped, page stays seen — ``linkprocessor.go:188-192``, no retry)
- content-type gate fails (F4)  → status "bad_content_type"
  (``linkutils.go:53-63``)
- otherwise                     → status "ok" + html payload
Rows already robots_denied pass through untouched.
"""

from __future__ import annotations

import os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.filters import FilterConfig, DEFAULT_FILTERS, happy_content_type

__all__ = ["FetchSim", "HttpFetcher", "apply_fetch", "make_fetcher", "make_http_fetcher"]


def apply_fetch(batch: pa.Table, retrieve, filters: FilterConfig) -> pa.Table:
    """Shared outcome policy: ``retrieve(rows)`` gets the admitted rows
    as (page_id, url, bucket) tuples and returns {page_id: (html_bytes,
    content_type)}; ids it omits are dead.  Everything else (status
    fan-out, content-type gate, pass-through) is identical across
    retrieval backends."""
    statuses = batch["status"].to_pylist()
    ids = batch["page_id"].to_pylist()
    urls = batch["url"].to_pylist()
    buckets = batch["bucket"].to_pylist()

    wanted = [
        (pid, url, b)
        for pid, url, b, st in zip(ids, urls, buckets, statuses)
        if st == "admitted"
    ]
    lookup = retrieve(wanted) if wanted else {}

    out_status, out_html, out_ct = [], [], []
    for pid, st in zip(ids, statuses):
        if st != "admitted":
            out_status.append(st)  # robots_denied passes through
            out_html.append(None)
            out_ct.append(None)
            continue
        row = lookup.get(pid)
        if row is None:
            out_status.append("dead")
            out_html.append(None)
            out_ct.append(None)
        elif row[1] is None or not happy_content_type(row[1], filters):
            # null/empty Content-Type is REJECTED, like the Go
            # HappyResponse on a missing header (linkutils.go:53-63);
            # corpora lacking the column get 'text/html' filled at
            # prepare(), not here
            out_status.append("bad_content_type")
            out_html.append(None)
            out_ct.append(row[1])
        else:
            out_status.append("ok")
            out_html.append(row[0])
            out_ct.append(row[1])

    batch = batch.drop_columns(["status"])
    batch = batch.append_column("status", pa.array(out_status, type=pa.string()))
    batch = batch.append_column("html", pa.array(out_html, type=pa.binary()))
    batch = batch.append_column("content_type", pa.array(out_ct, type=pa.string()))
    return batch


class FetchSim:
    """Corpus-lookup fetcher, callable for
    ``map_batches(FetchSim, concurrency=N)``.

    __init__ runs once per actor (ST4 analogue: expensive setup
    amortized across batches); __call__ per batch.
    """

    def __init__(
        self,
        corpus_idx_dir: str,
        filters: FilterConfig = DEFAULT_FILTERS,
    ) -> None:
        self.dir = corpus_idx_dir
        self.filters = filters

    # -- corpus access ------------------------------------------------------

    def _bucket_index(self, bucket: int, ids: list[str]) -> dict:
        """id → (html, content_type) for EXACTLY the requested ids of
        one bucket: predicate-pushdown read (the file is page_id-sorted
        → row-group pruning), bulk-materialized once.

        Deliberately NO per-worker whole-bucket dict cache: building a
        bucket-sized Python dict per (worker, bucket) first touch is an
        ANTI-scaling cost (more workers ⇒ more cold builds ⇒ more
        memory-bandwidth churn), while the selective read scales with
        the admitted pages and rides the OS page cache for file bytes."""
        from ..state.checkpoint import bucket_file

        path = bucket_file(self.dir, bucket)
        if not os.path.exists(path):
            return {}
        tbl = pq.read_table(
            path,
            columns=["page_id", "html", "content_type"],
            filters=pc.field("page_id").isin(pa.array(ids)),
        )
        return dict(
            zip(
                tbl["page_id"].to_pylist(),
                zip(tbl["html"].to_pylist(), tbl["content_type"].to_pylist()),
            )
        )

    def retrieve(self, rows: list[tuple]) -> dict:
        want: dict[int, list[str]] = {}
        for pid, _url, b in rows:
            want.setdefault(b, []).append(pid)
        lookup: dict[str, tuple] = {}
        for b, bucket_ids in want.items():
            idx = self._bucket_index(b, bucket_ids)
            for pid in bucket_ids:
                row = idx.get(pid)
                if row is not None:
                    lookup[pid] = row
        return lookup

    def __call__(self, batch: pa.Table) -> pa.Table:
        return apply_fetch(batch, self.retrieve, self.filters)


class _KeepAliveResponse:
    """Context-manager adapter over http.client.HTTPResponse: exposes
    status/headers/read like urllib's response; on exit, a response
    whose body was NOT fully drained evicts its connection (a half-read
    keep-alive socket cannot be reused)."""

    def __init__(self, resp, evict) -> None:
        self._resp, self._evict = resp, evict
        self.status = getattr(resp, "status", 200)
        self.headers = resp.headers

    def read(self, n: int = -1):
        return self._resp.read(n)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if not getattr(self._resp, "isclosed", lambda: True)():
            self._evict()
        return False


class HttpFetcher:
    """Live-HTTP fetcher (stdlib http.client): per-worker init-once
    client state with HOST-KEYED KEEP-ALIVE connection reuse and a
    bounded DNS memo — transport parity with the reference's pooled
    client + cached DoH resolver (linkprocessor.go:51-75, ST4).  Per-URL
    GET with timeout + response-size cap + redirect following (urllib
    parity, ≤5 hops), Content-Type taken from the response header
    (parameters stripped, as the reference's HappyResponse does before
    the gate).

    This is the SEAM for pointing the engine at a live frontier — swap
    the whole transport via the ``opener`` hook, or only the socket
    layer via ``conn_factory`` (how tests inject responses, since this
    sandbox has no network).  Retrieval errors (timeout, DNS, non-2xx)
    are "dead", matching the reference's log-and-drop
    (linkprocessor.go:188-192).  Connection notes: plain-HTTP
    connections dial the memoized IP with an explicit Host header;
    HTTPS dials by name (SNI/verification own the resolve).  A stale
    kept-alive socket gets one transparent retry on a fresh
    connection."""

    def __init__(
        self,
        filters: FilterConfig = DEFAULT_FILTERS,
        timeout_s: float = 10.0,       # reference http.Client.Timeout
        max_bytes: int = 4 << 20,
        user_agent: str = "web-graph-ray/1.0",
        opener=None,
        conn_factory=None,
        max_conns: int = 32,
        dns_cache_size: int = 1000,    # reference dns.MaxCacheEntries(1000)
        max_redirects: int = 5,
        doh_url: str | None = None,    # e.g. "https://1.1.1.1/dns-query"
    ) -> None:
        from collections import OrderedDict

        self.filters = filters
        self.timeout_s = timeout_s
        self.max_bytes = max_bytes
        self.user_agent = user_agent
        self._opener = opener or self._open
        self._conn_factory = conn_factory
        self.max_conns = max_conns
        self.dns_cache_size = dns_cache_size
        self.max_redirects = max_redirects
        self.doh_url = doh_url
        self._conns: "OrderedDict[tuple, object]" = OrderedDict()
        self._dns: "OrderedDict[str, str]" = OrderedDict()

    # -- transport ----------------------------------------------------------

    def _resolve_doh(self, host: str) -> str | None:
        """DNS-over-HTTPS resolve (transport parity with the reference's
        ncruces/go-dns DoH resolver, linkprocessor.go:51-56): one
        dns-json GET (``?name=<host>&type=A``) through the fetcher's own
        ``_request`` path, so tests inject a DoH responder through the
        same ``conn_factory``/``opener`` seam as page fetches and the
        DoH connection itself is keep-alive pooled.  Returns the first
        A-record, or None to fall back to the system resolver.  No
        recursion: the DoH endpoint's own host is https (dialed by
        name, SNI owns the resolve) or an IP literal."""
        import json as _json
        from urllib.parse import quote

        try:
            with self._request(
                f"{self.doh_url}?name={quote(host)}&type=A"
            ) as resp:
                if not 200 <= resp.status < 300:
                    return None
                ans = _json.loads(resp.read(self.max_bytes)).get("Answer") or []
            for rec in ans:
                if rec.get("type") == 1 and rec.get("data"):
                    return str(rec["data"])
        except Exception:
            return None
        return None

    def _resolve(self, host: str) -> str:
        ip = self._dns.get(host)
        if ip is None:
            if self.doh_url is not None:
                ip = self._resolve_doh(host)
            if ip is None:
                import socket

                try:
                    ip = socket.getaddrinfo(host, None)[0][4][0]
                except OSError:
                    ip = host  # let the connect fail with its own error
            if len(self._dns) >= self.dns_cache_size:
                self._dns.popitem(last=False)
            self._dns[host] = ip
        else:
            self._dns.move_to_end(host)
        return ip

    def _make_conn(self, scheme: str, host: str, port):
        if self._conn_factory is not None:
            return self._conn_factory(scheme, host, port, self.timeout_s)
        import http.client

        if scheme == "https":
            return http.client.HTTPSConnection(host, port, timeout=self.timeout_s)
        return http.client.HTTPConnection(
            self._resolve(host), port or 80, timeout=self.timeout_s
        )

    def _connection(self, key: tuple):
        conn = self._conns.pop(key, None)
        if conn is None:
            conn = self._make_conn(*key)
        self._conns[key] = conn  # LRU: most recent at the end
        while len(self._conns) > self.max_conns:
            _, old = self._conns.popitem(last=False)
            try:
                old.close()
            except Exception:
                pass
        return conn

    def _evict(self, key: tuple, conn) -> None:
        try:
            conn.close()
        except Exception:
            pass
        if self._conns.get(key) is conn:
            del self._conns[key]

    def _request(self, url: str):
        from urllib.parse import urlsplit

        parts = urlsplit(url)
        host = parts.hostname or ""
        key = (parts.scheme or "http", host, parts.port)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        headers = {
            "User-Agent": self.user_agent,
            "Host": host + (f":{parts.port}" if parts.port else ""),
        }
        for attempt in (0, 1):
            conn = self._connection(key)
            try:
                conn.request("GET", path, headers=headers)
                resp = conn.getresponse()
                return _KeepAliveResponse(resp, lambda: self._evict(key, conn))
            except Exception:
                # stale keep-alive socket: evict and retry once fresh
                self._evict(key, conn)
                if attempt:
                    raise
        raise AssertionError("unreachable")

    def _open(self, url: str):
        from urllib.parse import urljoin

        for _hop in range(self.max_redirects + 1):
            resp = self._request(url)
            if resp.status in (301, 302, 303, 307, 308):
                loc = resp.headers.get("Location")
                if loc:
                    resp.read()  # drain so the connection stays reusable
                    resp.__exit__()
                    url = urljoin(url, loc)
                    continue
            return resp
        raise OSError(f"too many redirects for {url}")

    def retrieve(self, rows: list[tuple]) -> dict:
        out: dict[str, tuple] = {}
        for pid, url, _b in rows:
            try:
                with self._opener(url) as resp:
                    status = getattr(resp, "status", 200)
                    if not 200 <= status < 300:
                        continue
                    ct = resp.headers.get("Content-Type")
                    if ct is not None:
                        ct = ct.split(";")[0].strip()
                    body = resp.read(self.max_bytes + 1)
                    if len(body) > self.max_bytes:
                        continue  # oversized → dead, never truncated html
                    out[pid] = (body, ct)
            except Exception:
                continue  # dead: log-and-drop parity
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        return apply_fetch(batch, self.retrieve, self.filters)


# -- stateless-task form with per-worker-process cache ----------------------
#
# Ray worker processes are long-lived across executions, so a module-level
# fetcher gives actor-pool state amortization (corpus cache / client config
# survive rounds) WITHOUT per-round actor-pool startup cost.  The state is
# read-only → safe under task retries.

_SIMS: dict[tuple, FetchSim] = {}


def make_fetcher(corpus_idx_dir: str, filters: FilterConfig = DEFAULT_FILTERS):
    key = (corpus_idx_dir, filters)  # FilterConfig is frozen → hashable

    def fetch_batch(batch: pa.Table) -> pa.Table:
        sim = _SIMS.get(key)
        if sim is None:
            sim = _SIMS[key] = FetchSim(corpus_idx_dir, filters)
        return sim(batch)

    return fetch_batch


_HTTP: dict[tuple, HttpFetcher] = {}


def make_http_fetcher(
    filters: FilterConfig = DEFAULT_FILTERS,
    timeout_s: float = 10.0,
    max_bytes: int = 4 << 20,
    user_agent: str = "web-graph-ray/1.0",
):
    key = (filters, timeout_s, max_bytes, user_agent)

    def fetch_batch(batch: pa.Table) -> pa.Table:
        f = _HTTP.get(key)
        if f is None:
            f = _HTTP[key] = HttpFetcher(filters, timeout_s, max_bytes, user_agent)
        return f(batch)

    return fetch_batch
