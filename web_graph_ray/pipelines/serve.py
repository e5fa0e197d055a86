"""HTTP serving layer — drop-in parity with the reference link-api.

The reference serves 7 gin routes over Postgres
(``cmd/link-api/main.go:87-191``); here the same routes (same paths,
same JSON shapes, queryLimit=100, allow-all CORS) are served from a
crawl work dir via :class:`GraphQueries`:

    GET /               welcome text
    GET /page/:id       {"node": {"id", "group", "url"}, "links": [hash]}
    GET /pages/:host    [hash, ...]
    GET /linksFrom/:id  [hash, ...]
    GET /linksTo/:id    [hash, ...]
    GET /countLinks     {"countLinks": N}
    GET /countPages     {"countPages": N}

plus two additions beyond the reference API (frontend parity without a
CDN): ``GET /ui`` serves the self-contained force-graph explorer
(frontend.html) and ``GET /firstPage`` returns any one crawled page
as its default starting node.

Python stdlib ``http.server`` only — no web framework in the container.
The handler thread calls into Ray Datasets materialized once by
GraphQueries (the analogue of the reference's DB indexes), so serving
does not re-run the crawl.
"""

from __future__ import annotations

import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

from .queries import QUERY_LIMIT, GraphQueries

# The reference ships a separate static force-graph site
# (frontend/index.html, React + react-force-graph-2d from a CDN); this
# container has no network, so parity is a dependency-free vanilla-JS
# canvas force-graph served by the API process itself at /ui, plus a
# /firstPage helper so the UI has an entry point without a ?url= param.
_FRONTEND = os.path.join(os.path.dirname(__file__), "frontend.html")


def _col(df, name) -> list:
    """Column as a list, [] when the result is empty — Ray datasets drop
    the schema of all-empty results, so ``df[name]`` would KeyError
    (the reference returns an empty JSON array for unknown ids)."""
    return list(df[name]) if len(df) else []

__all__ = ["make_server", "WELCOME"]

WELCOME = """Welcome to the web-graph (web_graph_ray serving layer)!

If you want to just explore the API, there are the following paths:
/                 - this page
/page/:id         - pass a page hash and retrieve info about the page, and all links from the page
/pages/:host      - easy way to find page hashes from a particular host (such as "wikipedia.com")
/linksFrom/:id    - pass a page hash and retrieve all links from this page
/linksTo/:id      - pass a page hash and retrieve all links to this page (that have been found so far, def not exhaustive)
/countLinks       - returns the number of links found
/countPages       - returns the number of pages found
/ui               - interactive force-graph explorer (click nodes to expand)
/firstPage        - any one page id/url (the explorer's default start)
"""


def _make_handler(gq: GraphQueries):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload, is_json: bool = True) -> None:
            body = (
                json.dumps(payload).encode() if is_json else str(payload).encode()
            )
            self.send_response(code)
            self.send_header(
                "Content-Type", "application/json" if is_json else "text/plain"
            )
            # gin cors.AllowAllOrigins (main.go:78-83)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_OPTIONS(self):  # ReactJS preflight (main.go:77)
            self._send(200, "", is_json=False)

        def do_GET(self):
            # gin's c.Param percent-decodes path segments (router.go);
            # mirror that so encoded hostnames resolve identically
            parts = [unquote(p) for p in self.path.split("?")[0].split("/") if p]
            try:
                if not parts:
                    return self._send(200, WELCOME, is_json=False)
                route, arg = parts[0], (parts[1] if len(parts) > 1 else None)
                if route == "ui":
                    with open(_FRONTEND, "rb") as f:
                        body = f.read()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Access-Control-Allow-Origin", "*")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return None
                if route == "firstPage":
                    row = gq.first_page()
                    if row is None:
                        return self._send(404, "no pages crawled", is_json=False)
                    return self._send(
                        200, {"id": row["page_id"], "url": row["url"]}
                    )
                if route == "page" and arg:
                    row = gq.page(arg)
                    if row is None:
                        return self._send(404, f"Nothing found for {arg}", is_json=False)
                    links = gq.links_from(arg, QUERY_LIMIT).to_pandas()
                    return self._send(
                        200,
                        {
                            "node": {
                                "id": arg,
                                "group": row["host"],
                                "url": row["url"],
                            },
                            "links": _col(links, "to_page_id"),
                        },
                    )
                if route == "pages" and arg:
                    out = gq.pages_by_host(arg, QUERY_LIMIT).to_pandas()
                    return self._send(200, _col(out, "page_id"))
                if route == "linksFrom" and arg:
                    out = gq.links_from(arg, QUERY_LIMIT).to_pandas()
                    return self._send(200, _col(out, "to_page_id"))
                if route == "linksTo" and arg:
                    out = gq.links_to(arg, QUERY_LIMIT).to_pandas()
                    return self._send(200, _col(out, "from_page_id"))
                if route == "countLinks":
                    return self._send(200, {"countLinks": gq.count_links()})
                if route == "countPages":
                    return self._send(200, {"countPages": gq.count_pages()})
                return self._send(404, "not found", is_json=False)
            except BrokenPipeError:
                pass
            except Exception as exc:  # the reference 500s on DB errors
                return self._send(500, f"Something wrong: {exc}", is_json=False)

    return Handler


def make_server(gq: GraphQueries, host: str = "127.0.0.1", port: int = 8080) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; caller runs serve_forever().
    With a committed index (engine.compact()), requests are per-bucket
    pruned file reads and nothing is materialized; otherwise the
    pages/links scan views are materialized up front so the first
    request is as fast as the rest."""
    if gq._index() is None:
        gq.pages, gq.links  # noqa: B018 — warm the materialized views
    return ThreadingHTTPServer((host, port), _make_handler(gq))
