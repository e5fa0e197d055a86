"""Graph query library — API parity with the reference's link-api.

The reference serves 7 HTTP routes over Postgres point queries
(``cmd/link-api/main.go:87-191``, queryLimit=100 at ``:24``).  Here the
same results are Dataset expressions over the crawl outputs:

| route                   | reference                                   | here |
|-------------------------|---------------------------------------------|------|
| GET /countPages         | reltuples estimate (linkstorage.go:323-343) | count_pages (exact) |
| GET /countLinks         | reltuples estimate (linkstorage.go:346-366) | count_links (exact) |
| GET /page/:id           | point lookup + links-from (main.go:91-133)  | page_with_links |
| GET /pages/:host        | host index lookup (linkstorage.go:183-214)  | pages_by_host |
| GET /linksFrom/:id      | forward adjacency (linkstorage.go:255-286)  | links_from |
| GET /linksTo/:id        | backlinks via idx_to_page_id (:289-320)     | links_to |
| (frontend hash contract)| SHA1(hostname+pathname) (index.html:68-78)  | page_id_of_url |

The pages/links tables are first-wins compactions (see
CrawlEngine.pages/links); GraphQueries materializes them once and
serves repeated point queries from the materialized datasets — the
Dataset analogue of the reference's DB indexes.  Limits are applied
after a deterministic sort so results are reproducible (the reference
relies on implicit Postgres scan order; we pin it).
"""

from __future__ import annotations

from ..functions.filters import parse_url
from ..functions.urlnorm import page_id_from_parts
from .crawl import CrawlEngine

__all__ = ["GraphQueries", "page_id_of_url"]

QUERY_LIMIT = 100  # cmd/link-api/main.go:24


def page_id_of_url(url: str) -> str | None:
    """The frontend's hash contract: url string → page_id."""
    u = parse_url(url)
    if u is None:
        return None
    return page_id_from_parts(u.hostname(), u.escaped_path())


class GraphQueries:
    def __init__(self, engine: CrawlEngine):
        self.engine = engine
        self._pages = None
        self._links = None

    @property
    def pages(self):
        if self._pages is None:
            self._pages = self.engine.pages().materialize()
        return self._pages

    @property
    def links(self):
        if self._links is None:
            self._links = self.engine.links().materialize()
        return self._links

    # -- counts (A1; exact, strictly stronger than reltuples) ---------------

    def count_pages(self) -> int:
        return self.pages.count()

    def count_links(self) -> int:
        return self.links.count()

    # -- point lookups ------------------------------------------------------

    def page(self, page_id: str) -> dict | None:
        """A5: /page/:id core — url of a page id, None if absent."""
        rows = self.pages.filter(expr=f"page_id == {page_id!r}").take(1)
        return rows[0] if rows else None

    def page_exists(self, page_id: str) -> bool:
        return self.page(page_id) is not None

    def link_exists(self, from_id: str, to_id: str) -> bool:
        rows = self.links.filter(
            expr=f"from_page_id == {from_id!r} and to_page_id == {to_id!r}"
        ).take(1)
        return bool(rows)

    def pages_by_host(self, host: str, limit: int = QUERY_LIMIT):
        """A2: page ids on a host (hostname, port-stripped — the pages
        table's host column is u.Hostname(), linkstorage.go:489)."""
        return (
            self.pages.filter(expr=f"host == {host!r}")
            .sort("page_id")
            .limit(limit)
            .select_columns(["page_id", "url"])
        )

    def links_from(self, page_id: str, limit: int = QUERY_LIMIT):
        """A3: forward adjacency."""
        return (
            self.links.filter(expr=f"from_page_id == {page_id!r}")
            .sort("to_page_id")
            .limit(limit)
            .select_columns(["to_page_id", "text"])
        )

    def links_to(self, page_id: str, limit: int = QUERY_LIMIT):
        """A4: backlinks (the reference needs idx_to_page_id for this;
        the compacted links dataset serves both directions)."""
        return (
            self.links.filter(expr=f"to_page_id == {page_id!r}")
            .sort("from_page_id")
            .limit(limit)
            .select_columns(["from_page_id", "text"])
        )

    def page_with_links(self, page_id: str, limit: int = QUERY_LIMIT) -> dict | None:
        """The /page/:id composite (main.go:91-133): page row + outlinks
        resolved to urls (the API joins app-side; we join datasets)."""
        row = self.page(page_id)
        if row is None:
            return None
        out = self.links_from(page_id, limit).to_pandas()
        # resolve target urls with a broadcast semi-join (id set ≤ limit)
        url_of: dict[str, str] = {}
        if len(out):
            import pyarrow as pa
            import pyarrow.compute as pc

            ids = pa.array(sorted(set(out["to_page_id"])))
            hits = self.pages.map_batches(
                lambda t: t.filter(pc.is_in(t["page_id"], value_set=ids)),
                batch_format="pyarrow",
            ).take_all()
            url_of = {r["page_id"]: r["url"] for r in hits}
        return {
            "page": row,
            "links": [
                {"to_page_id": t, "text": x, "url": url_of.get(t)}
                for t, x in zip(out["to_page_id"], out["text"])
            ],
        }

    # -- reporting ----------------------------------------------------------

    def top_hosts(self, k: int = 10):
        """Hosts by page count (groupby-count → top-k)."""
        return (
            self.pages.groupby("host")
            .count()
            .sort(["count()", "host"], descending=[True, False])
            .limit(k)
        )
