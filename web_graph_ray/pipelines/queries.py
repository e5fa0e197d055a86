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

Two serving modes:

- **indexed** (after ``engine.compact()``): each lookup reads exactly
  one per-bucket, key-sorted index file with a pushed-down filter —
  the Parquet analogue of the reference's B-tree indexes
  (``idx_to_page_id`` / ``idx_page_host``,
  ``pkg/linkstorage/linkstorage.go:119-127``).  O(one file / one row
  group) per query; the right shape for a serving workload.
- **scan fallback** (no committed index, or stale after more rounds):
  the pages/links first-wins compactions are materialized once and
  filtered per query — fine for one-shot analysis, not serving.

Limits are applied after a deterministic sort so results are
reproducible (the reference relies on implicit Postgres scan order; we
pin it).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..functions.filters import parse_url
from ..functions.hashing import hash64
from ..functions.urlnorm import page_id_from_parts
from ..state.checkpoint import bucket_file
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
    def __init__(self, engine: CrawlEngine, use_index: bool | None = None):
        """``use_index``: None = auto (serve from a committed,
        non-stale index when one exists, else scan); True = require the
        index; False = always scan."""
        self.engine = engine
        self._pages = None
        self._links = None
        self._use_index = use_index

    # -- index plumbing -----------------------------------------------------

    def _index(self) -> dict | None:
        if self._use_index is False:
            return None
        m = self.engine.index_manifest()
        if m is None and self._use_index is True:
            raise RuntimeError(
                "use_index=True but no committed (current) index — "
                "run engine.compact() first"
            )
        return m

    def _idx_read(
        self, m: dict, name: str, bucket_key: str, flt, columns: list[str]
    ) -> pa.Table:
        """One-bucket index read: the file is found by the same stable
        hash a compact() write used; ``flt`` prunes row groups inside
        it (key-sorted + small row groups ⇒ near-point read)."""
        f = bucket_file(
            os.path.join(self.engine.work, "index", name),
            hash64(bucket_key) % m["num_buckets"],
        )
        if not os.path.exists(f):  # no row ever hashed here
            return pa.Table.from_pydict(
                {c: pa.array([], type=pa.string()) for c in columns}
            )
        return pq.read_table(f, columns=columns, filters=flt)

    # -- counts (A1; exact, strictly stronger than reltuples) ---------------

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

    def count_pages(self) -> int:
        m = self._index()
        if m is not None:
            return m["n_pages"]
        return self.pages.count()

    def count_links(self) -> int:
        m = self._index()
        if m is not None:
            return m["n_links"]
        return self.links.count()

    # -- point lookups ------------------------------------------------------

    def page(self, page_id: str) -> dict | None:
        """A5: /page/:id core — url of a page id, None if absent."""
        m = self._index()
        if m is not None:
            t = self._idx_read(
                m, "pages_by_id", page_id,
                pc.field("page_id") == page_id,
                ["page_id", "host", "path", "url"],
            )
            return None if t.num_rows == 0 else {
                c: t[c][0].as_py() for c in t.column_names
            }
        rows = self.pages.filter(expr=f"page_id == {page_id!r}").take(1)
        return rows[0] if rows else None

    def page_exists(self, page_id: str) -> bool:
        return self.page(page_id) is not None

    def first_page(self) -> dict | None:
        """Any single page row (id/host/url) — the UI's default entry
        point when no ?url= / ?id= start is given.  Indexed mode scans
        bucket files until one exists and reads a single row from it;
        scan mode takes one row off the materialized pages view."""
        m = self._index()
        if m is not None:
            base = os.path.join(self.engine.work, "index", "pages_by_id")
            for b in range(m["num_buckets"]):
                f = bucket_file(base, b)
                if os.path.exists(f):
                    t = pq.ParquetFile(f)
                    batch = next(
                        t.iter_batches(
                            batch_size=1, columns=["page_id", "host", "url"]
                        )
                    )
                    row = batch.to_pylist()[0]
                    return row
            return None
        rows = self.pages.take(1)
        if not rows:
            return None
        return {k: rows[0][k] for k in ("page_id", "host", "url")}

    def link_exists(self, from_id: str, to_id: str) -> bool:
        m = self._index()
        if m is not None:
            t = self._idx_read(
                m, "links_from", from_id,
                (pc.field("from_page_id") == from_id)
                & (pc.field("to_page_id") == to_id),
                ["to_page_id"],
            )
            return t.num_rows > 0
        rows = self.links.filter(
            expr=f"from_page_id == {from_id!r} and to_page_id == {to_id!r}"
        ).take(1)
        return bool(rows)

    def pages_by_host(self, host: str, limit: int = QUERY_LIMIT):
        """A2: page ids on a host (hostname, port-stripped — the pages
        table's host column is u.Hostname(), linkstorage.go:489)."""
        m = self._index()
        if m is not None:
            t = self._idx_read(
                m, "pages_by_host", host, pc.field("host") == host,
                ["page_id", "url"],
            )  # file sorted by (host, page_id) ⇒ slice is the sorted head
            return ray.data.from_arrow(t.slice(0, limit))
        return (
            self.pages.filter(expr=f"host == {host!r}")
            .sort("page_id")
            .limit(limit)
            .select_columns(["page_id", "url"])
        )

    def links_from(self, page_id: str, limit: int = QUERY_LIMIT):
        """A3: forward adjacency."""
        m = self._index()
        if m is not None:
            t = self._idx_read(
                m, "links_from", page_id, pc.field("from_page_id") == page_id,
                ["to_page_id", "text"],
            )
            return ray.data.from_arrow(t.slice(0, limit))
        return (
            self.links.filter(expr=f"from_page_id == {page_id!r}")
            .sort("to_page_id")
            .limit(limit)
            .select_columns(["to_page_id", "text"])
        )

    def links_to(self, page_id: str, limit: int = QUERY_LIMIT):
        """A4: backlinks (the reference needs idx_to_page_id for this;
        the links_to index is its materialized equivalent)."""
        m = self._index()
        if m is not None:
            t = self._idx_read(
                m, "links_to", page_id, pc.field("to_page_id") == page_id,
                ["from_page_id", "text"],
            )
            return ray.data.from_arrow(t.slice(0, limit))
        return (
            self.links.filter(expr=f"to_page_id == {page_id!r}")
            .sort("from_page_id")
            .limit(limit)
            .select_columns(["from_page_id", "text"])
        )

    def _urls_of(self, ids: list[str]) -> dict[str, str]:
        """Resolve page ids → urls.  Indexed: ids grouped by bucket, one
        pruned read per touched bucket (≤ limit ids ⇒ a handful of
        files).  Fallback: broadcast is_in over the materialized pages."""
        if not ids:
            return {}
        m = self._index()
        if m is not None:
            by_bucket: dict[int, list[str]] = {}
            for i in set(ids):
                by_bucket.setdefault(hash64(i) % m["num_buckets"], []).append(i)
            url_of: dict[str, str] = {}
            for b, group in by_bucket.items():
                f = bucket_file(
                    os.path.join(self.engine.work, "index", "pages_by_id"), b
                )
                if not os.path.exists(f):
                    continue
                t = pq.read_table(
                    f, columns=["page_id", "url"],
                    filters=pc.field("page_id").isin(sorted(group)),
                )
                url_of.update(
                    zip(t["page_id"].to_pylist(), t["url"].to_pylist())
                )
            return url_of
        value_set = pa.array(sorted(set(ids)))
        hits = self.pages.map_batches(
            lambda t: t.filter(pc.is_in(t["page_id"], value_set=value_set)),
            batch_format="pyarrow",
        ).take_all()
        return {r["page_id"]: r["url"] for r in hits}

    def page_with_links(self, page_id: str, limit: int = QUERY_LIMIT) -> dict | None:
        """The /page/:id composite (main.go:91-133): page row + outlinks
        resolved to urls (the API joins app-side; we join datasets)."""
        row = self.page(page_id)
        if row is None:
            return None
        out = self.links_from(page_id, limit).to_pandas()
        if not len(out):  # Ray drops the schema of all-empty results
            return {"page": row, "links": []}
        url_of = self._urls_of(list(out["to_page_id"]))
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

    def anchor_summary(self):
        """Per-target anchor-text aggregation — in-link count, distinct
        anchor texts, and the modal anchor (count desc, text asc
        tie-break) per to_page_id.  The link-based document-expansion
        signal the reference's schema carries (links.text,
        linkstorage.go links table) but never aggregates.

        Scale shape: one bucketed (target, text) count (combiner in
        each batch) then a target-keyed fold; link rows never reach
        the driver.  Returns a Dataset of
        (to_page_id, in_links, n_texts, top_text)."""
        import pandas as pd

        from ..stages.relational import bucketed_agg, bucketed_group_map

        proj = self.links.map_batches(
            lambda t: t.select(["to_page_id", "text"]), batch_format="pyarrow"
        )
        counts = bucketed_agg(proj, ["to_page_id", "text"], out_col="n")

        def per_target(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(
                ["to_page_id", "n", "text"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            return df.groupby("to_page_id", as_index=False).agg(
                in_links=("n", "sum"),
                n_texts=("text", "size"),
                top_text=("text", "first"),
            )

        return bucketed_group_map(counts, ["to_page_id"], per_target)

    def host_edges(self):
        """Host-level collapse of the page graph: link count per
        (from_host, to_host) — the aggregate view site-level analytics
        and politeness budgeting run on.  Link rows carry only page
        ids, so both endpoints attach via co-partitioned
        bucket_hash_joins against pages (no broadcast at any graph
        size), then one bucketed count.  Returns a Dataset of
        (from_host, to_host, n_edges)."""
        from ..stages.relational import bucket_hash_join, bucketed_agg

        links = self.links.map_batches(
            lambda t: pa.table(
                {
                    "page_id": t["from_page_id"].combine_chunks(),
                    "to_page_id": t["to_page_id"].combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        )
        pages_from = self.pages.map_batches(
            lambda t: pa.table(
                {
                    "page_id": t["page_id"].combine_chunks(),
                    "from_host": t["host"].combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        )
        pages_to = self.pages.map_batches(
            lambda t: pa.table(
                {
                    "to_page_id": t["page_id"].combine_chunks(),
                    "to_host": t["host"].combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        )
        j = bucket_hash_join(links, pages_from, ["page_id"])
        j = bucket_hash_join(
            j.map_batches(
                lambda t: t.select(["to_page_id", "from_host"]),
                batch_format="pyarrow",
            ),
            pages_to,
            ["to_page_id"],
        )
        return bucketed_agg(
            j.map_batches(
                lambda t: t.select(["from_host", "to_host"]),
                batch_format="pyarrow",
            ),
            ["from_host", "to_host"],
            out_col="n_edges",
        )
