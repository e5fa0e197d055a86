"""Sequential oracle simulator — the canonical crawl semantics.

A tiny, obviously-correct pure-Python implementation of the reference
crawler's canonical single-consumer semantics
(``pkg/linkprocessor/linkprocessor.go:172-216``: FIFO queue +
check-then-mark seen set + first-wins sinks), extended with the
engine's deterministic round/politeness/robots model.  The Ray engine
must reproduce this oracle's visit order, seen set, pages/links tables
and per-round counters exactly (SURVEY.md §5).

Two implementations are provided:

- ``run_oracle``      — round-based (rounds, politeness budget, robots),
                        the engine's semantics.
- ``run_fifo_oracle`` — straight FIFO loop, literally transcribing the
                        reference's queue semantics (no rounds).

For budget=None and robots off the two must agree on everything
(asserted in tests), proving the round-based formulation IS the
reference's BFS.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import pyarrow as pa

from web_graph_ray.functions.filters import FilterConfig, DEFAULT_FILTERS, happy_content_type, parse_url
from web_graph_ray.functions.links import extract_links, extract_links_full
from web_graph_ray.functions.urlnorm import page_id_from_parts
from web_graph_ray.state.politeness import RobotsRules, parse_robots

SEQ_PAD = 7  # fixed per-level width of hierarchical seq strings


def seed_seq(i: int) -> str:
    return f"{i:0{SEQ_PAD}d}"


def child_seq(parent_seq: str, anchor_index: int) -> str:
    return f"{parent_seq}.{anchor_index:0{SEQ_PAD}d}"


@dataclass
class OracleResult:
    visits: list[dict] = field(default_factory=list)
    pages: list[dict] = field(default_factory=list)
    links: list[dict] = field(default_factory=list)
    texts: dict = field(default_factory=dict)  # url -> extracted doc text
    counters: list[dict] = field(default_factory=list)
    frontiers: list[list[str]] = field(default_factory=list)  # per-round page_ids in order


def corpus_index(pages: pa.Table) -> dict[str, dict]:
    """Index the corpus by page_id (fetch is identity-keyed: any URL
    variant of a page retrieves the one stored capture — first capture
    by warc_ts wins on id collisions)."""
    from web_graph_ray.functions.urlnorm import URLError, parse

    idx: dict[str, dict] = {}
    order = pa.compute.sort_indices(pages, sort_keys=[("warc_ts", "ascending")])
    for i in order.to_pylist():
        url = pages["url"][i].as_py()
        try:
            u = parse(url)
        except URLError:
            continue
        pid = page_id_from_parts(u.hostname(), u.escaped_path())
        if pid not in idx:
            idx[pid] = {
                "url": url,
                "html": pages["html"][i].as_py(),
                "content_type": (
                    pages["content_type"][i].as_py()
                    if "content_type" in pages.column_names
                    else "text/html"
                ),
            }
    return idx


def robots_from_corpus(pages: pa.Table) -> RobotsRules:
    bodies: dict[str, str] = {}
    for i in range(pages.num_rows):
        url = pages["url"][i].as_py()
        if url.endswith("/robots.txt"):
            from web_graph_ray.functions.urlnorm import parse

            host = parse(url).hostname()
            if host not in bodies:
                bodies[host] = pages["html"][i].as_py().decode("utf-8", "replace")
    return RobotsRules.from_bodies(bodies)


class _Sinks:
    """First-wins pages/links sinks (Postgres ON CONFLICT DO NOTHING,
    ``pkg/linkstorage/linkstorage.go:412,493``)."""

    def __init__(self) -> None:
        self.pages: list[dict] = []
        self.links: list[dict] = []
        self._page_ids: set[str] = set()
        self._link_keys: set[tuple[str, str]] = set()

    def put_page(self, pid: str, host: str, path: str, url: str) -> None:
        if pid not in self._page_ids:
            self._page_ids.add(pid)
            self.pages.append({"page_id": pid, "host": host, "path": path, "url": url})

    def put_link(self, from_id: str, to_id: str, text: str) -> None:
        key = (from_id, to_id)
        if key not in self._link_keys:
            self._link_keys.add(key)
            self.links.append({"from_page_id": from_id, "to_page_id": to_id, "text": text})


def _fetch(idx: dict, pid: str, cfg: FilterConfig) -> tuple[str, dict | None]:
    row = idx.get(pid)
    if row is None:
        return "dead", None
    if not happy_content_type(row["content_type"], cfg):
        return "bad_content_type", None
    return "ok", row


def _priority(depth: int, mode: str) -> int:
    if mode == "shallow_first":
        return depth
    if mode == "deep_first":
        return -depth
    return 0


def run_oracle(
    pages: pa.Table,
    seeds: list[str],
    budget: int | None = None,
    respect_robots: bool = False,
    max_rounds: int | None = None,
    max_pages: int | None = None,
    filters: FilterConfig = DEFAULT_FILTERS,
    priority_mode: str = "fifo",
    seen_ttl_rounds: int | None = None,
) -> OracleResult:
    """Round-based canonical semantics (the engine's contract).

    ``seen_ttl_rounds`` models the reference's 48 h LinkCache expiry
    (``pkg/linkcache/linkcache.go:23``) in virtual time: a page is
    *seen* iff its last frontier-membership round is within the last
    ``ttl`` rounds; an expired page is re-enqueued and re-crawled.
    Deviation from the reference (documented): frontier membership
    (incl. deferral) refreshes the TTL, so a page can never appear
    twice in one frontier — the reference's raw queue could.
    """
    idx = corpus_index(pages)
    robots = robots_from_corpus(pages) if respect_robots else RobotsRules()
    res = OracleResult()
    sinks = _Sinks()
    visited: set[str] = set()
    enqueued: set[str] = set()
    last_member: dict[str, int] = {}  # pid -> latest frontier round (TTL mode)

    # --- seed round (cmd/link-processor/main.go:55-101: ordered, deduped)
    frontier: list[dict] = []  # rows: url,page_id,hostname,host,path,seq
    for i, s in enumerate(seeds):
        u = parse_url(s, filters)
        if u is None:
            continue  # engine policy: invalid seeds are skipped
        pid = page_id_from_parts(u.hostname(), u.escaped_path())
        if pid in enqueued:
            continue
        enqueued.add(pid)
        last_member[pid] = 0
        frontier.append(
            {
                "url": u.string(),
                "page_id": pid,
                "hostname": u.hostname(),
                "host": u.host,
                "path": u.escaped_path(),
                "seq": seed_seq(i),
                "priority": _priority(0, priority_mode),
            }
        )

    visit_seq = 0
    rnd = 0
    processed_total = 0
    while frontier and (max_rounds is None or rnd < max_rounds):
        if max_pages is not None and processed_total >= max_pages:
            break
        frontier.sort(key=lambda r: (r["priority"], r["seq"]))
        res.frontiers.append([r["page_id"] for r in frontier])
        counters = {
            "round": rnd,
            "admitted": 0,
            "fetched": 0,
            "dead": 0,
            "robots_denied": 0,
            "deferred": 0,
            "discovered": 0,
            "deduped": 0,
            "rejected": 0,
        }
        next_frontier: list[dict] = []
        host_used: dict[str, int] = {}
        # crawl cap = a pure prefix of the round's frontier in seq order
        # (so the distributed engine can compute the cap boundary from the
        # frontier alone, before any per-host admission logic)
        remaining = None if max_pages is None else max_pages - processed_total

        for rank, row in enumerate(frontier):
            if remaining is not None and rank >= remaining:
                counters["deferred"] += 1
                next_frontier.append(row)
                last_member[row["page_id"]] = rnd + 1  # deferral refreshes TTL
                continue
            # politeness budget (deterministic virtual time)
            if budget is not None:
                used = host_used.get(row["hostname"], 0)
                if used >= budget:
                    counters["deferred"] += 1
                    next_frontier.append(row)
                    last_member[row["page_id"]] = rnd + 1
                    continue
                host_used[row["hostname"]] = used + 1
            processed_total += 1
            # robots gate
            if respect_robots and not robots.is_allowed(row["hostname"], row["path"]):
                counters["robots_denied"] += 1
                visited.add(row["page_id"])
                res.visits.append(
                    {
                        "page_id": row["page_id"],
                        "url": row["url"],
                        "depth": row["seq"].count(".") ,
                        "visit_seq": visit_seq,
                        "round": rnd,
                        "status": "robots_denied",
                    }
                )
                visit_seq += 1
                continue

            # --- ProcessURL (linkprocessor.go:172-216)
            pid = row["page_id"]
            counters["admitted"] += 1
            visited.add(pid)
            sinks.put_page(pid, row["hostname"], row["path"], row["url"])
            status, page = _fetch(idx, pid, filters)
            res.visits.append(
                {
                    "page_id": pid,
                    "url": row["url"],
                    "depth": row["seq"].count("."),
                    "visit_seq": visit_seq,
                    "round": rnd,
                    "status": status,
                }
            )
            visit_seq += 1
            if status != "ok":
                counters["dead"] += 1
                continue
            counters["fetched"] += 1

            from web_graph_ray.functions.urlnorm import parse as go_parse

            base = go_parse(row["url"])
            links, doc_text, rejects = extract_links_full(base, page["html"], filters)
            counters["rejected"] += len(rejects)
            res.texts[row["url"]] = doc_text
            for link in links:
                tid = link.to_page_id
                if seen_ttl_rounds is not None:
                    # TTL gate: seen iff last frontier membership is
                    # within the horizon (LinkCache semantics — the
                    # visited set does NOT block re-crawl after expiry)
                    lm = last_member.get(tid)
                    seen = lm is not None and lm > rnd - seen_ttl_rounds
                else:
                    seen = tid in visited or tid in enqueued
                if not seen:
                    enqueued.add(tid)
                    last_member[tid] = rnd + 1
                    counters["discovered"] += 1
                    cseq = child_seq(row["seq"], link.anchor_index)
                    next_frontier.append(
                        {
                            "url": link.to_url,
                            "page_id": tid,
                            "hostname": link.to_hostname,
                            "host": link.to_host,
                            "path": link.to_escaped_path,
                            "seq": cseq,
                            "priority": _priority(cseq.count("."), priority_mode),
                        }
                    )
                else:
                    counters["deduped"] += 1
                if tid not in visited or seen_ttl_rounds is not None:
                    sinks.put_page(tid, link.to_hostname, link.to_escaped_path, link.to_url)
                sinks.put_link(pid, tid, link.text)

        res.counters.append(counters)
        frontier = next_frontier
        rnd += 1

    res.pages = sinks.pages
    res.links = sinks.links
    return res


def run_fifo_oracle(
    pages: pa.Table,
    seeds: list[str],
    filters: FilterConfig = DEFAULT_FILTERS,
) -> OracleResult:
    """Literal transcription of the reference's FIFO loop (no rounds,
    no politeness): seedInitialURLs + ProcessURL over a FIFO queue."""
    idx = corpus_index(pages)
    res = OracleResult()
    sinks = _Sinks()
    visited: set[str] = set()
    enqueued: set[str] = set()
    queue: deque[tuple[str, int]] = deque()

    for s in seeds:
        u = parse_url(s, filters)
        if u is None:
            continue
        pid = page_id_from_parts(u.hostname(), u.escaped_path())
        if pid in enqueued:
            continue
        enqueued.add(pid)
        queue.append((u.string(), 0))

    visit_seq = 0
    while queue:
        url, depth = queue.popleft()
        from web_graph_ray.functions.urlnorm import parse as go_parse

        u = go_parse(url)
        pid = page_id_from_parts(u.hostname(), u.escaped_path())
        if pid in visited:
            continue
        visited.add(pid)
        sinks.put_page(pid, u.hostname(), u.escaped_path(), url)
        status, page = _fetch(idx, pid, filters)
        res.visits.append(
            {
                "page_id": pid,
                "url": url,
                "depth": depth,
                "visit_seq": visit_seq,
                "round": depth,
                "status": status,
            }
        )
        visit_seq += 1
        if status != "ok":
            continue
        links, doc_text = extract_links(u, page["html"], filters)
        res.texts[url] = doc_text
        for link in links:
            tid = link.to_page_id
            if tid not in visited:
                if tid not in enqueued:
                    enqueued.add(tid)
                    queue.append((link.to_url, depth + 1))
                sinks.put_page(tid, link.to_hostname, link.to_escaped_path, link.to_url)
            sinks.put_link(pid, tid, link.text)

    res.pages = sinks.pages
    res.links = sinks.links
    return res
