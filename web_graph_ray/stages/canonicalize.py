"""Canonicalize stage: URL strings → identity/partition columns.

The vectorized form of M1 (``linkutils.ParseURL``) + M3 (``Hash``) +
F1–F3 (``ScrapeDaTing``) from ``pkg/linkutils/linkutils.go``, applied
as ``map_batches`` UDFs over Arrow batches.  Per-row work is a pure
Python URL parse (Go-parity parser, see functions/urlnorm.py) — the
strings are small; cost is dominated by fetch/extract downstream.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.filters import FilterConfig, DEFAULT_FILTERS, parse_url
from ..functions.hashing import bucket_for
from ..functions.urlnorm import page_id_from_parts
from ..state.checkpoint import atomic_write_parquet

__all__ = ["FRONTIER_SCHEMA", "canonicalize_corpus_batch", "seed_frontier_rows"]


SEQ_PAD = 7  # per-level width of hierarchical seq strings (≤10^7 anchors/page)


def seed_seq(i: int) -> str:
    return f"{i:0{SEQ_PAD}d}"


def child_seq(parent_seq: str, anchor_index: int) -> str:
    return f"{parent_seq}.{anchor_index:0{SEQ_PAD}d}"


FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("page_id", pa.string()),
        ("hostname", pa.string()),
        ("host", pa.string()),
        ("path", pa.string()),
        ("bucket", pa.int32()),
        ("seq", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("discovered_from", pa.string()),
    ]
)


def make_corpus_canonicalizer(num_buckets: int, bucket_mode: str = "host"):
    """Batch UDF for the one-time corpus index build: adds
    page_id/hostname/path/bucket columns; drops unparseable URLs.
    Corpus rows are NOT run through the admission filters — the corpus
    is whatever was captured; filters gate the *frontier*."""
    from ..functions.urlnorm import URLError, parse

    def canonicalize_corpus_batch(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        ids, hostnames, paths, buckets, keep = [], [], [], [], []
        for i, s in enumerate(urls):
            try:
                u = parse(s)
            except URLError:
                continue
            hn = u.hostname()
            ep = u.escaped_path()
            keep.append(i)
            pid = page_id_from_parts(hn, ep)
            ids.append(pid)
            hostnames.append(hn)
            paths.append(ep)
            buckets.append(bucket_for(hn, pid, num_buckets, bucket_mode))
        out = batch.take(pa.array(keep, type=pa.int64()))
        out = out.append_column("page_id", pa.array(ids, type=pa.string()))
        out = out.append_column("hostname", pa.array(hostnames, type=pa.string()))
        out = out.append_column("path", pa.array(paths, type=pa.string()))
        out = out.append_column("bucket", pa.array(buckets, type=pa.int32()))
        return out

    return canonicalize_corpus_batch


def seed_frontier_rows(
    seeds: list[str],
    num_buckets: int,
    filters: FilterConfig = DEFAULT_FILTERS,
    bucket_mode: str = "host",
) -> pa.Table:
    """Seed list → round-0 frontier table (ordered, id-deduped — the
    reference's seed loop at ``cmd/link-processor/main.go:55-101``
    enqueues in list order through the LRU-guarded EnQueue)."""
    rows = {k: [] for k in FRONTIER_SCHEMA.names}
    seen: set[str] = set()
    for i, s in enumerate(seeds):
        u = parse_url(s, filters)
        if u is None:
            continue
        hn = u.hostname()
        ep = u.escaped_path()
        pid = page_id_from_parts(hn, ep)
        if pid in seen:
            continue
        seen.add(pid)
        rows["url"].append(u.string())
        rows["page_id"].append(pid)
        rows["hostname"].append(hn)
        rows["host"].append(u.host)
        rows["path"].append(ep)
        rows["bucket"].append(bucket_for(hn, pid, num_buckets, bucket_mode))
        rows["seq"].append(seed_seq(i))
        rows["depth"].append(0)
        rows["priority"].append(0)
        rows["discovered_from"].append("")
    return pa.Table.from_pydict(rows, schema=FRONTIER_SCHEMA)


def write_frontier_by_bucket(table: pa.Table, out_dir: str) -> int:
    """Split a frontier table by bucket into atomic per-bucket files."""
    import pyarrow.compute as pc

    n = 0
    for bucket in pc.unique(table["bucket"]).to_pylist():
        part = table.filter(pc.equal(table["bucket"], bucket))
        part = part.sort_by("seq")
        atomic_write_parquet(part, f"{out_dir}/bucket={bucket:04d}.parquet")
        n += part.num_rows
    return n
