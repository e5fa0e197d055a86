"""Sitemap-protocol (sitemaps.org XML) sink / source.

The reference crawler discovers URLs only through anchor extraction
(`/root/reference/pkg/linkprocessor/linkprocessor.go` — no sitemap
handling); real crawl seeding leans on `sitemap.xml`, so this module
adds the protocol as a first-class frontier format:

- :func:`write_sitemaps` — distributed sink: pages group by host
  (one bucketed exchange on host hash), each host emits
  ``<urlset>`` shards capped at the protocol's 50 000-URL limit plus
  a per-host ``<sitemapindex>`` when sharded.  Shard bytes are
  deterministic (sorted URLs, fixed header) and written tmp+rename
  under content-hash names — the same idempotent-sink contract as the
  Parquet / WARC / TFRecord sinks.
- :func:`parse_sitemap` — stdlib ``xml.etree`` parse of either a
  ``<urlset>`` (returns page URLs + optional lastmod) or a
  ``<sitemapindex>`` (returns child sitemap URLs), namespace-tolerant.
- :func:`read_sitemaps` — distributed source over a shard directory,
  one parse per file inside ``map_batches``, emitting
  ``(url:string, lastmod_us:timestamp[us])`` frontier-seed rows.

Scale shape: the sink's only exchange is the host groupby (the same
host-hash partitioning key the crawl frontier already uses, so at
100 TB this co-locates with the page sink's layout instead of adding
a second shuffle); shard files are bounded by the protocol cap, never
one giant file.  The source parallelizes per shard.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import xml.etree.ElementTree as ET

import pyarrow as pa

__all__ = [
    "encode_urlset",
    "parse_sitemap",
    "read_sitemaps",
    "write_sitemaps",
]

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
URLS_PER_FILE = 50_000  # sitemaps.org hard cap


def _lastmod(us: int) -> str:
    """Epoch-microseconds -> W3C datetime (UTC, second precision —
    lastmod is advisory; sub-second fidelity rides the WARC sink)."""
    from .warc import _warc_date

    return _warc_date(us - us % 1_000_000).decode()[:-8] + "Z"


def _parse_lastmod(s: str) -> int:
    """W3C datetime (date-only, full, or ±hh:mm offset) -> epoch µs."""
    from .warc import _parse_warc_date

    s = s.strip()
    if "T" not in s:
        return _parse_warc_date((s + "T00:00:00Z").encode())
    date, _, clock = s.partition("T")
    off_us = 0
    if clock.endswith("Z"):
        clock = clock[:-1]
    else:
        for sign in "+-":
            if sign in clock:
                clock, _, tz = clock.partition(sign)
                hh, _, mm = tz.partition(":")
                off_us = (int(hh) * 3600 + int(mm or 0) * 60) * 1_000_000
                if sign == "+":  # local ahead of UTC → earlier instant
                    off_us = -off_us
                break
    return _parse_warc_date((date + "T" + clock + "Z").encode()) + off_us


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("'", "&apos;")
    )


def encode_urlset(rows: list[tuple[str, int | None]]) -> bytes:
    """Encode ``(url, epoch_us_or_None)`` rows as a ``<urlset>``
    document.  Caller orders rows; bytes are deterministic."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        f'<urlset xmlns="{_NS}">\n',
    ]
    for url, us in rows:
        parts.append("<url><loc>%s</loc>" % _esc(url))
        if us is not None:
            parts.append("<lastmod>%s</lastmod>" % _lastmod(us))
        parts.append("</url>\n")
    parts.append("</urlset>\n")
    return "".join(parts).encode()


def _encode_index(sitemap_urls: list[str]) -> bytes:
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        f'<sitemapindex xmlns="{_NS}">\n',
    ]
    for u in sitemap_urls:
        parts.append("<sitemap><loc>%s</loc></sitemap>\n" % _esc(u))
    parts.append("</sitemapindex>\n")
    return "".join(parts).encode()


def parse_sitemap(blob: bytes) -> tuple[str, list[str], list[int | None]]:
    """Parse sitemap XML.  Returns ``(kind, urls, lastmod_us)`` where
    kind is ``"urlset"`` or ``"sitemapindex"`` (index entries have no
    lastmod requirement; missing lastmod is None).  Foreign namespaces
    and no-namespace documents both parse."""
    root = ET.fromstring(blob)
    tag = root.tag.rsplit("}", 1)[-1]
    if tag not in ("urlset", "sitemapindex"):
        raise ValueError(f"sitemap: unexpected root element <{tag}>")
    urls: list[str] = []
    mods: list[int | None] = []
    for child in root:
        loc = mod = None
        for f in child:
            name = f.tag.rsplit("}", 1)[-1]
            if name == "loc":
                loc = (f.text or "").strip()
            elif name == "lastmod":
                mod = _parse_lastmod(f.text or "")
        if loc:
            urls.append(loc)
            mods.append(mod)
    return tag, urls, mods


def write_sitemaps(
    ds,
    out_dir: str,
    url_col: str = "url",
    ts_col: str | None = "warc_ts",
    host_col: str | None = None,
    clean: bool = True,
    urls_per_file: int = URLS_PER_FILE,
) -> str:
    """Distributed sitemap sink: pages bucket by host, each host writes
    sorted ``<urlset>`` shards (≤50 000 URLs each, protocol cap) plus a
    ``<sitemapindex>`` when sharded.  File names embed the host and a
    content hash; writes are tmp+rename idempotent."""
    import ray.data  # noqa: F401  (ds is already a Dataset)

    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def host_of(t: pa.Table) -> pa.Table:
        if host_col is not None:
            hosts = t[host_col].to_pylist()
        else:
            hosts = [
                u.split("/", 3)[2] if "://" in u else u.split("/", 1)[0]
                for u in t[url_col].to_pylist()
            ]
        return t.append_column("_smhost", pa.array(hosts, pa.string()))

    def emit(group: "pa.Table") -> pa.Table:
        host = group["_smhost"][0].as_py()
        urls = group[url_col].to_pylist()
        if ts_col is not None:
            ts = group[ts_col]
            if pa.types.is_timestamp(ts.type):
                ts = ts.cast(pa.int64())
            mods = ts.to_pylist()
        else:
            mods = [None] * len(urls)
        # null lastmod sorts before any set one for the same URL — a
        # plain tuple sort falls through to None < int and dies when a
        # re-fetched URL has mixed-null timestamps
        rows = sorted(
            zip(urls, mods),
            key=lambda r: (r[0], r[1] is not None, r[1] or 0),
        )
        names: list[str] = []
        for i in range(0, len(rows), urls_per_file):
            blob = encode_urlset(rows[i : i + urls_per_file])
            h = hashlib.sha1(blob).hexdigest()[:16]
            name = f"sitemap-{host}-{h}.xml"
            final = os.path.join(out_dir, name)
            if not os.path.exists(final):
                tmp = final + f".tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, final)
            names.append(name)
        if len(names) > 1:
            blob = _encode_index([f"https://{host}/{n}" for n in names])
            final = os.path.join(out_dir, f"sitemapindex-{host}.xml")
            tmp = final + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, final)
        return pa.table(
            {"host": [host], "files": [len(names)],
             "urls": [len(rows)]}
        )

    return_ds = (
        ds.map_batches(host_of, batch_format="pyarrow")
        .groupby("_smhost")
        .map_groups(emit, batch_format="pyarrow")
    )
    return_ds.materialize()
    return out_dir


def read_sitemaps(path: str):
    """Distributed sitemap source: parse every ``<urlset>`` shard under
    ``path`` back to ``(url:string, lastmod_us:timestamp[us])`` frontier
    seeds (index files are skipped — their children are already local
    shards; a live crawler would instead enqueue child fetches)."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        mods: list[int | None] = []
        for blob in batch["bytes"].to_pylist():
            kind, u, m = parse_sitemap(blob)
            if kind == "urlset":
                urls.extend(u)
                mods.extend(m)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "lastmod_us": pa.array(mods, pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    return ray.data.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow"
    )
