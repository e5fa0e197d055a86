"""Extract-emit stage: fetched pages → union-schema emission rows.

The flagship 1→N ``map_batches`` transform (E1/M2/M4/M6,
``pkg/linkprocessor/linkprocessor.go:127-168``).  One input row (a
processed frontier entry, possibly with html) produces:

- exactly one ``visit`` row (crawl record: status, round, seq)
- one ``text`` row when fetched ok (the north-rule per-url document text)
- one ``link`` row per surviving anchor (resolved + filtered)

Everything lands in ONE union-schema output so the round has a single
Parquet sink — downstream consumers (frontier probe, links/pages
compaction, text parity checks) read column-pruned, row-type-filtered
slices of it instead of re-running the pipeline.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.filters import FilterConfig, DEFAULT_FILTERS
from ..functions.hashing import bucket_for
from ..functions.links import extract_links
from ..functions.urlnorm import parse
from .canonicalize import child_seq

__all__ = ["EMISSIONS_SCHEMA", "make_extract_emitter", "emit_key_self", "emit_key_link"]

EMISSIONS_SCHEMA = pa.schema(
    [
        ("row_type", pa.string()),  # visit | text | link
        ("round", pa.int32()),
        ("bucket", pa.int32()),  # emitter's host bucket
        ("page_id", pa.string()),  # emitter
        ("url", pa.string()),
        ("hostname", pa.string()),
        ("host", pa.string()),
        ("path", pa.string()),
        ("seq", pa.string()),
        ("depth", pa.int32()),
        ("status", pa.string()),
        ("anchor_idx", pa.int32()),
        ("emit_key", pa.string()),
        ("to_page_id", pa.string()),
        ("to_url", pa.string()),
        ("to_hostname", pa.string()),
        ("to_host", pa.string()),
        ("to_path", pa.string()),
        ("to_bucket", pa.int32()),
        ("candidate_seq", pa.string()),
        ("text", pa.string()),
    ]
)


def emit_key_self(rnd: int, seq: str) -> str:
    """Emission-order key of a page's own row (emitted at visit time)."""
    return f"{rnd:06d}|{seq}"


def emit_key_link(rnd: int, parent_seq: str, anchor_idx: int) -> str:
    """Emission-order key of a link / target-page row.  Sorts after the
    parent's self key ('seq' < 'seq.NNNNNNN' lexicographically) and in
    anchor order within one page — reproducing the reference's exact
    sequential emission order for first-wins conflicts."""
    return f"{rnd:06d}|{child_seq(parent_seq, anchor_idx)}"


def make_extract_emitter(
    rnd: int,
    num_buckets: int,
    filters: FilterConfig = DEFAULT_FILTERS,
    bucket_mode: str = "host",
):
    """Build the per-round extract/emit batch UDF (stateless tasks)."""

    def extract_emit(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in EMISSIONS_SCHEMA.names}

        def emit(**kw) -> None:
            for name in EMISSIONS_SCHEMA.names:
                cols[name].append(kw.get(name))

        n = batch.num_rows
        get = {
            name: batch[name].to_pylist()
            for name in ("url", "page_id", "hostname", "host", "path", "bucket", "seq", "depth", "status", "html")
        }
        for i in range(n):
            base_kw = dict(
                round=rnd,
                bucket=get["bucket"][i],
                page_id=get["page_id"][i],
                url=get["url"][i],
                hostname=get["hostname"][i],
                host=get["host"][i],
                path=get["path"][i],
                seq=get["seq"][i],
                depth=get["depth"][i],
                status=get["status"][i],
            )
            # non-link rows carry to_bucket=-1 so the round sink can be
            # hive-partitioned on to_bucket (links land pre-partitioned
            # for the frontier probe; -1 holds visit/text rows)
            emit(row_type="visit", to_bucket=-1, **base_kw)
            if get["status"][i] != "ok":
                continue
            base_url = parse(get["url"][i])
            links, doc_text = extract_links(base_url, get["html"][i], filters)
            emit(row_type="text", text=doc_text, to_bucket=-1, **base_kw)
            for link in links:
                emit(
                    row_type="link",
                    anchor_idx=link.anchor_index,
                    emit_key=emit_key_link(rnd, get["seq"][i], link.anchor_index),
                    to_page_id=link.to_page_id,
                    to_url=link.to_url,
                    to_hostname=link.to_hostname,
                    to_host=link.to_host,
                    to_path=link.to_escaped_path,
                    to_bucket=bucket_for(link.to_hostname, link.to_page_id, num_buckets, bucket_mode),
                    candidate_seq=child_seq(get["seq"][i], link.anchor_index),
                    text=link.text,
                    **base_kw,
                )
        return pa.Table.from_pydict(cols, schema=EMISSIONS_SCHEMA)

    return extract_emit
