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
from ..functions.hashing import bucket_for, shard_for
from ..functions.links import extract_links_full
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
        ("priority", pa.int32()),
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
        # per-page curation features (text rows only, when enrich=True)
        ("lang_pred", pa.string()),
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
        ("alpha_ratio", pa.float64()),
        ("digit_ratio", pa.float64()),
        ("simhash", pa.int64()),
    ]
)


def _prio_enc(priority: int) -> str:
    """Offset-encoded priority, fixed width, lexicographically ordered
    (priorities can be negative under non-FIFO modes)."""
    return f"{priority + (1 << 20):07d}"


def emit_key_self(rnd: int, seq: str, priority: int = 0) -> str:
    """Emission-order key of a page's own row (emitted at visit time).
    Sequential emission order within a round is ADMISSION order =
    (priority, seq), so the key embeds both."""
    return f"{rnd:06d}|{_prio_enc(priority)}|{seq}"


def emit_key_link(rnd: int, parent_seq: str, anchor_idx: int, priority: int = 0) -> str:
    """Emission-order key of a link / target-page row.  Sorts after the
    parent's self key ('seq' < 'seq.NNNNNNN' lexicographically) and in
    anchor order within one page — reproducing the reference's exact
    sequential emission order for first-wins conflicts."""
    return f"{rnd:06d}|{_prio_enc(priority)}|{child_seq(parent_seq, anchor_idx)}"


def make_extract_emitter(
    rnd: int,
    num_buckets: int,
    filters: FilterConfig = DEFAULT_FILTERS,
    bucket_mode: str = "host",
    enrich: bool = False,
    splits: dict[int, int] | None = None,
):
    """Build the per-round extract/emit batch UDF (stateless tasks).

    Column construction is vectorized: the base columns of visit/text/
    link rows are Arrow ``take``s of the input batch (zero Python work
    per row); the only Python loop is over actual anchors.  Non-link
    rows carry to_bucket=-1 so the round sink can be hive-partitioned
    on to_bucket (links land pre-partitioned for the frontier probe).
    """
    base_names = (
        "page_id", "url", "hostname", "host", "path", "bucket", "seq",
        "depth", "priority", "status",
    )
    link_names = (
        "anchor_idx", "emit_key", "to_page_id", "to_url", "to_hostname",
        "to_host", "to_path", "to_bucket", "candidate_seq", "text",
    )

    # link/reject rows only need the emitter's page_id + priority
    # downstream (probe: to_*/candidate_seq/priority; links():
    # page_id/to_page_id/text/emit_key; pages(): to_*/emit_key) — the
    # other parent columns are nulled to keep the round sink lean
    # (~200 B/row × millions).
    _LINK_BASE = frozenset({"page_id", "bucket", "priority"})

    def _part(batch: pa.Table, row_type: str, indices, extras: dict) -> pa.Table:
        src = batch.select(base_names) if indices is None else batch.select(base_names).take(indices)
        m = src.num_rows
        arrays = []
        for field in EMISSIONS_SCHEMA:
            if field.name == "row_type":
                arr = pa.array([row_type] * m, type=pa.string())
            elif field.name == "round":
                arr = pa.array([rnd] * m, type=pa.int32())
            elif (
                field.name in base_names
                and field.name not in extras
                and (row_type not in ("link", "reject") or field.name in _LINK_BASE)
            ):
                arr = src[field.name].combine_chunks().cast(field.type)
            elif field.name in extras:
                arr = pa.array(extras[field.name], type=field.type)
            else:
                arr = pa.nulls(m, field.type)
            arrays.append(arr)
        return pa.Table.from_arrays(arrays, schema=EMISSIONS_SCHEMA)

    def extract_emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        statuses = batch["status"].to_pylist()
        urls = batch["url"].to_pylist()
        seqs = batch["seq"].to_pylist()
        prios = batch["priority"].to_pylist()
        htmls = batch["html"].to_pylist() if "html" in batch.column_names else [None] * n

        visits = _part(batch, "visit", None, {"to_bucket": [-1] * n})

        ok_idx = [i for i in range(n) if statuses[i] == "ok"]
        doc_texts: list[str] = []
        feats: dict[str, list] = {
            "lang_pred": [], "n_chars": [], "n_tokens": [],
            "alpha_ratio": [], "digit_ratio": [], "simhash": [],
        }
        link_parent: list[int] = []
        lcols: dict[str, list] = {name: [] for name in link_names}
        rej_parent: list[int] = []
        rcols: dict[str, list] = {"anchor_idx": [], "to_url": [], "status": []}
        for i in ok_idx:
            links, doc_text, rejects = extract_links_full(parse(urls[i]), htmls[i], filters)
            for rej in rejects:
                # rejects side output (SURVEY S6): unparseable hrefs get a
                # row_type='reject' row (href sample in to_url, reason in
                # status) instead of the reference's silent skip
                rej_parent.append(i)
                rcols["anchor_idx"].append(rej.anchor_index)
                rcols["to_url"].append(rej.href)
                rcols["status"].append("unparseable_href")
            doc_texts.append(doc_text)
            if enrich:
                # training-data curation features per fetched page —
                # language ID, quality metrics, near-dup fingerprint
                # (one shared tokenization pass — this is the crawl's
                # enrichment hot path)
                from ..functions.text import enrich_features, simhash64

                q = enrich_features(doc_text)
                feats["lang_pred"].append(q["lang_pred"])
                feats["n_chars"].append(q["n_chars"])
                feats["n_tokens"].append(q["n_tokens"])
                feats["alpha_ratio"].append(q["alpha_ratio"])
                feats["digit_ratio"].append(q["digit_ratio"])
                feats["simhash"].append(simhash64(doc_text))
            seq = seqs[i]
            prio = prios[i]
            for link in links:
                link_parent.append(i)
                lcols["anchor_idx"].append(link.anchor_index)
                lcols["emit_key"].append(emit_key_link(rnd, seq, link.anchor_index, prio))
                lcols["to_page_id"].append(link.to_page_id)
                lcols["to_url"].append(link.to_url)
                lcols["to_hostname"].append(link.to_hostname)
                lcols["to_host"].append(link.to_host)
                lcols["to_path"].append(link.to_escaped_path)
                base = bucket_for(
                    link.to_hostname, link.to_page_id, num_buckets, bucket_mode
                )
                # to_bucket is the PHYSICAL shard: split (mega-host)
                # buckets spread their emissions/probe/state over
                # page_id-hashed sub-shards (see hashing.shard_for)
                lcols["to_bucket"].append(
                    shard_for(base, link.to_page_id, num_buckets, splits)
                )
                lcols["candidate_seq"].append(child_seq(seq, link.anchor_index))
                lcols["text"].append(link.text)

        parts = [visits]
        if ok_idx:
            extras = {"to_bucket": [-1] * len(ok_idx), "text": doc_texts}
            if enrich:
                extras.update(feats)
            parts.append(
                _part(batch, "text", pa.array(ok_idx, type=pa.int64()), extras)
            )
        if link_parent:
            parts.append(
                _part(batch, "link", pa.array(link_parent, type=pa.int64()), lcols)
            )
        if rej_parent:
            rcols["to_bucket"] = [-1] * len(rej_parent)
            parts.append(
                _part(batch, "reject", pa.array(rej_parent, type=pa.int64()), rcols)
            )
        return pa.concat_tables(parts)

    return extract_emit
