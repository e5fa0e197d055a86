"""WARC (ISO 28500) sink / source — Common Crawl's native container.

The reference crawler persists pages to Postgres
(``pkg/linkstorage/linkstorage.go``); real web corpora, including the
Common-Crawl-style pages this engine's ``input_hint`` describes, move as
``.warc.gz`` — a sequence of WARC records where **each record is its own
gzip member**, so a reader can seek to a (offset, length) pair from a
CDX index and decompress exactly one record.  This module implements
that layout with the stdlib only (``gzip`` + byte slicing; no warcio):

- :func:`write_warc` — distributed sink: one ``.warc.gz`` shard per
  input block (never one giant file), each row a ``response`` record
  preceded by a per-shard ``warcinfo`` record.  Shard names are content
  hashes written tmp+rename, so re-runs are idempotent and a partial
  failure never leaves a torn file — the same contract as the Parquet /
  IPC / TFRecord sinks (``sources/sinks.py``, ``text_formats.py``).
- :func:`read_warc` — distributed source: ``read_binary_files`` over the
  shards (parallel across files), one multi-member ``gzip.decompress``
  + record scan per file inside ``map_batches``.

Fidelity notes:
- WARC-Date carries MICROSECOND precision (``...T..:..:..` `.ffffffZ``,
  WARC/1.1 allows fractional seconds; WARC/1.0 is whole-second), so
  ``timestamp[us]`` columns round-trip exactly.
- The record payload is the raw page bytes (``Content-Type:
  text/html``), not a captured HTTP envelope — this engine stores
  decoded bodies, so re-wrapping a fake HTTP response header block
  would add bytes without information.  Readers that expect
  ``application/http; msgtype=response`` payloads should treat these
  as "resource"-style captures; the WARC-Type stays ``response`` to
  match how the rows were produced (a fetch).
- Record IDs are deterministic (``urn:sha1:<hex>`` over URI + date) so
  identical inputs produce byte-identical shards at any parallelism —
  required for the content-hashed idempotent shard names.

Scale shape: the sink is a pure per-block map (zero shuffles, O(1)
driver state); the source parallelizes per shard file.  Record parsing
is necessarily a sequential byte scan per file — the same shape as the
TFRecord codec — bounded by rows-per-shard, not corpus size.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import shutil

import pyarrow as pa

__all__ = [
    "write_warc",
    "read_warc",
    "encode_warc_gz",
    "parse_warc_gz",
    "read_cdx",
    "read_warc_record",
]

_SOFTWARE = b"web_graph_ray-warc/1.0"
_CRLF = b"\r\n"


def _warc_date(us: int) -> bytes:
    """Epoch-microseconds -> WARC/1.1 UTC date with fractional seconds.

    Pure integer arithmetic (civil-from-days, Howard Hinnant's
    algorithm) — no datetime objects in the per-record loop and no
    timezone ambiguity.
    """
    sec, frac = divmod(us, 1_000_000)
    days, rem = divmod(sec, 86_400)
    h, rem = divmod(rem, 3_600)
    m, s = divmod(rem, 60)
    z = days + 719_468
    era = z // 146_097
    doe = z - era * 146_097
    yoe = (doe - doe // 1460 + doe // 36_524 - doe // 146_096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    mo = mp + 3 if mp < 10 else mp - 9
    if mo <= 2:
        y += 1
    return (
        f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{m:02d}:{s:02d}.{frac:06d}Z"
    ).encode()


def _parse_warc_date(b: bytes) -> int:
    """Inverse of :func:`_warc_date`; also accepts whole-second
    (WARC/1.0) dates from foreign writers."""
    s = b.decode()
    frac = 0
    if "." in s:
        s, f = s.rstrip("Z").split(".")
        frac = int(f.ljust(6, "0")[:6])
    else:
        s = s.rstrip("Z")
    date, clock = s.split("T")
    y, mo, d = (int(x) for x in date.split("-"))
    hh, mm, ss = (int(x) for x in clock.split(":"))
    # days-from-civil (inverse of the encoder's civil-from-days)
    y2 = y - (1 if mo <= 2 else 0)
    era = y2 // 400
    yoe = y2 - era * 400
    doy = (153 * (mo - 3 if mo > 2 else mo + 9) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    days = era * 146_097 + doe - 719_468
    return ((days * 86_400) + hh * 3_600 + mm * 60 + ss) * 1_000_000 + frac


def _record(headers: list[tuple[bytes, bytes]], payload: bytes) -> bytes:
    head = b"WARC/1.1" + _CRLF
    head += b"".join(k + b": " + v + _CRLF for k, v in headers)
    head += b"Content-Length: " + str(len(payload)).encode() + _CRLF
    return head + _CRLF + payload + _CRLF + _CRLF


def encode_warc_gz(
    rows: list[tuple[str, int, bytes]], shard_tag: bytes = b""
) -> bytes:
    """Encode ``(url, epoch_us, payload)`` rows as a member-per-record
    ``.warc.gz`` byte string: one ``warcinfo`` member, then one
    ``response`` member per row.  ``mtime=0`` pins the gzip header so
    output is byte-deterministic."""
    return b"".join(_gz_members(rows, shard_tag))


def _gz_members(
    rows: list[tuple[str, int, bytes]], shard_tag: bytes = b""
) -> list[bytes]:
    """The shard's gzip members in order (warcinfo first) — the
    indexed writer derives CDX ``(offset, length)`` pairs from these
    lengths, so the member list IS the index's source of truth."""
    info_payload = (
        b"software: " + _SOFTWARE + _CRLF + b"format: WARC File Format 1.1"
        + _CRLF
    )
    info_id = hashlib.sha1(b"warcinfo:" + shard_tag + info_payload).hexdigest()
    out = [
        gzip.compress(
            _record(
                [
                    (b"WARC-Type", b"warcinfo"),
                    (b"WARC-Record-ID", f"<urn:sha1:{info_id}>".encode()),
                    (b"WARC-Date", _warc_date(0)),
                    (b"Content-Type", b"application/warc-fields"),
                ],
                info_payload,
            ),
            mtime=0,
        )
    ]
    for url, us, payload in rows:
        uri = url.encode()
        date = _warc_date(us)
        rid = hashlib.sha1(uri + b"\x00" + date).hexdigest()
        out.append(
            gzip.compress(
                _record(
                    [
                        (b"WARC-Type", b"response"),
                        (b"WARC-Record-ID", f"<urn:sha1:{rid}>".encode()),
                        (b"WARC-Date", date),
                        (b"WARC-Target-URI", uri),
                        (b"Content-Type", b"text/html"),
                    ],
                    payload if payload is not None else b"",
                ),
                mtime=0,
            )
        )
    return out


def parse_warc_gz(blob: bytes) -> tuple[list[str], list[int], list[bytes]]:
    """Parse a (possibly multi-member) ``.warc.gz`` byte string into
    parallel ``(urls, epoch_us, payloads)`` lists, keeping only
    ``response`` records.  Raises ``ValueError`` on torn records.
    Bare (already-inflated) WARC bytes are accepted too — Ray's
    ``read_binary_files`` transparently decompresses ``.gz`` paths by
    extension, so the distributed source hands this function raw
    records while a CDX-style ``(offset, length)`` caller hands it a
    single gzip member."""
    if blob[:2] == b"\x1f\x8b":
        raw = gzip.decompress(blob)  # stdlib handles concatenated members
    else:
        raw = blob
    urls: list[str] = []
    tss: list[int] = []
    payloads: list[bytes] = []
    i, n = 0, len(raw)
    while i < n:
        end = raw.find(_CRLF + _CRLF, i)
        if end < 0:
            raise ValueError("warc: truncated record header")
        head = raw[i:end]
        if not head.startswith(b"WARC/"):
            raise ValueError("warc: bad record magic")
        hdrs: dict[bytes, bytes] = {}
        for line in head.split(_CRLF)[1:]:
            # ISO 28500 grammar is 'field-name ":" [field-value]' with
            # OPTIONAL whitespace — split on the bare colon and strip,
            # so 'Content-Length:5' from a space-less writer parses
            # instead of KeyError-ing on the int() below
            k, _, v = line.partition(b":")
            hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs[b"content-length"])
        body_at = end + 4
        if body_at + clen + 4 > n:
            raise ValueError("warc: truncated record payload")
        if raw[body_at + clen : body_at + clen + 4] != _CRLF + _CRLF:
            raise ValueError("warc: missing record terminator")
        if hdrs.get(b"warc-type") == b"response":
            urls.append(hdrs[b"warc-target-uri"].decode())
            tss.append(_parse_warc_date(hdrs[b"warc-date"]))
            payloads.append(raw[body_at : body_at + clen])
        i = body_at + clen + 4
    return urls, tss, payloads


def write_warc(
    ds,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    clean: bool = True,
    cdx: bool = False,
) -> str:
    """Distributed WARC sink: one content-hash-named ``.warc.gz`` shard
    per block, tmp+rename atomic, member-per-record layout.  With
    ``cdx=True`` each shard also writes a Parquet CDX sidecar under
    ``cdx/`` mapping ``url -> (shard, offset, length, warc_ts)`` so
    :func:`read_warc_record` can seek-and-inflate exactly one record —
    the Common-Crawl serving pattern.  The sidecar is derived from the
    same member list as the shard bytes, so it cannot drift."""
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if cdx:
        os.makedirs(os.path.join(out_dir, "cdx"), exist_ok=True)

    def w(t: "pa.Table") -> "pa.Table":
        import pyarrow.parquet as pq

        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        tss = ts.to_pylist()
        rows = list(zip(t[url_col].to_pylist(), tss, t[payload_col].to_pylist()))
        members = _gz_members(rows)
        blob = b"".join(members)
        name = hashlib.sha1(blob).hexdigest()[:24]
        final = os.path.join(out_dir, f"{name}.warc.gz")
        if not os.path.exists(final):  # idempotent re-run
            tmp = final + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, final)
        if cdx:
            # member 0 is warcinfo; record i lives at member i+1
            offs, at = [], len(members[0])
            for m in members[1:]:
                offs.append(at)
                at += len(m)
            idx = pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    ts_col: pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
                    "shard": pa.array([f"{name}.warc.gz"] * len(rows)),
                    "offset": pa.array(offs, pa.int64()),
                    "length": pa.array(
                        [len(m) for m in members[1:]], pa.int64()
                    ),
                }
            )
            cdx_final = os.path.join(out_dir, "cdx", f"{name}.parquet")
            if not os.path.exists(cdx_final):
                tmp = cdx_final + f".tmp.{os.getpid()}"
                pq.write_table(idx, tmp)
                os.replace(tmp, cdx_final)
        return pa.table({"path": [final], "rows": [len(rows)]})

    ds.map_batches(w, batch_format="pyarrow").materialize()
    return out_dir


def read_cdx(out_dir: str):
    """The CDX sidecar as a Dataset of
    ``(url, warc_ts, shard, offset, length)`` rows."""
    import ray.data

    return ray.data.read_parquet(os.path.join(out_dir, "cdx"))


def read_warc_record(
    out_dir: str, shard: str, offset: int, length: int
) -> tuple[str, int, bytes]:
    """Point lookup: seek to one gzip member inside a shard, inflate
    only it, return ``(url, epoch_us, payload)``.  O(record) I/O no
    matter how large the shard or corpus — the CDX serving path."""
    with open(os.path.join(out_dir, shard), "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    urls, tss, payloads = parse_warc_gz(blob)
    if len(urls) != 1:
        raise ValueError("cdx: (offset, length) did not span one record")
    return urls[0], tss[0], payloads[0]


def read_warc(path: str, ts_col: str = "warc_ts"):
    """Distributed WARC source: parallel per-shard parse back to
    ``(url:string, warc_ts:timestamp[us], html:binary)`` blocks."""
    import ray.data

    def parse(batch: "pa.Table") -> "pa.Table":
        urls: list[str] = []
        tss: list[int] = []
        payloads: list[bytes] = []
        for blob in batch["bytes"].to_pylist():
            u, t, p = parse_warc_gz(blob)
            urls.extend(u)
            tss.extend(t)
            payloads.extend(p)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                ts_col: pa.array(tss, type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "html": pa.array(payloads, type=pa.binary()),
            }
        )

    return ray.data.read_binary_files(path, file_extensions=["gz"]).map_batches(
        parse, batch_format="pyarrow"
    )
