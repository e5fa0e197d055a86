"""WARC sink/source (sources/warc.py): date codec vectors, record
round-trip fidelity, determinism, torn-record detection, and the
distributed write→read path."""

import glob
import gzip
import os
from datetime import datetime, timezone

import pyarrow as pa
import pytest
import ray.data

from web_graph_ray.sources.warc import (
    _parse_warc_date,
    _warc_date,
    encode_warc_gz,
    parse_warc_gz,
    read_cdx,
    read_warc,
    read_warc_record,
    write_warc,
)


@pytest.mark.parametrize(
    "us,expect",
    [
        (0, b"1970-01-01T00:00:00.000000Z"),
        (1, b"1970-01-01T00:00:00.000001Z"),
        # leap-year day
        (1709210096789012, b"2024-02-29T12:34:56.789012Z"),
        # century non-leap boundary
        (4107542399999999, b"2100-02-28T23:59:59.999999Z"),
    ],
)
def test_warc_date_vectors(us, expect):
    assert _warc_date(int(us)) == expect
    assert _parse_warc_date(expect) == int(us)


def test_warc_date_matches_datetime_over_range():
    # cross-check the integer civil-date math against the stdlib
    for us in range(0, 4_000_000_000_000_000, 86_399_123_456_789 // 7):
        got = _warc_date(us).decode()
        exp = datetime.fromtimestamp(us // 1_000_000, tz=timezone.utc)
        exp_s = exp.strftime("%Y-%m-%dT%H:%M:%S") + ".%06dZ" % (us % 1_000_000)
        assert got == exp_s
        assert _parse_warc_date(got.encode()) == us


def test_parse_whole_second_warc10_date():
    assert _parse_warc_date(b"2020-06-01T10:20:30Z") == 1591006830000000
    # short fractional part pads, not truncates
    assert _parse_warc_date(b"2020-06-01T10:20:30.5Z") == 1591006830500000


def test_encode_parse_roundtrip_exact():
    rows = [
        ("https://a.example/x", 1_700_000_000_123_456, b"<html>a</html>"),
        ("https://b.example/é", 0, b""),  # unicode URI, empty payload
        ("https://c.example/bin", 42, b"\r\n\r\nWARC/1.1\r\n\x00\xff"),
    ]
    blob = encode_warc_gz(rows)
    urls, tss, payloads = parse_warc_gz(blob)
    assert urls == [r[0] for r in rows]
    assert tss == [r[1] for r in rows]
    assert payloads == [r[2] for r in rows]


def test_encode_deterministic_and_member_per_record():
    rows = [("https://a.example/", 7, b"x"), ("https://b.example/", 8, b"y")]
    blob = encode_warc_gz(rows)
    assert blob == encode_warc_gz(rows)
    # each record its own gzip member: warcinfo + 2 responses = 3 magics
    assert blob.count(b"\x1f\x8b\x08") >= 3
    # a single member decompresses to exactly one record (CDX-style seek)
    d = gzip.GzipFile(fileobj=__import__("io").BytesIO(blob))
    first = d.read()  # stdlib reads across members; check via member split
    assert first.startswith(b"WARC/1.1\r\nWARC-Type: warcinfo")


def test_parse_rejects_torn_and_foreign_blobs():
    rows = [("https://a.example/", 7, b"payload")]
    blob = encode_warc_gz(rows)
    raw = gzip.decompress(blob)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_gz(gzip.compress(raw[:-10]))
    with pytest.raises(ValueError, match="magic"):
        parse_warc_gz(gzip.compress(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_write_read_distributed_roundtrip(ray_session, tmp_path):
    t = pa.table(
        {
            "url": [f"https://h{i % 3}.example/p/{i}" for i in range(50)],
            "warc_ts": pa.array(
                [1_700_000_000_000_000 + 999_983 * i for i in range(50)],
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "html": [b"<html>%d</html>" % i for i in range(50)],
        }
    )
    out = str(tmp_path / "warc")
    write_warc(ray.data.from_arrow(t).repartition(4), out)
    shards = glob.glob(os.path.join(out, "*.warc.gz"))
    assert len(shards) >= 2  # one shard per block, never one giant file
    back = read_warc(out).to_pandas()
    exp = t.to_pandas()
    back = back.sort_values("url").reset_index(drop=True)
    exp = exp.sort_values("url").reset_index(drop=True)
    assert back["url"].tolist() == exp["url"].tolist()
    assert back["warc_ts"].tolist() == exp["warc_ts"].tolist()
    assert [bytes(b) for b in back["html"]] == [bytes(b) for b in exp["html"]]


def test_cdx_point_lookup(ray_session, tmp_path):
    t = pa.table(
        {
            "url": [f"https://h{i % 3}.example/p/{i}" for i in range(30)],
            "warc_ts": pa.array(
                [1_700_000_000_000_000 + i for i in range(30)], pa.int64()
            ).cast(pa.timestamp("us")),
            "html": [b"<html>%d</html>" % i for i in range(30)],
        }
    )
    out = str(tmp_path / "warc")
    write_warc(ray.data.from_arrow(t).repartition(3), out, cdx=True)
    idx = read_cdx(out).to_pandas()
    assert len(idx) == 30
    # every record is point-readable via its (shard, offset, length)
    for row in idx.sample(8, random_state=0).itertuples():
        url, us, payload = read_warc_record(
            out, row.shard, row.offset, row.length
        )
        assert url == row.url
        i = int(url.rsplit("/", 1)[1])
        assert payload == b"<html>%d</html>" % i
        assert us == 1_700_000_000_000_000 + i
    # cdx sidecar does not pollute the full-scan source
    assert read_warc(out).count() == 30
    # a misaligned seek is rejected, not silently misparsed
    r0 = idx.iloc[0]
    with pytest.raises(ValueError):
        read_warc_record(out, r0["shard"], int(r0["offset"]) + 1,
                         int(r0["length"]))


def test_write_idempotent_rerun(ray_session, tmp_path):
    t = pa.table(
        {
            "url": ["https://a.example/1", "https://a.example/2"],
            "warc_ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
            "html": [b"x", b"y"],
        }
    )
    out = str(tmp_path / "warc")
    write_warc(ray.data.from_arrow(t), out)
    first = sorted(glob.glob(os.path.join(out, "*.warc.gz")))
    write_warc(ray.data.from_arrow(t), out, clean=False)
    assert sorted(glob.glob(os.path.join(out, "*.warc.gz"))) == first
    assert read_warc(out).count() == 2


def test_parse_spaceless_header_colon():
    """ISO 28500 allows 'field-name \":\" [field-value]' with optional
    whitespace: a writer that omits the space after the colon must
    still parse (split on the bare colon + strip), not KeyError."""
    from web_graph_ray.sources.warc import parse_warc_gz

    body = b"hello"
    rec = (
        b"WARC/1.1\r\n"
        b"WARC-Type:response\r\n"
        b"WARC-Target-URI:https://x.example/a\r\n"
        b"WARC-Date:2024-01-02T03:04:05.000000Z\r\n"
        b"Content-Length:" + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )
    urls, tss, payloads = parse_warc_gz(rec)
    assert urls == ["https://x.example/a"]
    assert payloads == [body]
