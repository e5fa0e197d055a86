"""Sitemap sink/source (sources/sitemap.py): W3C lastmod codec,
urlset/sitemapindex parsing, XML escaping, protocol shard cap, and the
distributed write→read path."""

import glob
import os

import pyarrow as pa
import pytest
import ray.data

from web_graph_ray.sources.sitemap import (
    _lastmod,
    _parse_lastmod,
    encode_urlset,
    parse_sitemap,
    read_sitemaps,
    write_sitemaps,
)


@pytest.mark.parametrize(
    "s,us",
    [
        ("2024-02-29", 1709164800000000),
        ("2024-02-29T12:34:56Z", 1709210096000000),
        ("2024-02-29T12:34:56.5Z", 1709210096500000),
        # +02:00 is two hours ahead of UTC → earlier instant
        ("2024-02-29T12:34:56+02:00", 1709210096000000 - 7200 * 10**6),
        ("2024-02-29T12:34:56-05:00", 1709210096000000 + 18000 * 10**6),
    ],
)
def test_parse_lastmod(s, us):
    assert _parse_lastmod(s) == us


def test_lastmod_roundtrip_second_precision():
    us = 1709210096789012
    assert _lastmod(us) == "2024-02-29T12:34:56Z"
    assert _parse_lastmod(_lastmod(us)) == us - us % 1_000_000


def test_urlset_roundtrip_and_escaping():
    rows = [
        ("https://a.example/x?q=1&r=<2>", 1709210096000000),
        ("https://a.example/plain", None),
    ]
    blob = encode_urlset(rows)
    assert b"&amp;" in blob and b"&lt;2&gt;" in blob
    kind, urls, mods = parse_sitemap(blob)
    assert kind == "urlset"
    assert urls == [r[0] for r in rows]
    assert mods == [1709210096000000, None]


def test_parse_foreign_namespace_and_index():
    # no-namespace urlset from a foreign writer
    kind, urls, mods = parse_sitemap(
        b"<urlset><url><loc> https://x.example/1 </loc>"
        b"<lastmod>2020-01-02</lastmod></url></urlset>"
    )
    assert kind == "urlset" and urls == ["https://x.example/1"]
    assert mods == [_parse_lastmod("2020-01-02")]
    kind, urls, mods = parse_sitemap(
        b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<sitemap><loc>https://x.example/sitemap-1.xml</loc></sitemap>"
        b"</sitemapindex>"
    )
    assert kind == "sitemapindex"
    assert urls == ["https://x.example/sitemap-1.xml"]
    with pytest.raises(ValueError, match="unexpected root"):
        parse_sitemap(b"<html></html>")


def test_write_read_distributed_roundtrip(ray_session, tmp_path):
    t = pa.table(
        {
            "url": [f"https://h{i % 4}.example/p/{i:03d}" for i in range(80)],
            "warc_ts": pa.array(
                [1_700_000_000_000_000 + 10**6 * i for i in range(80)],
                pa.int64(),
            ).cast(pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "sm")
    write_sitemaps(ray.data.from_arrow(t).repartition(5), out)
    files = glob.glob(os.path.join(out, "sitemap-*.xml"))
    assert len(files) == 4  # one per host (under the 50k cap)
    back = read_sitemaps(out).to_pandas().sort_values("url")
    exp = t.to_pandas().sort_values("url")
    assert back["url"].tolist() == exp["url"].tolist()
    # lastmod is second-precision by design
    assert (
        back["lastmod_us"].astype("int64").tolist()
        == (exp["warc_ts"].astype("int64") // 10**6 * 10**6).tolist()
    )


def test_shard_cap_and_index(ray_session, tmp_path):
    import web_graph_ray.sources.sitemap as sm

    t = pa.table(
        {
            "url": [f"https://one.example/{i:03d}" for i in range(25)],
            "warc_ts": pa.array([0] * 25, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "sm")
    sm.write_sitemaps(ray.data.from_arrow(t), out, urls_per_file=10)
    shards = sorted(glob.glob(os.path.join(out, "sitemap-one.example-*.xml")))
    assert len(shards) == 3  # 10 + 10 + 5
    idx = os.path.join(out, "sitemapindex-one.example.xml")
    kind, children, _ = parse_sitemap(open(idx, "rb").read())
    assert kind == "sitemapindex" and len(children) == 3
    assert sm.read_sitemaps(out).count() == 25  # index file skipped


def test_duplicate_url_mixed_null_lastmod(ray_session, tmp_path):
    """A re-fetched URL where one row has a null lastmod and another a
    set one must sort deterministically (null first), not die on
    None < int tuple comparison."""
    t = pa.table(
        {
            "url": ["https://h.example/a", "https://h.example/a",
                    "https://h.example/b"],
            "warc_ts": pa.array(
                [None, 1_700_000_000_000_000, None], pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "sm")
    write_sitemaps(ray.data.from_arrow(t).repartition(1), out)
    back = read_sitemaps(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert back["url"].tolist() == [
        "https://h.example/a", "https://h.example/a", "https://h.example/b"
    ]
