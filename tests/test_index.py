"""Materialized adjacency indexes (VERDICT r2 item 2): compact() writes
per-bucket key-sorted Parquet; GraphQueries serves point lookups from
one pruned file read and agrees exactly with the scan fallback; a
re-compact after more rounds merges incrementally."""

import os

import pyarrow.parquet as pq
import pytest

from web_graph_ray.config import CrawlConfig
from web_graph_ray.pipelines.crawl import CrawlEngine
from web_graph_ray.pipelines.queries import GraphQueries
from web_graph_ray.sources.synth import CorpusConfig, seed_urls, write_corpus

CCFG = CorpusConfig(n_pages=200, seed=7)


@pytest.fixture(scope="module")
def crawled(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("idx")
    corpus = write_corpus(str(d / "corpus"), CCFG)
    cfg = CrawlConfig(num_buckets=8, work_dir=str(d / "work"), max_rounds=4)
    eng = CrawlEngine(corpus, cfg)
    eng.run(seed_urls(CCFG))
    return eng


def _canon_pages(x):
    df = x.to_pandas() if hasattr(x, "to_pandas") else x
    return sorted(map(tuple, df[["page_id", "host", "path", "url"]].values))


class TestCompactIndex:
    def test_index_matches_scan_everywhere(self, crawled):
        eng = crawled
        m = eng.compact()
        assert m["n_pages"] > 0 and m["n_links"] > 0
        # manifest counts == scan counts; index is current
        scan = GraphQueries(eng, use_index=False)
        idx = GraphQueries(eng, use_index=True)
        assert idx.count_pages() == scan.count_pages() == m["n_pages"]
        assert idx.count_links() == scan.count_links() == m["n_links"]

        # full pages table: union of the pages_by_id index == scan winners
        import ray.data

        from web_graph_ray.state.checkpoint import list_bucket_files

        idx_pages = ray.data.read_parquet(
            list_bucket_files(os.path.join(eng.work, "index", "pages_by_id")),
            columns=["page_id", "host", "path", "url"],
        )
        assert _canon_pages(idx_pages) == _canon_pages(eng.pages())

        # every point/listing query agrees on a sample of real keys
        pages_df = eng.pages().to_pandas()
        links_df = eng.links().to_pandas()
        sample_ids = sorted(pages_df["page_id"])[:15]
        hosts = sorted(pages_df["host"].unique())[:5]
        for pid in sample_ids:
            assert idx.page(pid) == scan.page(pid)
            assert idx.links_from(pid).to_pandas().values.tolist() == \
                scan.links_from(pid).to_pandas().values.tolist()
            assert idx.links_to(pid).to_pandas().values.tolist() == \
                scan.links_to(pid).to_pandas().values.tolist()
            assert idx.page_with_links(pid) == scan.page_with_links(pid)
        for h in hosts:
            assert idx.pages_by_host(h).to_pandas().values.tolist() == \
                scan.pages_by_host(h).to_pandas().values.tolist()
        assert idx.page("0" * 40) is None and not idx.page_exists("0" * 40)
        f, t = links_df.iloc[0][["from_page_id", "to_page_id"]]
        assert idx.link_exists(f, t) and not idx.link_exists(f, "0" * 40)

    def test_compact_idempotent(self, crawled):
        m1 = crawled.compact()
        m2 = crawled.compact()  # through_round unchanged -> no-op
        assert m1 == m2

    def test_index_files_are_key_sorted(self, crawled):
        crawled.compact()
        d = os.path.join(crawled.work, "index", "links_to")
        f = sorted(os.listdir(d))[0]
        t = pq.read_table(os.path.join(d, f))
        col = t["to_page_id"].to_pylist()
        assert col == sorted(col)

    def test_incremental_merge_equals_rebuild(self, tmp_path_factory, ray_session):
        d = tmp_path_factory.mktemp("idx-inc")
        corpus = write_corpus(str(d / "corpus"), CCFG)
        seeds = seed_urls(CCFG)

        # run 2 rounds, compact, then resume 2 more and re-compact
        cfg = CrawlConfig(num_buckets=8, work_dir=str(d / "w1"), max_rounds=2)
        eng = CrawlEngine(corpus, cfg)
        eng.run(seeds)
        m_first = eng.compact()
        eng2 = CrawlEngine(
            corpus, CrawlConfig(num_buckets=8, work_dir=str(d / "w1"), max_rounds=4)
        )
        eng2.run(seeds)  # resumes rounds 2..3
        assert eng2.index_manifest() is None  # stale index must not serve
        m_inc = eng2.compact()
        assert m_inc["through_round"] == 3 > m_first["through_round"]

        # uninterrupted 4-round crawl + fresh compact = same index content
        cfg_b = CrawlConfig(num_buckets=8, work_dir=str(d / "w2"), max_rounds=4)
        engb = CrawlEngine(corpus, cfg_b)
        engb.run(seeds)
        m_full = engb.compact()
        assert (m_inc["n_pages"], m_inc["n_links"]) == (
            m_full["n_pages"], m_full["n_links"],
        )
        qa, qb = GraphQueries(eng2, use_index=True), GraphQueries(engb, use_index=True)
        pages_df = engb.pages().to_pandas()
        for pid in sorted(pages_df["page_id"])[:10]:
            assert qa.page(pid) == qb.page(pid)
            assert qa.links_to(pid).to_pandas().values.tolist() == \
                qb.links_to(pid).to_pandas().values.tolist()


class TestEmptyRoundCompact:
    def test_recompact_with_zero_emission_new_round(self, crawled):
        """A new committed round with ZERO emissions (a finished crawl's
        last round can discover nothing) must no-op-merge, not crash
        read_parquet with an empty path list."""
        from web_graph_ray.state.checkpoint import atomic_write_json, read_json

        eng = crawled
        m = eng.compact()
        man_path = os.path.join(eng.work, "index", "MANIFEST.json")
        # pages()/links() over a rounds subset with no files at all
        future = [m["through_round"] + 7]
        assert eng.pages(rounds=future).count() == 0
        assert eng.links(rounds=future).count() == 0
        # roll the manifest back one round and re-compact incrementally;
        # result must equal the current index regardless of whether the
        # re-scanned round produced emissions
        rolled = dict(m, through_round=m["through_round"] - 1)
        atomic_write_json(rolled, man_path)
        m2 = eng.compact()
        assert m2["n_pages"] == m["n_pages"] and m2["n_links"] == m["n_links"]
        assert m2["through_round"] == m["through_round"]
