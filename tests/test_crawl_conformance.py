"""Engine ≡ oracle conformance (SURVEY.md §5 / north_rule).

The Ray engine must reproduce the sequential oracle's visit order,
URL-seen set, pages/links tables (exact first-wins winners), per-url
extracted text (byte-identical), per-round frontier composition and
counters — under plain BFS, politeness budgets, robots, and crawl caps
— and a resumed run must equal an uninterrupted one.
"""

import shutil

import pyarrow.parquet as pq
import pytest

from web_graph_ray.config import CrawlConfig
from web_graph_ray.pipelines.crawl import CrawlEngine
from web_graph_ray.sources.synth import CorpusConfig, render_pages_table, seed_urls, write_corpus
from tests.oracle import run_oracle

CCFG = CorpusConfig(n_pages=300, seed=42)


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    return write_corpus(str(d), CCFG)


@pytest.fixture(scope="module")
def corpus_table(corpus_path):
    return pq.read_table(corpus_path)


@pytest.fixture(scope="module")
def seeds():
    return seed_urls(CCFG)


def make_engine(corpus_path, tmp_path, **kw) -> CrawlEngine:
    cfg = CrawlConfig(num_buckets=8, work_dir=str(tmp_path / "work"), **kw)
    return CrawlEngine(corpus_path, cfg)


def engine_visits(eng):
    # reference visit order = (round, priority, seq) — the admission order
    df = eng.visits().to_pandas().sort_values(
        ["round", "priority", "seq"]
    ).reset_index(drop=True)
    return list(zip(df["page_id"], df["status"], df["depth"], df["round"]))


def oracle_visits(res):
    return [(v["page_id"], v["status"], v["depth"], v["round"]) for v in res.visits]


def engine_pages(eng):
    df = eng.pages().to_pandas()
    return sorted(map(tuple, df[["page_id", "host", "path", "url"]].values))


def oracle_pages(res):
    return sorted((p["page_id"], p["host"], p["path"], p["url"]) for p in res.pages)


def engine_links(eng):
    df = eng.links().to_pandas()
    return sorted(map(tuple, df[["from_page_id", "to_page_id", "text"]].values))


def oracle_links(res):
    return sorted((l["from_page_id"], l["to_page_id"], l["text"]) for l in res.links)


def engine_texts(eng) -> dict:
    df = eng.texts().to_pandas()
    return dict(zip(df["url"], df["text"]))


def assert_conformance(eng, res):
    assert engine_visits(eng) == oracle_visits(res)
    assert engine_pages(eng) == oracle_pages(res)
    assert engine_links(eng) == oracle_links(res)
    assert engine_texts(eng) == res.texts
    assert eng.counters() == res.counters


class TestPlainBFS:
    """budget=∞, robots off ⇒ exactly the reference's FIFO BFS."""

    @pytest.fixture(scope="class")
    def both(self, ray_session, corpus_path, corpus_table, seeds, tmp_path_factory):
        eng = make_engine(corpus_path, tmp_path_factory.mktemp("bfs"), respect_robots=False)
        eng.run(seeds)
        res = run_oracle(corpus_table, seeds)
        return eng, res

    def test_visit_order(self, both):
        eng, res = both
        assert engine_visits(eng) == oracle_visits(res)

    def test_pages_first_wins(self, both):
        eng, res = both
        assert engine_pages(eng) == oracle_pages(res)

    def test_links_first_wins(self, both):
        eng, res = both
        assert engine_links(eng) == oracle_links(res)

    def test_texts_byte_identical(self, both, corpus_table):
        eng, res = both
        got = engine_texts(eng)
        assert got == res.texts
        # and engine text == the corpus's analytically-built text column
        # for every fetched url (north-rule per-row invariant)
        corpus_text = dict(
            zip(corpus_table["url"].to_pylist(), corpus_table["text"].to_pylist())
        )
        by_id = {}
        from web_graph_ray.functions.urlnorm import parse, page_id_from_parts
        for u, t in corpus_text.items():
            p = parse(u)
            by_id[page_id_from_parts(p.hostname(), p.escaped_path())] = t
        checked = 0
        for url, text in got.items():
            p = parse(url)
            pid = page_id_from_parts(p.hostname(), p.escaped_path())
            assert text == by_id[pid], f"text differs for {url}"
            checked += 1
        assert checked > 100

    def test_counters(self, both):
        eng, res = both
        assert eng.counters() == res.counters

    def test_anchor_summary_and_host_edges(self, both):
        """GraphQueries.anchor_summary / host_edges ≡ pandas folds over
        the oracle's links+pages (the rows-only driver entries'
        correctness pin)."""
        import pandas as pd

        from web_graph_ray.pipelines.queries import GraphQueries

        eng, res = both
        q = GraphQueries(eng)

        links = pd.DataFrame(res.links)  # from_page_id, to_page_id, text
        pages = pd.DataFrame(res.pages)  # page_id, host, path, url

        # anchor summary reference: modal text per target, ties text asc
        c = (
            links.groupby(["to_page_id", "text"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .sort_values(["to_page_id", "n", "text"],
                         ascending=[True, False, True], kind="mergesort")
        )
        exp = c.groupby("to_page_id", as_index=False).agg(
            in_links=("n", "sum"), n_texts=("text", "size"),
            top_text=("text", "first"),
        ).sort_values("to_page_id").reset_index(drop=True)
        got = (
            q.anchor_summary().to_pandas()
            .sort_values("to_page_id").reset_index(drop=True)
        )
        assert got[["to_page_id", "in_links", "n_texts", "top_text"]].astype(
            str
        ).equals(exp.astype(str))

        # host edges reference: join both endpoints through pages
        hp = pages[["page_id", "host"]]
        ref = (
            links.merge(hp.rename(columns={"host": "from_host"}), on="page_id")
            if "page_id" in links
            else links.merge(
                hp.rename(columns={"page_id": "from_page_id",
                                   "host": "from_host"}),
                on="from_page_id",
            )
        )
        ref = ref.merge(
            hp.rename(columns={"page_id": "to_page_id", "host": "to_host"}),
            on="to_page_id",
        )
        exp2 = (
            ref.groupby(["from_host", "to_host"], as_index=False)
            .size()
            .rename(columns={"size": "n_edges"})
            .sort_values(["from_host", "to_host"]).reset_index(drop=True)
        )
        got2 = (
            q.host_edges().to_pandas()
            .sort_values(["from_host", "to_host"]).reset_index(drop=True)
        )
        assert got2.astype(str).equals(exp2.astype(str))
        assert len(got2) > 0 and len(got) > 0

    def test_frontier_composition(self, both, corpus_path):
        eng, res = both
        from web_graph_ray.state.checkpoint import frontier_dirs, list_bucket_files
        for rnd, gold in enumerate(res.frontiers):
            files = list_bucket_files(frontier_dirs(eng.work, rnd)[0]) + \
                    list_bucket_files(frontier_dirs(eng.work, rnd)[1])
            rows = []
            for f in files:
                t = pq.read_table(f, columns=["page_id", "seq"])
                rows += list(zip(t["seq"].to_pylist(), t["page_id"].to_pylist()))
            rows.sort()
            assert [pid for _, pid in rows] == gold, f"frontier mismatch round {rnd}"


class TestPoliteness:
    def test_budget_and_robots(self, ray_session, corpus_path, corpus_table, seeds, tmp_path_factory):
        eng = make_engine(
            corpus_path, tmp_path_factory.mktemp("pol"),
            respect_robots=True, politeness_budget=3, max_rounds=8,
        )
        eng.run(seeds)
        res = run_oracle(corpus_table, seeds, budget=3, respect_robots=True, max_rounds=8)
        assert_conformance(eng, res)

    def test_max_pages_cap(self, ray_session, corpus_path, corpus_table, seeds, tmp_path_factory):
        eng = make_engine(
            corpus_path, tmp_path_factory.mktemp("cap"),
            respect_robots=False, max_pages=25,
        )
        eng.run(seeds)
        res = run_oracle(corpus_table, seeds, max_pages=25)
        assert_conformance(eng, res)


class TestCuckooGate:
    """seen_gate='cuckoo' must be output-identical to the Bloom default:
    either gate only short-circuits DEFINITELY-novel ids and defers all
    maybes to the exact probe (state/seen.py contract)."""

    def test_conformance(self, ray_session, corpus_path, corpus_table, seeds, tmp_path_factory):
        eng = make_engine(
            corpus_path, tmp_path_factory.mktemp("cuckoo"),
            respect_robots=False, seen_gate="cuckoo",
        )
        eng.run(seeds)
        res = run_oracle(corpus_table, seeds)
        assert_conformance(eng, res)

    def test_ttl_conformance(self, ray_session, tmp_path_factory):
        """TTL horizon + cuckoo gate ≡ the oracle's last_member gate on
        the re-crawl ring.  12 rounds crosses the COMPACT_EVERY=8
        sidecar boundary, so the delta-maintained gate (delete exiting
        round, add entering round) runs against BOTH the no-sidecar and
        the compacted-sidecar exact backstop in one crawl."""
        d = tmp_path_factory.mktemp("cuckoo_ttl")
        path, table = TestSeenTTL._ring_corpus(d)
        seeds = ["http://ring.test/p0.html"]
        eng = make_engine(path, d, respect_robots=False, seen_ttl_rounds=3,
                          max_rounds=12, seen_gate="cuckoo")
        eng.run(seeds)
        res = run_oracle(table, seeds, seen_ttl_rounds=3, max_rounds=12)
        assert_conformance(eng, res)


class TestPriorityQueue:
    def test_deep_first_with_politeness(self, ray_session, corpus_path, corpus_table, seeds, tmp_path_factory):
        """Non-FIFO priority ordering: deeper pages admitted first when
        politeness defers — engine ≡ oracle under the same rule."""
        eng = make_engine(
            corpus_path, tmp_path_factory.mktemp("prio"),
            respect_robots=False, politeness_budget=3, max_rounds=6,
            priority_mode="deep_first",
        )
        eng.run(seeds)
        res = run_oracle(corpus_table, seeds, budget=3, max_rounds=6,
                         priority_mode="deep_first")
        assert_conformance(eng, res)
        # sanity: ordering actually differs from FIFO
        fifo = run_oracle(corpus_table, seeds, budget=3, max_rounds=6)
        assert [v["page_id"] for v in res.visits] != [v["page_id"] for v in fifo.visits]


class TestOtherSeeds:
    """Robustness across graph shapes: a different corpus seed, all
    adversarial cases re-rolled, politeness+robots on."""

    @pytest.mark.parametrize("seed,n", [(7, 150), (1234, 120)])
    def test_seeded_conformance(self, ray_session, tmp_path_factory, seed, n):
        from web_graph_ray.sources.synth import CorpusConfig

        ccfg = CorpusConfig(n_pages=n, seed=seed)
        d = tmp_path_factory.mktemp(f"seed{seed}")
        path = write_corpus(str(d / "corpus"), ccfg)
        table = pq.read_table(path)
        seeds = seed_urls(ccfg)
        eng = make_engine(path, d, respect_robots=True, politeness_budget=2, max_rounds=6)
        eng.run(seeds)
        res = run_oracle(table, seeds, budget=2, respect_robots=True, max_rounds=6)
        assert_conformance(eng, res)


class TestResume:
    def test_resume_equals_uninterrupted(self, ray_session, corpus_path, corpus_table, seeds, tmp_path_factory):
        base = tmp_path_factory.mktemp("resume")
        # interrupted: run 3 rounds, then resume with a FRESH engine object
        eng1 = make_engine(corpus_path, base, respect_robots=False, max_rounds=3)
        eng1.run(seeds)
        assert len(eng1.counters()) == 3
        eng2 = make_engine(corpus_path, base, respect_robots=False)
        eng2.run()  # no seeds: must resume from checkpoints
        res = run_oracle(corpus_table, seeds)
        assert_conformance(eng2, res)

    def test_rerun_is_noop(self, ray_session, corpus_path, seeds, tmp_path_factory):
        base = tmp_path_factory.mktemp("noop")
        eng = make_engine(corpus_path, base, respect_robots=False, max_rounds=2)
        eng.run(seeds)
        c1 = eng.counters()
        eng.run()  # idempotent: nothing new to do
        assert eng.counters() == c1


class TestSeenTTL:
    """Re-crawl horizon (reference 48 h LinkCache TTL, linkcache.go:23,
    set at linkprocessor.go:43) in virtual time: after seen_ttl_rounds
    without frontier membership a page becomes re-crawlable."""

    @staticmethod
    def _ring_corpus(tmp_path, n=4):
        """host ring p0 -> p1 -> ... -> p{n-1} -> p0."""
        import pyarrow as pa

        urls, htmls = [], []
        for i in range(n):
            urls.append(f"http://ring.test/p{i}.html")
            nxt = (i + 1) % n
            htmls.append(
                f'<html><body>page {i} <a href="/p{nxt}.html">next</a></body></html>'.encode()
            )
        t = pa.Table.from_pydict(
            {
                "url": urls,
                "warc_ts": pa.array([1700000000 + i for i in range(n)],
                                    type=pa.timestamp("us")),
                "html": pa.array(htmls, type=pa.binary()),
                "content_type": ["text/html"] * n,
            }
        )
        path = str(tmp_path / "ring.parquet")
        pq.write_table(t, path)
        return path, t

    def test_page_reenters_after_horizon(self, ray_session, tmp_path_factory):
        d = tmp_path_factory.mktemp("ttl")
        path, table = self._ring_corpus(d)
        seeds = ["http://ring.test/p0.html"]
        eng = make_engine(path, d, respect_robots=False,
                          seen_ttl_rounds=3, max_rounds=6)
        eng.run(seeds)
        res = run_oracle(table, seeds, seen_ttl_rounds=3, max_rounds=6)
        assert_conformance(eng, res)
        # p0 (visited round 0) must actually re-enter after the horizon
        visits = engine_visits(eng)
        from collections import Counter
        revisits = Counter(pid for pid, *_ in visits)
        assert max(revisits.values()) >= 2, "no re-crawl happened"

    def test_infinite_horizon_unchanged(self, ray_session, tmp_path_factory):
        """Default (None) keeps the exact one-visit-per-page semantics."""
        d = tmp_path_factory.mktemp("ttl-inf")
        path, table = self._ring_corpus(d)
        seeds = ["http://ring.test/p0.html"]
        eng = make_engine(path, d, respect_robots=False, max_rounds=8)
        eng.run(seeds)
        res = run_oracle(table, seeds, max_rounds=8)
        assert_conformance(eng, res)
        visits = engine_visits(eng)
        assert len(visits) == len({pid for pid, *_ in visits}) == 4


class TestMegaHostSalting:
    """SURVEY §4.2 skew row: a bucket whose frontier exceeds
    salt_threshold_rows is split across page_id-hashed sub-shards —
    probe/emissions load spreads while admission still sees the whole
    host group (politeness semantics unchanged, oracle-conformant)."""

    @staticmethod
    def _mega_corpus(tmp_path, n_mega=180, n_small=19):
        import pyarrow as pa

        urls, htmls = ["http://mega.test/hub.html"], []
        hub_links = []
        for i in range(n_mega):
            urls.append(f"http://mega.test/p{i}.html")
            hub_links.append(f'<a href="/p{i}.html">m{i}</a>')
        for i in range(n_small):
            urls.append(f"http://small{i}.test/index.html")
            hub_links.append(f'<a href="http://small{i}.test/index.html">s{i}</a>')
        htmls.append(("<html><body>" + "".join(hub_links) + "</body></html>").encode())
        for i in range(n_mega):
            ls = "".join(
                f'<a href="/p{(i * 7 + k) % n_mega}.html">x</a>' for k in range(1, 6)
            )
            htmls.append(f"<html><body>mega {i} {ls}</body></html>".encode())
        for i in range(n_small):
            htmls.append(f"<html><body>small {i}</body></html>".encode())
        t = pa.Table.from_pydict(
            {
                "url": urls,
                "warc_ts": pa.array(range(len(urls)), type=pa.timestamp("us")),
                "html": pa.array(htmls, type=pa.binary()),
                "content_type": ["text/html"] * len(urls),
            }
        )
        path = str(tmp_path / "mega.parquet")
        pq.write_table(t, path)
        return path, t

    def test_split_spreads_load_and_conforms(self, ray_session, tmp_path_factory):
        d = tmp_path_factory.mktemp("salt")
        path, table = self._mega_corpus(d)
        seeds = ["http://mega.test/hub.html"]
        eng = make_engine(
            path, d, respect_robots=False, politeness_budget=30,
            salt_threshold_rows=60, salt_factor=4, max_rounds=6,
        )
        eng.run(seeds)
        res = run_oracle(table, seeds, budget=30, max_rounds=6)
        assert_conformance(eng, res)

        # the mega bucket actually split
        splits = eng._load_splits()
        assert len(splits) == 1
        (base, s), = splits.items()
        assert s == 4

        # per-shard link_rows spread within 4x in some committed round
        from web_graph_ray.state.checkpoint import read_json, round_dir
        import os
        ok = False
        for r in eng._committed_rounds():
            m = read_json(os.path.join(round_dir(eng.work, r), "MANIFEST.json"))
            shard_rows = [
                st["link_rows"]
                for b, st in m["bucket_stats"].items()
                if int(b) >= eng.cfg.num_buckets and int(b) % eng.cfg.num_buckets == base
            ]
            if len(shard_rows) >= 3 and min(shard_rows) > 0:
                assert max(shard_rows) <= 4 * min(shard_rows), (r, shard_rows)
                ok = True
        assert ok, "no round exercised multiple sub-shards"

    def test_resume_across_split(self, ray_session, tmp_path_factory):
        """A crawl interrupted after the split resumes identically."""
        d = tmp_path_factory.mktemp("salt-resume")
        path, table = self._mega_corpus(d)
        seeds = ["http://mega.test/hub.html"]
        kw = dict(respect_robots=False, politeness_budget=30,
                  salt_threshold_rows=60, salt_factor=4)
        eng1 = make_engine(path, d, max_rounds=2, **kw)
        eng1.run(seeds)
        assert eng1._load_splits(), "split should have happened by round 2"
        eng2 = make_engine(path, d, max_rounds=6, **kw)
        eng2.run()  # resume from checkpoints
        res = run_oracle(table, seeds, budget=30, max_rounds=6)
        assert_conformance(eng2, res)


class TestRejectsSideOutput:
    """S6 rejects channel: unparseable hrefs produce reject rows +
    a 'rejected' counter instead of the reference's silent skip
    (pkg/linkprocessor/linkprocessor.go:141-144)."""

    def test_rejects_surface_and_conform(self, ray_session, tmp_path_factory):
        import pyarrow as pa

        d = tmp_path_factory.mktemp("rejects")
        html = (
            b'<html><body>'
            b'<a href="/ok.html">fine</a>'
            b'<a href="/%zz">poison1</a>'
            b'<a href="ht tp://x/">poison2</a>'
            b'</body></html>'
        )
        t = pa.Table.from_pydict(
            {
                "url": ["http://r.test/index.html", "http://r.test/ok.html"],
                "warc_ts": pa.array([1, 2], type=pa.timestamp("us")),
                "html": pa.array([html, b"<html><body>leaf</body></html>"], type=pa.binary()),
                "content_type": ["text/html", "text/html"],
            }
        )
        path = str(d / "c.parquet")
        pq.write_table(t, path)
        seeds = ["http://r.test/index.html"]
        eng = make_engine(path, d, respect_robots=False)
        eng.run(seeds)
        res = run_oracle(pq.read_table(path), seeds)
        assert_conformance(eng, res)
        assert res.counters[0]["rejected"] == 2
        rej = eng.rejects().to_pandas().sort_values("anchor_idx")
        assert list(rej["to_url"]) == ["/%zz", "ht tp://x/"]
        assert set(rej["status"]) == {"unparseable_href"}
        assert list(rej["round"]) == [0, 0]
