"""Corpus generator + oracle self-consistency tests.

Key checks:
- the analytic ``text`` column equals the extractor's document text,
  byte for byte, for EVERY page (north-rule invariant ground truth)
- the round-based oracle at budget=∞ is EXACTLY the reference FIFO BFS
- politeness budget and robots produce deterministic deferrals/denials
"""

import pyarrow as pa
import pytest

from web_graph_ray.functions.extract import extract_html
from web_graph_ray.sources.synth import CorpusConfig, render_pages_table, seed_urls
from tests.oracle import run_fifo_oracle, run_oracle

CFG = CorpusConfig(n_pages=300, seed=42)


@pytest.fixture(scope="module")
def corpus() -> pa.Table:
    return render_pages_table(CFG)


@pytest.fixture(scope="module")
def seeds() -> list[str]:
    return seed_urls(CFG)


class TestSynth:
    def test_deterministic(self, corpus):
        again = render_pages_table(CFG)
        assert corpus.equals(again)

    def test_text_parity_every_page(self, corpus):
        """Extractor doc text == analytic text column, byte-identical."""
        for i in range(corpus.num_rows):
            if not corpus["content_type"][i].as_py().startswith(("text/html", "application/xhtml")):
                continue
            html = corpus["html"][i].as_py()
            got = extract_html(html).doc_text
            want = corpus["text"][i].as_py()
            assert got == want, f"text mismatch for {corpus['url'][i].as_py()}"

    def test_mega_host_skew(self, corpus):
        hosts = [u.split("/")[2] for u in corpus["url"].to_pylist()]
        mega = sum(1 for h in hosts if h == CFG.mega_host)
        assert mega / len(hosts) > 0.2

    def test_invalid_utf8_present(self, corpus):
        assert any(b"\xff" in h for h in corpus["html"].to_pylist())

    def test_seeds(self, seeds):
        assert len(seeds) >= 8
        assert any("dead.example.net" in s for s in seeds)


class TestOracleEquivalence:
    def test_round_oracle_equals_fifo_reference(self, corpus, seeds):
        """budget=∞, robots off ⇒ round-based semantics IS the reference's
        FIFO BFS: same visit order, same tables, same texts."""
        a = run_oracle(corpus, seeds)
        b = run_fifo_oracle(corpus, seeds)
        assert [v["page_id"] for v in a.visits] == [v["page_id"] for v in b.visits]
        assert [v["status"] for v in a.visits] == [v["status"] for v in b.visits]
        assert [v["depth"] for v in a.visits] == [v["depth"] for v in b.visits]
        assert a.pages == b.pages
        assert a.links == b.links
        assert a.texts == b.texts

    def test_crawl_covers_interesting_cases(self, corpus, seeds):
        r = run_oracle(corpus, seeds)
        statuses = {v["status"] for v in r.visits}
        assert "ok" in statuses and "dead" in statuses
        assert "bad_content_type" in statuses
        assert len(r.visits) > 100
        # first-wins dedup: page ids unique
        ids = [p["page_id"] for p in r.pages]
        assert len(ids) == len(set(ids))
        pairs = [(l["from_page_id"], l["to_page_id"]) for l in r.links]
        assert len(pairs) == len(set(pairs))

    def test_deep_chain_multiround(self, corpus, seeds):
        r = run_oracle(corpus, seeds)
        assert len(r.counters) >= 10  # deep chain forces many BFS rounds

    def test_politeness_budget_defers(self, corpus, seeds):
        r = run_oracle(corpus, seeds, budget=2)
        assert sum(c["deferred"] for c in r.counters) > 0
        # same pages eventually visited (politeness reorders, not drops)
        r_inf = run_oracle(corpus, seeds)
        assert {v["page_id"] for v in r.visits} == {v["page_id"] for v in r_inf.visits}
        # per-round per-host cap actually respected
        for c, frontier in zip(r.counters, r.frontiers):
            assert c["admitted"] <= 2 * len({pid for pid in frontier}) or True
        rounds = {}
        for v in r.visits:
            if v["status"] != "robots_denied":
                host = v["url"].split("/")[2].split(":")[0]
                rounds.setdefault((v["round"], host), 0)
                rounds[(v["round"], host)] += 1
        assert max(rounds.values()) <= 2

    def test_robots_denied(self, corpus, seeds):
        r = run_oracle(corpus, seeds, respect_robots=True)
        denied = [v for v in r.visits if v["status"] == "robots_denied"]
        assert denied, "robots rules should deny something"
        for v in denied:
            assert "/dir1/" in v["url"] or "/private/" in v["url"] or "/c9.html" in v["url"]

    def test_max_pages_stops(self, corpus, seeds):
        r = run_oracle(corpus, seeds, max_pages=20)
        assert sum(c["admitted"] + c["robots_denied"] for c in r.counters) == 20

    def test_budget_determinism(self, corpus, seeds):
        r1 = run_oracle(corpus, seeds, budget=3, respect_robots=True)
        r2 = run_oracle(corpus, seeds, budget=3, respect_robots=True)
        assert r1.visits == r2.visits
        assert r1.counters == r2.counters
