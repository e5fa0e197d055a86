#!/usr/bin/env python
"""Cuckoo-vs-bloom seen-gate A/B under a TTL window (VERDICT r4 item 5).

Crawls the bench corpus with ``seen_ttl_rounds`` set, alternating the
``seen_gate`` between fresh child processes (interleaved, median per
side), so the claimed O(delta)-vs-O(window) TTL-advance win of the
cuckoo gate (state/seen.py:84, SURVEY §2.8) gets a measured number.

A corpus with a TTL window needs many rounds to exercise the horizon:
the bench corpus BFS finishes in ~8 rounds, so this uses a chain-heavy
corpus (chain_len forces depth) plus the TTL window, where per-round
seen maintenance dominates.

Usage: python scripts/ttl_gate_ab.py [pairs]   (default 3)
Prints one JSON line with raws + medians.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CHILD = r"""
import json, shutil, sys, time
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR", log_to_driver=False)
import logging
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
sys.path.insert(0, ".")
from web_graph_ray.config import CrawlConfig
from web_graph_ray.pipelines.crawl import CrawlEngine
from web_graph_ray.sources.synth import CorpusConfig, seed_urls, write_corpus_ray

gate = sys.argv[1]
ccfg = CorpusConfig(n_pages=200_000, seed=42, n_hosts=300, chain_len=30,
                    avg_links=10, filler_words=200)
corpus = "/tmp/wg_ttl_ab/corpus"
write_corpus_ray(corpus, ccfg)  # cached across children
work = f"/tmp/wg_ttl_ab/work_{gate}"
shutil.rmtree(work, ignore_errors=True)
cfg = CrawlConfig(num_buckets=64, work_dir=work,
                  corpus_idx_dir="/tmp/wg_ttl_ab/idx",
                  respect_robots=True, politeness_budget=None,
                  seen_ttl_rounds=6, max_rounds=24, seen_gate=gate)
eng = CrawlEngine(corpus, cfg)
eng.prepare()
t0 = time.perf_counter()
summary = eng.run(seed_urls(ccfg))
wall = time.perf_counter() - t0
fetched = sum(c["fetched"] for c in eng.counters())
print(json.dumps({"gate": gate, "crawl_sec": round(wall, 2),
                  "rounds": summary["rounds"], "fetched": fetched}))
ray.shutdown()
"""


def run(gate: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, gate], cwd="/root/repo",
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res = {"bloom": [], "cuckoo": []}
    fetched = set()
    for i in range(pairs):
        for gate in ("bloom", "cuckoo"):
            r = run(gate)
            res[gate].append(r["crawl_sec"])
            fetched.add((r["rounds"], r["fetched"]))
    med = lambda v: sorted(v)[len(v) // 2]
    assert len(fetched) == 1, f"gates diverged: {fetched}"  # output parity
    print(json.dumps({
        "metric": "crawl_sec under seen_ttl_rounds=6, 24 rounds, "
                  "200k-page chain corpus, 32 cpus, interleaved pairs",
        "pairs": pairs,
        "rounds_fetched": sorted(fetched)[0],
        "bloom_raw": res["bloom"], "cuckoo_raw": res["cuckoo"],
        "bloom_median": med(res["bloom"]),
        "cuckoo_median": med(res["cuckoo"]),
        "cuckoo_over_bloom": round(med(res["cuckoo"]) / med(res["bloom"]), 3),
    }))


if __name__ == "__main__":
    main()
