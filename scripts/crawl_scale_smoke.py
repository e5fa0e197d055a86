#!/usr/bin/env python
"""10x crawl scale smoke (VERDICT r4 item 4): one ~8M-page crawl —
10x the bench corpus page count — at 32 cpus in the 128 GiB sandbox,
recording wall, pages/s, peak RSS, and per-round sidecar counts.

Page weight is cut vs the bench corpus (filler_words 150 vs 600,
~6 KB vs ~25 KB html) so the corpus fits the sandbox disk: this smoke
exists to stress page-COUNT-scaled state — seen-set growth, frontier
file counts, TTL sidecar churn, per-bucket exchange width — not byte
throughput, which the bench corpus already covers.

Usage: python scripts/crawl_scale_smoke.py [n_pages]   (default 8M)
Prints one JSON line; caller records it in BASELINE.md and removes
/tmp/wg_scale afterwards (the corpus is ~10-25 GB on disk).
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_sampler(stop, out):
    """1 Hz system-wide used-memory + driver-RSS sampler (peak)."""
    pid = os.getpid()

    def used_kb():
        with open("/proc/meminfo") as f:
            mi = dict(
                (l.split(":")[0], int(l.split()[1])) for l in f if ":" in l
            )
        return mi["MemTotal"] - mi["MemAvailable"]

    def my_rss_kb():
        with open(f"/proc/{pid}/status") as f:
            for l in f:
                if l.startswith("VmRSS"):
                    return int(l.split()[1])
        return 0

    base = used_kb()
    while not stop.is_set():
        out["peak_sys_used_gb"] = max(
            out.get("peak_sys_used_gb", 0), round(used_kb() / 1e6, 2)
        )
        out["peak_driver_rss_gb"] = max(
            out.get("peak_driver_rss_gb", 0), round(my_rss_kb() / 1e6, 2)
        )
        stop.wait(1.0)
    out["base_sys_used_gb"] = round(base / 1e6, 2)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from web_graph_ray.config import CrawlConfig
    from web_graph_ray.pipelines.crawl import CrawlEngine
    from web_graph_ray.sources.synth import (
        CorpusConfig,
        seed_urls,
        write_corpus_ray,
    )

    ccfg = CorpusConfig(
        n_pages=n_pages, seed=42, n_hosts=1000, chain_len=0,
        avg_links=14, filler_words=150,
    )
    corpus = f"/tmp/wg_scale/corpus_{n_pages}"
    work = f"/tmp/wg_scale/work_{n_pages}"
    import shutil

    shutil.rmtree(work, ignore_errors=True)

    mem: dict = {}
    stop = threading.Event()
    t = threading.Thread(target=_rss_sampler, args=(stop, mem), daemon=True)
    t.start()

    t0 = time.perf_counter()
    write_corpus_ray(corpus, ccfg)
    gen_sec = time.perf_counter() - t0

    cfg = CrawlConfig(
        num_buckets=128,  # 2x bench buckets for 10x pages
        work_dir=work,
        corpus_idx_dir=f"/tmp/wg_scale/idx_{n_pages}",
        respect_robots=True,
        politeness_budget=None,
    )
    eng = CrawlEngine(corpus, cfg)
    t0 = time.perf_counter()
    eng.prepare()
    prep_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    summary = eng.run(seed_urls(ccfg))
    crawl_sec = time.perf_counter() - t0
    stop.set()
    t.join(3)

    counters = eng.counters()
    fetched = sum(c["fetched"] for c in counters)
    links = sum(c["discovered"] + c["deduped"] for c in counters)
    per_round = [
        {
            "round": c.get("round", i),
            "fetched": c["fetched"],
            "discovered": c["discovered"],
            "deduped": c["deduped"],
        }
        for i, c in enumerate(counters)
    ]
    # frontier sidecar file counts per round (the state whose growth the
    # smoke is checking)
    rounds_root = os.path.join(work, "rounds")
    sidecars = {}
    for name in sorted(os.listdir(rounds_root)):
        fr = os.path.join(rounds_root, name, "frontier")
        cnt = 0
        for sub in ("novel", "deferred"):
            d = os.path.join(fr, sub)
            if os.path.isdir(d):
                cnt += len(os.listdir(d))
        sidecars[name] = cnt
    du = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(work) for f in fs
    )
    print(json.dumps({
        "n_pages_corpus": n_pages,
        "num_cpus": num_cpus,
        "corpus_gen_sec": round(gen_sec, 1),
        "prepare_sec": round(prep_sec, 1),
        "crawl_sec": round(crawl_sec, 1),
        "rounds": summary["rounds"],
        "pages_fetched": fetched,
        "links_extracted": links,
        "pages_per_sec": round(fetched / crawl_sec, 1),
        "links_per_sec": round(links / crawl_sec, 1),
        "peak_sys_used_gb": mem.get("peak_sys_used_gb"),
        "peak_driver_rss_gb": mem.get("peak_driver_rss_gb"),
        "base_sys_used_gb": mem.get("base_sys_used_gb"),
        "work_dir_gb": round(du / 1e9, 2),
        "frontier_files_per_round": sidecars,
        "per_round_counters": per_round,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
