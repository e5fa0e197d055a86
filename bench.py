#!/usr/bin/env python
"""Benchmark harness.

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS, default
32) and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "crawl": {...pages/s detail...}}

Headline = the crawl engine (BASELINE.json metric: pages fetched/sec +
frontier-dedup throughput) over a bench-scale synthetic Common-Crawl-
style corpus (generated once into /tmp, cached across runs), plus the
heavy operator pipelines over the sf testdata.

``--scaling``: runs bench.py twice in FRESH processes at num_cpus=8 and
32 on the same inputs, reports pages/s at both + scaling efficiency
(speedup / cpu-ratio), updates the measured-results section of
BASELINE.md, and prints a one-line JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench corpus: heavy-ish pages so extract is compute-bound (the 100 TB
# proxy), no chain tail (that's a correctness fixture, it only adds
# fixed-overhead rounds), wide fan-out so BFS completes in few rounds
BENCH_PAGES = int(os.environ.get("WG_BENCH_PAGES", "800000"))
CORPUS_DIR = f"/tmp/wg_bench/corpus_{BENCH_PAGES}"
WORK_DIR_BASE = "/tmp/wg_bench/work"


def corpus_cfg():
    from web_graph_ray.sources.synth import CorpusConfig

    # CC-realistic weight: ~25 KB html/page so the crawl is parse/compute
    # bound (the 100 TB proxy), wide fan-out so BFS needs few rounds
    return CorpusConfig(
        n_pages=BENCH_PAGES,
        seed=42,
        n_hosts=500,
        chain_len=0,
        avg_links=14,
        filler_words=600,
    )


def bench_crawl() -> dict:
    from web_graph_ray.config import CrawlConfig
    from web_graph_ray.pipelines.crawl import CrawlEngine
    from web_graph_ray.sources.synth import seed_urls, write_corpus_ray

    ccfg = corpus_cfg()
    t0 = time.perf_counter()
    write_corpus_ray(CORPUS_DIR, ccfg)
    gen_sec = time.perf_counter() - t0

    work = f"{WORK_DIR_BASE}_{NUM_CPUS}"
    shutil.rmtree(work, ignore_errors=True)
    cfg = CrawlConfig(
        num_buckets=64,
        work_dir=work,
        corpus_idx_dir=f"/tmp/wg_bench/idx_{BENCH_PAGES}",  # corpus-derived: shared across runs/levels
        respect_robots=True,
        politeness_budget=None,
    )
    eng = CrawlEngine(CORPUS_DIR, cfg)
    t0 = time.perf_counter()
    eng.prepare()
    prep_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    summary = eng.run(seed_urls(ccfg))
    crawl_sec = time.perf_counter() - t0
    counters = eng.counters()
    fetched = sum(c["fetched"] for c in counters)
    links = sum(c["discovered"] + c["deduped"] for c in counters)
    return {
        "corpus_gen_sec": round(gen_sec, 2),
        "prepare_sec": round(prep_sec, 2),
        "crawl_sec": round(crawl_sec, 2),
        "rounds": summary["rounds"],
        "pages_fetched": fetched,
        "links_extracted": links,
        "pages_per_sec": round(fetched / crawl_sec, 1),
        "links_per_sec": round(links / crawl_sec, 1),
        "frontier_dedup_per_sec": round(links / crawl_sec, 1),
    }


def bench_queries() -> dict:
    import __ray_entry__ as entrymod

    names = [
        "q1_lineitem_agg",
        "window_tumbling_events",
        "exact_dedup_documents",
        "minhash_pairs_documents",
        "ann_cosine_topk",
        "join_orders_customers",
        "pagerank_lineitem_graph",
        "concomp_lineitem_graph",
        "decontaminate_documents",
        "ivf_ann_topk",
        "quantiles_lineitem_price",
        "passage_dedup_documents",
        "kmeans_embeddings",
        "hits_lineitem_graph",
        "quality_filter_documents",
        "rank_stats_events",
        "weighted_sample_documents",
        "mix_corpus_documents",
        "quantize_embeddings",
        "global_rank_lineitem",
        "curate_documents",
        "redact_pii_documents",
        "chunk_documents_windows",
        "pack_examples_documents",
        "q3_shipping_priority",
        "bloom_semi_join_orders",
        # r4 tail additions: the raw-score exchange + TeraSort prefix
        # sum (auc) and the keyed_lag pair fold (markov) are the two
        # heaviest new shapes
        "auc_weekend_events",
        "markov_transitions_events",
    ]
    out = {}
    qs = entrymod.queries()
    for name in names:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas() if not hasattr(res, "materialize") else res.materialize()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_once(crawl_only: bool = False) -> dict:
    import logging

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # keep stdout = exactly one JSON line
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    crawl = bench_crawl()
    queries = {} if crawl_only else bench_queries()
    total = crawl["crawl_sec"] + sum(queries.values())
    result = {
        "metric": "crawl pages fetched/sec + operator pipeline seconds",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {"crawl": crawl["crawl_sec"], **queries},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "crawl": crawl,
    }
    ray.shutdown()
    if not crawl_only and os.environ.get("WG_BENCH_AB", "1") != "0":
        # same-session A/B vs the previous round's code, evidence-grade
        # (VERDICT r4 "What's wrong #3": ONE alternation cannot separate a
        # 10-20% code regression from this VM's ±25% co-tenant drift):
        # >=3 interleaved {head, prev} fresh-process runs per side — this
        # process's numbers are head sample 1 — with per-pipeline MEDIANS
        # recorded alongside every raw sample, so BENCH_r{N}.json carries
        # a drift-robust per-pipeline ratio.
        ref = os.environ.get("WG_AB_REF") or _prev_round_ref()
        if ref is not None:
            try:
                wt = _ab_worktree(ref)
                reps = max(1, int(os.environ.get("WG_BENCH_AB_PAIRS", "3")))
                # wall budget: never let the A/B starve the recorded bench
                # of its one JSON line — degrade to fewer pairs instead
                budget = float(os.environ.get("WG_BENCH_AB_BUDGET_SEC", "1800"))
                t_ab = time.perf_counter()
                head_runs, prev_runs = [result], []
                while len(prev_runs) < reps:  # interleave: H p h p h p
                    prev_runs.append(_run_child(NUM_CPUS, cwd=wt))
                    if len(head_runs) < reps:
                        head_runs.append(_run_child(NUM_CPUS))
                    if time.perf_counter() - t_ab > budget:
                        break
                common = sorted(
                    set.intersection(
                        *(set(r["queries"]) for r in head_runs + prev_runs)
                    )
                )

                def med(vals):
                    return sorted(vals)[len(vals) // 2]

                pairs = {}
                ratios = []
                for k in common:
                    h = [r["queries"][k] for r in head_runs]
                    p = [r["queries"][k] for r in prev_runs]
                    pairs[k] = {
                        "head": med(h),
                        "prev": med(p),
                        "head_raw": [round(v, 3) for v in h],
                        "prev_raw": [round(v, 3) for v in p],
                        "ratio": round(med(h) / med(p), 3) if med(p) else None,
                    }
                    if med(p):
                        ratios.append(med(h) / med(p))
                result["ab"] = {
                    "prev_ref": ref,
                    "n_pairs": len(prev_runs),
                    "protocol": "interleaved fresh processes, median per side",
                    "pairs": pairs,
                    "median_ratio": round(med(ratios), 3) if ratios else None,
                }
            except Exception as exc:  # A/B is advisory — never fail the bench
                result["ab"] = {"error": f"{type(exc).__name__}: {exc}"}
    return result


def _run_child(ncpu: int, extra: list[str] | None = None, cwd: str | None = None):
    """One fresh-process bench run (crawl-only unless extra says otherwise)."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), WG_BENCH_AB="0")
    path = os.path.join(cwd, "bench.py") if cwd else os.path.abspath(__file__)
    out = subprocess.run(
        [sys.executable, path] + (extra or []),
        env=env, capture_output=True, text=True, check=True, cwd=cwd,
    ).stdout
    return json.loads(out.strip().splitlines()[-1]) if "--gen-only" not in (extra or []) else None


_HW_PROBE = r'''
import hashlib, time
n = 0
deadline = time.monotonic() + 8.0
buf = b"x" * 65536
while time.monotonic() < deadline:
    hashlib.sha256(buf).digest(); n += 1
print(n)
'''


_HW_MONITOR = r'''
import hashlib, time, sys
buf = b"x" * 65536
while True:
    t0 = time.monotonic(); n = 0
    while time.monotonic() - t0 < 1.0:
        hashlib.sha256(buf).digest(); n += 1
    print(n, flush=True)
'''


class _HostMonitor:
    """Continuous single-process sha256 rate sampler (1 Hz), run DURING
    a measured crawl: its mean rate is the host's effective CPU speed
    over exactly that window.  One stdlib process on a 32-cpu box —
    negligible contention at either measured level (4 or 16 procs) and
    identical perturbation at both.  The lo/hi rate ratio lets a reader
    normalize away hypervisor co-tenant drift that a before/after probe
    cannot see."""

    def __enter__(self):
        self.proc = subprocess.Popen(
            [sys.executable, "-c", _HW_MONITOR],
            stdout=subprocess.PIPE, text=True,
        )
        return self

    def __exit__(self, *exc):
        self.proc.terminate()
        out, _ = self.proc.communicate()
        rates = [int(x) for x in out.split()]
        # drop the warmup second; an empty tail means the window was <2 s
        self.rates = rates[1:] or rates
        self.mean_rate = (
            round(sum(self.rates) / len(self.rates)) if self.rates else 0
        )


def _hw_calibration(lo_cpus: int, hi_cpus: int) -> dict:
    """Concurrent-hardware probe: aggregate sha256 throughput of
    lo_cpus vs hi_cpus independent stdlib processes (no Ray, no IO).
    On an idle host this scales ~1.0; under hypervisor co-tenant load
    the hi level degrades first.  Recording it next to each scaling
    measurement separates the ENGINE's scaling from the host's state
    at measurement time."""
    def level(k: int) -> float:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _HW_PROBE], stdout=subprocess.PIPE
            )
            for _ in range(k)
        ]
        return sum(int(p.communicate()[0]) for p in procs) / 8.0

    lo, hi = level(lo_cpus), level(hi_cpus)
    return {
        "hashes_per_sec": [round(lo), round(hi)],
        "hw_efficiency": round(hi / lo / (hi_cpus / lo_cpus), 3),
    }


def run_scaling() -> dict:
    # N and 4N, both below this VM's parallel-throughput ceiling: pure
    # single-process extraction scales 4→16 procs at ~1.0 efficiency
    # here but degrades ~0.73 beyond 16 (host/bandwidth limit), so
    # 4 vs 16 isolates the ENGINE's scaling from the box's ceiling.
    #
    # Noise protocol (VERDICT r3 item 2): the two levels run
    # INTERLEAVED (lo,hi,lo,hi,...) so slow co-tenant drift hits both
    # levels equally, efficiency is computed from the MEDIAN of ≥3
    # runs per level (median-of-k rejects the one-off co-tenant spike
    # that min-of-k can land on), and every raw wall time is recorded.
    lo_cpus, hi_cpus = 4, 16
    repeats = int(os.environ.get("WG_SCALING_REPEATS", "3"))
    _run_child(32, ["--gen-only"])  # build corpus + index at full
    #                                 parallelism, so both levels start warm
    # Idle-gating: the hypervisor hosting this VM carries co-tenant load
    # that drifts on ~10-minute scales and suppresses the 16-proc level
    # disproportionately (biasing the engine number DOWN).  A single-proc
    # sha256 probe measures the host's current speed; each (lo,hi) pair
    # starts only when the host is within 7% of the best rate seen, up
    # to a bounded wait.  During each crawl a 1 Hz monitor records the
    # concurrent host rate, so every wall time in the output carries the
    # host state it was measured under.
    probe_ref = 0
    gate_wait = float(os.environ.get("WG_SCALING_GATE_WAIT", "600"))

    def probe_rate() -> int:
        p = subprocess.run(
            [sys.executable, "-c", _HW_PROBE], capture_output=True, text=True
        )
        return round(int(p.stdout) / 8.0)

    def wait_idle() -> int:
        nonlocal probe_ref
        deadline = time.monotonic() + gate_wait
        while True:
            r = probe_rate()
            probe_ref = max(probe_ref, r)
            if r >= 0.93 * probe_ref or time.monotonic() >= deadline:
                return r
            time.sleep(30)

    lo_runs, hi_runs, calibs, monitors = [], [], [], []
    for _ in range(repeats):
        gate_rate = wait_idle()
        calibs.append(_hw_calibration(lo_cpus, hi_cpus))
        with _HostMonitor() as m_lo:
            lo_runs.append(_run_child(lo_cpus, ["--crawl-only"]))
        with _HostMonitor() as m_hi:
            hi_runs.append(_run_child(hi_cpus, ["--crawl-only"]))
        monitors.append(
            {
                "gate_rate": gate_rate,
                "rate_during_lo": m_lo.mean_rate,
                "rate_during_hi": m_hi.mean_rate,
            }
        )
    calibs.append(_hw_calibration(lo_cpus, hi_cpus))

    def med(runs):
        s = sorted(runs, key=lambda r: r["crawl"]["crawl_sec"])
        return s[len(s) // 2]

    lo, hi = med(lo_runs), med(hi_runs)
    ratio = hi_cpus / lo_cpus
    speedup = lo["crawl"]["crawl_sec"] / hi["crawl"]["crawl_sec"]
    eff = speedup / ratio
    # Per-pair efficiency, raw and host-normalized: scaling wall time by
    # the concurrent host rate (rate_during_lo / rate_during_hi cancels
    # any common reference) converts each pair to equal-host conditions —
    # the engine-intrinsic number the raw median approaches on an idle
    # host.  Both are recorded; neither overwrites the raw medians.
    pair_eff, pair_eff_norm = [], []
    for i, m in enumerate(monitors):
        lo_s = lo_runs[i]["crawl"]["crawl_sec"]
        hi_s = hi_runs[i]["crawl"]["crawl_sec"]
        pair_eff.append(round(lo_s / hi_s / ratio, 3))
        if m["rate_during_lo"] and m["rate_during_hi"]:
            pair_eff_norm.append(
                round(
                    (lo_s * m["rate_during_lo"])
                    / (hi_s * m["rate_during_hi"])
                    / ratio,
                    3,
                )
            )
    summary = {
        "metric": "crawl scaling efficiency (N→4N cpus, interleaved fresh processes, median of %d)" % repeats,
        "cpus": [lo_cpus, hi_cpus],
        "crawl_sec": [lo["crawl"]["crawl_sec"], hi["crawl"]["crawl_sec"]],
        "crawl_sec_all_runs": {
            "lo": [r["crawl"]["crawl_sec"] for r in lo_runs],
            "hi": [r["crawl"]["crawl_sec"] for r in hi_runs],
        },
        "pages_per_sec": [lo["crawl"]["pages_per_sec"], hi["crawl"]["pages_per_sec"]],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        # host state bracketing each (lo,hi) pair + one after the last:
        # hw_efficiency ~1.0 = idle host, lower = hypervisor co-tenant
        # load (which suppresses the 16-proc level and biases the
        # engine number DOWN — see BASELINE.md)
        "hw_calibration": calibs,
        "host_monitor": monitors,
        "pair_efficiency": pair_eff,
        "pair_efficiency_host_normalized": pair_eff_norm,
        "lo": lo,
        "hi": hi,
    }
    _update_baseline_md(summary)
    return summary


def _prev_round_ref() -> str | None:
    """Most recent driver round-boundary commit ('round N: ...')."""
    try:
        out = subprocess.run(
            ["git", "log", "--grep=^round [0-9]", "--format=%H %s", "-1"],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
        return out.split()[0] if out else None
    except Exception:
        return None


def _ab_worktree(ref: str) -> str:
    """Check out ``ref`` once into a /tmp git worktree (cached)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    wt = f"/tmp/wg_ab/{ref[:12]}"
    if not os.path.exists(os.path.join(wt, "bench.py")):
        os.makedirs("/tmp/wg_ab", exist_ok=True)
        shutil.rmtree(wt, ignore_errors=True)
        subprocess.run(
            ["git", "worktree", "add", "--force", "--detach", wt, ref],
            cwd=repo, check=True, capture_output=True,
        )
    return wt


def run_ab() -> dict:
    """Same-session A/B vs the previous round's code (VERDICT r3 item 4):
    alternate fresh-process runs of HEAD and the last round-boundary
    commit (checked out once into a /tmp git worktree, sharing the warm
    /tmp corpus + index), so per-pipeline deltas are attributable to
    code rather than co-tenant drift.  Pairs = {prev, head} seconds."""
    ref = os.environ.get("WG_AB_REF") or _prev_round_ref()
    if ref is None:
        return {"error": "no previous round-boundary commit found"}
    wt = _ab_worktree(ref)
    reps = int(os.environ.get("WG_AB_REPEATS", "2"))
    _run_child(NUM_CPUS, ["--gen-only"])  # warm corpus+index for both sides
    pairs = {"head": [], "prev": []}
    for _ in range(reps):  # interleaved: head, prev, head, prev, ...
        pairs["head"].append(_run_child(NUM_CPUS))
        pairs["prev"].append(_run_child(NUM_CPUS, cwd=wt))

    def med_queries(runs):
        keys = set.intersection(*(set(r["queries"]) for r in runs))
        return {
            k: sorted(r["queries"][k] for r in runs)[len(runs) // 2] for k in keys
        }

    head_q, prev_q = med_queries(pairs["head"]), med_queries(pairs["prev"])
    common = sorted(set(head_q) & set(prev_q))
    return {
        "metric": "same-session A/B, HEAD vs previous round (median of %d interleaved fresh runs)" % reps,
        "prev_ref": ref,
        "num_cpus": NUM_CPUS,
        "pairs": {k: {"prev": prev_q[k], "head": head_q[k]} for k in common},
        "crawl_raw": {
            "head": [r["crawl"]["crawl_sec"] for r in pairs["head"]],
            "prev": [r["crawl"]["crawl_sec"] for r in pairs["prev"]],
        },
        "head_only": sorted(set(head_q) - set(prev_q)),
    }


def _update_baseline_md(s: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    begin, end = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"
    block = f"""{begin}
## Measured (bench.py --scaling, single node, fresh processes per level)

| num_cpus | crawl wall (s) | pages/s | links+dedup rows/s |
|---|---|---|---|
| {s['cpus'][0]} | {s['crawl_sec'][0]} | {s['pages_per_sec'][0]} | {s['lo']['crawl']['links_per_sec']} |
| {s['cpus'][1]} | {s['crawl_sec'][1]} | {s['pages_per_sec'][1]} | {s['hi']['crawl']['links_per_sec']} |

Scaling efficiency {s['cpus'][0]}→{s['cpus'][1]} cpus: **{s['scaling_efficiency']}**
(speedup {s['speedup']}× over a {s['cpus'][1] // s['cpus'][0]}× cpu ratio; corpus:
{BENCH_PAGES} synthetic pages, identical input both levels, page cache warm;
INTERLEAVED lo/hi fresh processes, MEDIAN of
{len(s.get('crawl_sec_all_runs', {}).get('lo', [1]))} runs per level —
this shared VM shows ±25% co-tenant swings at 16 procs; all runs:
lo={s.get('crawl_sec_all_runs', {}).get('lo')} hi={s.get('crawl_sec_all_runs', {}).get('hi')}).
Host state (1-proc sha256 probe): idle-gate rates + concurrent rates
during each crawl {s.get('host_monitor')}; bracketing 4-vs-16-proc
hw calibrations {[c.get('hw_efficiency') for c in s.get('hw_calibration', [])]}.
Per-pair efficiency raw {s.get('pair_efficiency')} /
host-normalized {s.get('pair_efficiency_host_normalized')} (wall times
rescaled by the concurrent host rate — the engine-intrinsic number).
{end}"""
    with open(path) as f:
        text = f.read()
    if begin in text:
        pre = text.split(begin)[0]
        post = text.split(end)[1] if end in text else ""
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)


def run_index_micro() -> dict:
    """Repeated-query serving micro-bench: point lookups from the
    compact() adjacency indexes vs the materialized-scan fallback.
    Updates the INDEXMICRO block of BASELINE.md."""
    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR", log_to_driver=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from web_graph_ray.config import CrawlConfig
    from web_graph_ray.pipelines.crawl import CrawlEngine
    from web_graph_ray.pipelines.queries import GraphQueries
    from web_graph_ray.sources.synth import CorpusConfig, seed_urls, write_corpus_ray

    ccfg = CorpusConfig(n_pages=100_000, seed=42, n_hosts=200, chain_len=0,
                        avg_links=10, filler_words=100)
    corpus = "/tmp/wg_bench/idx_micro_corpus"
    work = "/tmp/wg_bench/idx_micro_work"
    write_corpus_ray(corpus, ccfg)
    eng = CrawlEngine(corpus, CrawlConfig(num_buckets=64, work_dir=work))
    t0 = time.perf_counter()
    eng.run(seed_urls(ccfg))  # resumes/no-ops if the cached crawl exists
    crawl_sec = time.perf_counter() - t0

    # compaction cost triptych (VERDICT r3 item 7):
    #   full  — index removed, rebuild over every committed round
    #   incr  — manifest rolled back one round, so compact() first-wins-
    #           unions ONLY the last round's winners against the index
    #           (exactly the tested resume-and-recompact path's cost)
    #   noop  — manifest current, compact() returns immediately
    import shutil as _sh

    from web_graph_ray.state.checkpoint import atomic_write_json, read_json

    idx_dir = os.path.join(work, "index")
    man_path = os.path.join(idx_dir, "MANIFEST.json")
    _sh.rmtree(idx_dir, ignore_errors=True)
    t0 = time.perf_counter()
    man = eng.compact()
    compact_full_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.compact()
    compact_noop_sec = time.perf_counter() - t0
    m = read_json(man_path)
    m["through_round"] -= 1  # treat the last committed round as new
    atomic_write_json(m, man_path)
    t0 = time.perf_counter()
    man_incr = eng.compact()
    compact_incr_sec = time.perf_counter() - t0
    assert man_incr["n_pages"] == man["n_pages"] and man_incr["n_links"] == man["n_links"]

    idx = GraphQueries(eng, use_index=True)
    scan = GraphQueries(eng, use_index=False)
    sample = eng.pages().limit(300).to_pandas()
    ids = sorted(sample["page_id"])[:50]
    hosts = sorted(sample["host"].unique())[:10]
    scan.pages, scan.links  # noqa: B018 — warm (serving-startup cost, untimed)
    idx.page(ids[0])  # warm one file read

    def drive(q) -> float:
        t0 = time.perf_counter()
        for pid in ids:
            q.page(pid)
            q.links_from(pid).to_pandas()
            q.links_to(pid).to_pandas()
        for h in hosts:
            q.pages_by_host(h).to_pandas()
        return time.perf_counter() - t0

    n_queries = 3 * len(ids) + len(hosts)
    idx_sec, scan_sec = drive(idx), drive(scan)
    result = {
        "metric": "indexed vs scan point-query serving",
        "n_pages": man["n_pages"], "n_links": man["n_links"],
        "n_queries": n_queries,
        "crawl_sec": round(crawl_sec, 2),
        "compact_full_sec": round(compact_full_sec, 2),
        "compact_incr_sec": round(compact_incr_sec, 2),
        "compact_noop_sec": round(compact_noop_sec, 3),
        "idx_sec": round(idx_sec, 3), "scan_sec": round(scan_sec, 3),
        "idx_qps": round(n_queries / idx_sec, 1),
        "scan_qps": round(n_queries / scan_sec, 1),
        "speedup": round(scan_sec / idx_sec, 1),
    }
    begin, end = "<!-- INDEXMICRO:BEGIN -->", "<!-- INDEXMICRO:END -->"
    block = f"""{begin}
## Serving micro-bench (bench.py --index-micro)

{n_queries} point queries (page / linksFrom / linksTo / pages-by-host) over a
{man['n_pages']:,}-page / {man['n_links']:,}-link crawl, num_cpus={NUM_CPUS}:
materialized-scan fallback {result['scan_qps']} q/s vs compact() adjacency
indexes **{result['idx_qps']} q/s** — **{result['speedup']}× faster**
compact(): full rebuild {result['compact_full_sec']} s, incremental
re-compact after 1 new round {result['compact_incr_sec']} s, no-op
{result['compact_noop_sec']} s — re-compact cost tracks the new rounds'
data, not the crawl size.
{end}"""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    with open(path) as f:
        text = f.read()
    if begin in text:
        text = text.split(begin)[0] + block + text.split(end)[1]
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)
    ray.shutdown()
    return result


def run_gen_only() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR", log_to_driver=False)
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from web_graph_ray.config import CrawlConfig
    from web_graph_ray.pipelines.crawl import CrawlEngine
    from web_graph_ray.sources.synth import write_corpus_ray

    write_corpus_ray(CORPUS_DIR, corpus_cfg())
    cfg = CrawlConfig(
        num_buckets=64, work_dir="/tmp/wg_bench/work_gen",
        corpus_idx_dir=f"/tmp/wg_bench/idx_{BENCH_PAGES}", respect_robots=True,
    )
    CrawlEngine(CORPUS_DIR, cfg).prepare()
    ray.shutdown()


if __name__ == "__main__":
    if "--gen-only" in sys.argv:
        run_gen_only()
        print("{}")
    elif "--index-micro" in sys.argv:
        print(json.dumps(run_index_micro()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--ab" in sys.argv:
        print(json.dumps(run_ab()))
    elif "--crawl-only" in sys.argv:
        print(json.dumps(run_once(crawl_only=True)))
    else:
        print(json.dumps(run_once()))
