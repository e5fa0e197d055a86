"""CLI: run a crawl over a Parquet page corpus.

    python -m web_graph_ray.pipelines --corpus /path/pages.parquet \
        --work /tmp/crawl --seeds-file seeds.txt [--budget N] [--robots]

Owns its own Ray session (unlike the library, which never inits Ray).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    """Session init shared by every CLI entrypoint: honor RAY_ADDRESS so
    `ray job submit` connects to the cluster; num_cpus is only
    meaningful (or legal) when starting local mode."""
    import ray

    if ray.is_initialized():
        return
    addr = os.environ.get("RAY_ADDRESS", "local")
    kwargs = dict(include_dashboard=False, logging_level="ERROR")
    if addr == "local":
        kwargs["num_cpus"] = num_cpus
    ray.init(address=addr, **kwargs)


def serve_main(argv: list[str]) -> int:
    """``python -m web_graph_ray.pipelines serve``: HTTP layer over a
    crawled work dir — the reference's link-api routes
    (cmd/link-api/main.go:87-191)."""
    p = argparse.ArgumentParser(description="web_graph_ray API server")
    p.add_argument("--corpus", required=True, help="pages parquet file/dir")
    p.add_argument("--work", required=True, help="crawled work dir to serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    _init_ray(args.num_cpus)
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from ..config import CrawlConfig
    from .crawl import CrawlEngine
    from .queries import GraphQueries
    from .serve import make_server

    eng = CrawlEngine(args.corpus, CrawlConfig(work_dir=args.work))
    srv = make_server(GraphQueries(eng), args.host, args.port)
    print(json.dumps({"serving": f"http://{args.host}:{srv.server_address[1]}/"}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "serve":
        return serve_main(argv[1:])
    p = argparse.ArgumentParser(description="web_graph_ray crawl runner")
    p.add_argument("--corpus", required=True, help="pages parquet file/dir")
    p.add_argument("--work", required=True, help="work/checkpoint dir")
    p.add_argument("--seeds-file", help="file with one seed URL per line")
    p.add_argument("--seed-url", action="append", default=[], help="seed URL (repeatable)")
    p.add_argument("--budget", type=int, default=None, help="politeness: max fetches/host/round")
    p.add_argument("--robots", action="store_true", help="respect robots.txt rows in the corpus")
    p.add_argument("--max-rounds", type=int, default=None)
    p.add_argument("--max-pages", type=int, default=None)
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--priority-mode", default="fifo",
                   choices=["fifo", "shallow_first", "deep_first"],
                   help="frontier ordering (fifo = reference BFS)")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    seeds = list(args.seed_url)
    if args.seeds_file:
        with open(args.seeds_file) as f:
            seeds += [line.strip() for line in f if line.strip()]
    import os

    resuming = os.path.isdir(os.path.join(args.work, "rounds"))
    if not seeds and not resuming:
        p.error("need --seeds-file/--seed-url for a fresh crawl")

    _init_ray(args.num_cpus)
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from ..config import CrawlConfig
    from .crawl import CrawlEngine

    cfg = CrawlConfig(
        num_buckets=args.buckets,
        work_dir=args.work,
        politeness_budget=args.budget,
        respect_robots=args.robots,
        max_rounds=args.max_rounds,
        max_pages=args.max_pages,
        priority_mode=args.priority_mode,
    )
    eng = CrawlEngine(args.corpus, cfg)
    summary = eng.run(seeds or None)
    out = {
        "summary": summary,
        "counters": eng.counters(),
        "pages": eng.pages().count(),
        "links": eng.links().count(),
    }
    print(json.dumps(out, indent=1))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
