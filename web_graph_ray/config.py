"""Engine configuration.

The reference hard-codes its knobs (seed list
``cmd/link-processor/main.go:56-82``, filter tables
``pkg/linkutils/linkutils.go:17-26``, batch sizes
``cmd/link-processor/main.go:122-147``).  Here everything is explicit
config so pipelines are reproducible and tunable per deployment scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.filters import DEFAULT_FILTERS, FilterConfig

__all__ = ["CrawlConfig", "DEFAULT_SEEDS"]

# The reference's seed list (cmd/link-processor/main.go:56-82) is a
# hard-coded list of live websites; tests use synthetic seeds into the
# fixture corpus instead. Kept empty here on purpose.
DEFAULT_SEEDS: tuple[str, ...] = ()


@dataclass
class CrawlConfig:
    """All knobs of the round-based crawl engine."""

    # --- semantics ---------------------------------------------------------
    filters: FilterConfig = field(default_factory=lambda: DEFAULT_FILTERS)
    #: max pages fetched per host per round (politeness budget; None = ∞,
    #: which reproduces the reference's un-throttled FIFO BFS exactly).
    politeness_budget: int | None = None
    #: honor robots.txt rows found in the corpus (user-agent *)
    respect_robots: bool = True
    #: stop after this many rounds (None = run until frontier empty)
    max_rounds: int | None = None
    #: stop after this many visited pages (None = unbounded)
    max_pages: int | None = None
    #: frontier ordering: "fifo" (pure BFS — the reference's order),
    #: "shallow_first" (priority=depth: shallow pages first even over
    #: politeness-deferred deep ones), "deep_first" (-depth).  Admission
    #: processes (priority, seq) lexicographically; deterministic.
    priority_mode: str = "fifo"
    #: re-crawl horizon in rounds (virtual-time parity with the
    #: reference's 48 h LinkCache TTL, pkg/linkcache/linkcache.go:23):
    #: a page whose last frontier membership is more than this many
    #: rounds old is treated as unseen and re-enqueued.  None = ∞
    #: horizon (never re-crawl — the deterministic default).
    seen_ttl_rounds: int | None = None
    #: negative gate for the seen-set probe: "bloom" (default) or
    #: "cuckoo" (partial-key cuckoo filter, Fan et al. 2014 — same
    #: no-false-negative contract plus in-place deletion; state/seen.py).
    #: Exactness-neutral either way: the gate only short-circuits
    #: DEFINITELY-novel ids; maybe-seen ids are probed exactly.
    seen_gate: str = "bloom"
    #: compute per-page curation features (lang ID, quality metrics,
    #: simhash fingerprint) on extracted text — the training-data
    #: enrichment a 100 TB pipeline runs inline with the crawl
    enrich_text: bool = True

    # --- partitioning / scale ---------------------------------------------
    #: number of hash partitions for frontier/seen/politeness state.
    #: At the 10^10-URL design point this should be O(cluster cores × 4);
    #: small here, but all state paths are per-bucket regardless.
    num_buckets: int = 16
    #: partitioning key: "auto" → "host" when a politeness budget is set
    #: (per-host admission needs host locality), else "id" (page_id hash,
    #: immune to mega-host skew).  See hashing.bucket_for.
    bucket_mode: str = "auto"
    #: mega-host frontier salting (SURVEY §4.2 skew row): when a
    #: bucket's frontier exceeds this many rows at round start, its
    #: state (frontier sidecars, enqueued set, emissions partition,
    #: probe) is split across ``salt_factor`` page_id-hashed sub-shards;
    #: admission still sees the whole host group together, so politeness
    #: semantics are unchanged.  None = never split.
    salt_threshold_rows: int | None = None
    #: sub-shards per split bucket
    salt_factor: int = 8

    def resolved_bucket_mode(self) -> str:
        if self.bucket_mode != "auto":
            return self.bucket_mode
        return "host" if self.politeness_budget is not None else "id"

    # --- physical knobs -----------------------------------------------------
    # The round pipeline deliberately runs with batch_size=None — task
    # granularity is one frontier bucket (see pipelines/crawl.py), so
    # per-task memory is bounded by num_buckets + politeness budget, and
    # Ray's input bundler cannot collapse the round into one task.

    # --- io ----------------------------------------------------------------
    #: working directory for checkpoints + outputs (one subdir per round)
    work_dir: str = "/tmp/webgraph_work"
    #: corpus index location (corpus-derived, deterministic — share it
    #: across crawls of the same corpus); None → {work_dir}/corpus_idx
    corpus_idx_dir: str | None = None
    #: pluggable fetch backend: a zero-arg factory returning a batch
    #: transform (pa.Table -> pa.Table with status/html/content_type —
    #: see stages/fetch.py apply_fetch).  None → corpus-lookup FetchSim
    #: (the sandbox contract).  ``stages.fetch.make_http_fetcher`` is
    #: the live-HTTP drop-in seam.
    fetcher_factory: object | None = None
