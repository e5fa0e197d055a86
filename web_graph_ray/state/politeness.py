"""Politeness primitives: robots.txt rules + per-host round budgets.

The reference has NO politeness (only a UA string at
``pkg/linkprocessor/linkprocessor.go:114`` and a 10 s timeout; README's
"backoff" is not implemented — fetch errors are dropped at
``cmd/link-processor/main.go:176-179``).  Politeness here is the
north_rule extension, defined in *virtual time* (per-round budgets)
so results are bit-reproducible at any parallelism:

- robots.txt: corpus rows whose path is ``/robots.txt`` are parsed into
  per-agent groups of ``Allow``/``Disallow`` path-prefix rules; a URL is
  allowed per the standard longest-prefix-match rule (Google REP: the
  most specific matching rule wins, ties prefer Allow, no matching rule
  means allow).  Group selection: the configured user agent's group if
  present, else the ``*`` group.  A disallowed URL is dropped at
  frontier admission (counted ``robots_denied``, never fetched).
- budget: at most ``politeness_budget`` pages fetched per hostname per
  round, admitted in deterministic ``(priority, seq)`` order; the rest
  are deferred to the next round (counted ``deferred``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

__all__ = [
    "parse_robots",
    "parse_robots_groups",
    "parse_sitemap_directives",
    "RobotsRules",
    "load_robots_rules",
]


def parse_sitemap_directives(body: str) -> list[str]:
    """``Sitemap:`` lines from a robots.txt body (RFC 9309 §2.3 /
    sitemaps.org): host-wide and group-independent, so they are
    collected separately from the Allow/Disallow groups — in file
    order, deduped preserving first occurrence.  The returned absolute
    URLs are crawl seeds: fetch each and hand the bytes to
    ``sources.sitemap.parse_sitemap`` (or a shard directory to
    ``read_sitemaps``) to expand into frontier rows."""
    out: list[str] = []
    seen: set[str] = set()
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        key, _, value = line.partition(":")
        value = value.strip()
        if key.strip().lower() == "sitemap" and value and value not in seen:
            seen.add(value)
            out.append(value)
    return out


def parse_robots_groups(body: str) -> dict[str, list[list]]:
    """Parse a robots.txt body → {agent(lowercase): [[allow, prefix]]}.

    Standard group semantics: consecutive ``User-agent`` lines share the
    following rule block; a later group for the same agent token appends
    (the REP treats groups for one agent as merged).  Rules are
    ``[allow: bool, prefix: str]`` lists (JSON-serializable — groups are
    persisted in robots.json).  Empty-value Disallow ("allow all") adds
    no rule.  Comments (#) stripped; unknown directives ignored.
    """
    groups: dict[str, list[list]] = {}
    current: list[str] = []
    last_was_agent = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent:
                current = []
            current.append(value.lower())
            for agent in current:
                groups.setdefault(agent, [])
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            if value:
                for agent in current:
                    groups[agent].append([key == "allow", value])
            # empty Disallow = allow-all: no rule needed; empty Allow is
            # meaningless — both skipped
        else:
            last_was_agent = False
    return groups


def parse_robots(body: str, user_agent: str = "*") -> list[list]:
    """Robots body → the rule list for ``user_agent``: the agent's own
    group when present, else the ``*`` group.  Rules are
    ``[allow, prefix]`` in file order; matching is longest-prefix-wins
    (see RobotsRules.is_allowed)."""
    groups = parse_robots_groups(body)
    ua = user_agent.lower()
    if ua in groups:
        return groups[ua]
    return groups.get("*", [])


def _norm_rule(rule) -> tuple[bool, str]:
    """Accept both the v2 [allow, prefix] form and the legacy plain
    'prefix' string form (old robots.json files = Disallow only)."""
    if isinstance(rule, str):
        return False, rule
    return bool(rule[0]), rule[1]


@dataclass
class RobotsRules:
    """Per-host Allow/Disallow prefix rule tables."""

    by_host: dict[str, list] = field(default_factory=dict)

    @classmethod
    def from_bodies(cls, bodies: dict[str, str], user_agent: str = "*") -> "RobotsRules":
        return cls({host: parse_robots(body, user_agent) for host, body in bodies.items()})

    def is_allowed(self, hostname: str, escaped_path: str) -> bool:
        """Longest-prefix-match (Google REP): among matching rules the
        longest prefix wins; ties prefer Allow; no match ⇒ allowed."""
        rules = self.by_host.get(hostname)
        if not rules:
            return True
        path = escaped_path or "/"
        best_len, best_allow = -1, True
        for rule in rules:
            allow, prefix = _norm_rule(rule)
            if path.startswith(prefix):
                n = len(prefix)
                if n > best_len or (n == best_len and allow and not best_allow):
                    best_len, best_allow = n, allow
        return best_allow

    def denied_mask(self, hostnames: "pd.Series", paths: "pd.Series") -> "pd.Series":
        """Vectorized ¬is_allowed over aligned hostname/path Series:
        group by the FEW hosts that have rules; per rule one vectorized
        str.startswith, tracking the longest-match winner — no per-row
        Python in the admission hot path."""
        import numpy as np
        import pandas as pd

        denied = pd.Series(False, index=hostnames.index)
        if not self.by_host:
            return denied
        hosted = hostnames.isin(self.by_host.keys())
        if not hosted.any():
            return denied
        sub_hosts = hostnames[hosted]
        # null/empty paths normalize to "/" — must agree with is_allowed
        # (fillna BEFORE the empty-string mask, or NaN becomes "" =
        # allowed while the scalar path denies it under 'Disallow: /')
        p0 = paths[hosted].fillna("/")
        sub_paths = p0.mask(p0.eq(""), "/")
        for host, idx in sub_hosts.groupby(sub_hosts).groups.items():
            rules = self.by_host.get(host)
            if not rules:
                continue
            p = sub_paths.loc[idx]
            best_len = np.full(len(p), -1, dtype=np.int64)
            best_allow = np.ones(len(p), dtype=bool)
            for rule in rules:
                allow, prefix = _norm_rule(rule)
                m = p.str.startswith(prefix).to_numpy()
                n = len(prefix)
                better = m & (
                    (n > best_len) | ((n == best_len) & allow & ~best_allow)
                )
                best_len[better] = n
                best_allow[better] = allow
            denied.loc[idx] = ~best_allow
        return denied


# -- per-worker robots state (bucket-affine sidecar loads) -------------------
#
# Robots rules live ONLY in the per-bucket
# ``robots_parts/bucket=NNNN.parquet`` sidecars written by
# CrawlEngine.prepare() — no driver-side dict, and nothing robots-sized
# is captured in task closures (a robots_by_host dict re-pickled into
# every admit task is GBs of per-task serialization at 10^8 hosts).
# Each admit task loads its OWN bucket's sidecar on first touch and
# caches the parsed rules per worker PROCESS (same long-lived-worker
# pattern as stages/fetch._SIMS; the files are immutable corpus
# derivatives, so the cache is retry-safe).
#
# Bucket affinity: with bucket_mode="host" a host's /robots.txt row and
# all of that host's frontier rows hash to the same bucket, so one task
# needs exactly one sidecar = O(hosts/bucket) state.  With
# bucket_mode="id" hosts spread across buckets, so the worker loads all
# sidecars once per process instead (still zero driver state and O(1)
# closure bytes — the documented non-affine fallback).

_RULES_CACHE: dict[tuple, "RobotsRules"] = {}


def load_robots_rules(
    robots_dir: str,
    bucket: int,
    bucket_affine: bool,
    user_agent: str = "*",
) -> "RobotsRules":
    """Parsed robots rules for one frontier bucket, cached per worker.

    ``bucket_affine=True`` (host bucketing) reads only
    ``bucket=NNNN.parquet``; otherwise every sidecar is folded once per
    process.  First capture of a host wins (matches the corpus index's
    first-by-warc_ts dedup)."""
    from .checkpoint import bucket_file, list_bucket_files

    key = (robots_dir, bucket if bucket_affine else -1, user_agent)
    rules = _RULES_CACHE.get(key)
    if rules is None:
        import pyarrow.parquet as pq

        if bucket_affine:
            f = bucket_file(robots_dir, bucket)
            files = [f] if os.path.exists(f) else []
        else:
            files = list_bucket_files(robots_dir)
        by_host: dict[str, list] = {}
        for f in files:
            t = pq.read_table(f)
            for host, body in zip(t["hostname"].to_pylist(), t["html"].to_pylist()):
                if host not in by_host:
                    by_host[host] = parse_robots(
                        body.decode("utf-8", "replace"), user_agent
                    )
        rules = _RULES_CACHE[key] = RobotsRules(by_host)
    return rules
