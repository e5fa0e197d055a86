"""Politeness primitives: robots.txt rules + per-host round budgets.

The reference has NO politeness (only a UA string at
``pkg/linkprocessor/linkprocessor.go:114`` and a 10 s timeout; README's
"backoff" is not implemented — fetch errors are dropped at
``cmd/link-processor/main.go:176-179``).  Politeness here is the
north_rule extension, defined in *virtual time* (per-round budgets)
so results are bit-reproducible at any parallelism:

- robots.txt: corpus rows whose path is ``/robots.txt`` are parsed for
  ``User-agent: *`` ``Disallow:`` prefixes; a disallowed URL is dropped
  at frontier admission (counted ``robots_denied``, never fetched).
- budget: at most ``politeness_budget`` pages fetched per hostname per
  round, admitted in deterministic ``(priority, seq)`` order; the rest
  are deferred to the next round (counted ``deferred``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = ["parse_robots", "RobotsRules"]


def parse_robots(body: str) -> list[str]:
    """Parse a robots.txt body → Disallow path-prefixes for User-agent: *.

    Minimal, deterministic subset: group lines by User-agent; collect
    Disallow values of the ``*`` group; empty Disallow means allow-all.
    """
    prefixes: list[str] = []
    applies = False
    seen_agent = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if seen_agent and applies and prefixes:
                # already collected the * group and a new group starts
                pass
            applies = value == "*"
            seen_agent = True
        elif key == "disallow" and applies:
            if value:
                prefixes.append(value)
    return prefixes


@dataclass
class RobotsRules:
    """Per-host Disallow prefix tables."""

    by_host: dict[str, list[str]] = field(default_factory=dict)

    @classmethod
    def from_bodies(cls, bodies: dict[str, str]) -> "RobotsRules":
        return cls({host: parse_robots(body) for host, body in bodies.items()})

    def is_allowed(self, hostname: str, escaped_path: str) -> bool:
        prefixes = self.by_host.get(hostname)
        if not prefixes:
            return True
        path = escaped_path or "/"
        return not any(path.startswith(p) for p in prefixes)

    def denied_mask(self, hostnames: "pd.Series", paths: "pd.Series") -> "pd.Series":
        """Vectorized ¬is_allowed over aligned hostname/path Series:
        group by the FEW hosts that have rules, str.startswith per
        prefix — no per-row Python in the admission hot path."""
        import pandas as pd

        denied = pd.Series(False, index=hostnames.index)
        if not self.by_host:
            return denied
        hosted = hostnames.isin(self.by_host.keys())
        if not hosted.any():
            return denied
        sub_hosts = hostnames[hosted]
        sub_paths = paths[hosted].fillna("").mask(paths[hosted].eq(""), "/")
        for host, idx in sub_hosts.groupby(sub_hosts).groups.items():
            prefixes = self.by_host.get(host)
            if not prefixes:
                continue
            p = sub_paths.loc[idx]
            d = pd.Series(False, index=idx)
            for prefix in prefixes:
                d |= p.str.startswith(prefix)
            denied.loc[idx] = d
        return denied
