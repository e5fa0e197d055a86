"""Stable hashing helpers: page identity, host bucketing, 64-bit hashes.

``page_id`` is the reference's SHA-1 identity
(``pkg/linkutils/linkutils.go:66-71``).  ``host_bucket`` is new: the
engine's single partitioning key (north_rule: frontier / seen-set /
politeness state are all partitioned by host-hash so that per-host
invariants are bucket-local).  All hashes are seed-free and
deterministic across processes (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["hash64", "hash64_np", "host_bucket", "host_bucket_np"]

# FNV-1a 64-bit — cheap, stable, good dispersion for bucketing.
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def hash64(s: str) -> int:
    """Stable 64-bit FNV-1a over the UTF-8 bytes of s."""
    h = 14695981039346656037
    for b in s.encode("utf-8", "surrogateescape"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def hash64_np(strings) -> np.ndarray:
    """Vectorized-ish stable hash64 over an iterable of strings.

    Python loop over rows but each row is O(len) C-speed bytes ops;
    fast enough for the canonicalize stage (hash cost ≪ URL parse cost).
    """
    return np.fromiter(
        (hash64(s) for s in strings), dtype=np.uint64, count=len(strings)
    )


def host_bucket(hostname: str, num_buckets: int) -> int:
    """Partition bucket of a hostname.

    Keyed on Hostname() (port stripped) so all URL variants of one
    page_id land in the same bucket (page_id = SHA1(hostname+path) ⇒
    same id → same hostname → same bucket, making bucket-local dedup
    exact).
    """
    return hash64(hostname) % num_buckets


def host_bucket_np(hostnames, num_buckets: int) -> np.ndarray:
    return (hash64_np(hostnames) % np.uint64(num_buckets)).astype(np.int32)


def bucket_for(hostname: str, page_id: str, num_buckets: int, mode: str) -> int:
    """Frontier/state partition bucket.

    mode="host": key on hostname — REQUIRED when per-host politeness
    budgets are enforced (admission must see a host's rows together);
    the budget itself then bounds per-bucket work, so a mega-host can
    skew a bucket's frontier but not its admitted fetch load.

    mode="id": key on page_id — perfectly balanced; valid whenever no
    per-host state is held (budget=None), because page_id dedup is
    bucket-exact under ANY function of the id, and robots checks are
    stateless per row."""
    if mode == "host":
        return hash64(hostname) % num_buckets
    return hash64(page_id) % num_buckets


def shard_for(
    base: int, page_id: str, num_buckets: int, splits: dict[int, int] | None
) -> int:
    """Physical state shard of a frontier page.

    Unsplit buckets: shard == base (id in [0, num_buckets)).  A split
    (mega-host) bucket with salt factor S spreads its pages over S
    sub-shards by page_id hash, encoded as
    ``base + num_buckets * (1 + sub)`` so the base is always
    ``shard % num_buckets``.  page_id→shard is deterministic given the
    committed splits table, keeping bucket-local dedup exact."""
    s = splits.get(base) if splits else None
    if not s:
        return base
    return base + num_buckets * (1 + hash64(page_id) % s)


def sha1_hex(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8", "surrogateescape")).hexdigest()
