"""Sharded URL-seen state: Bloom pre-filter + exact Parquet backstop.

North-rule design point: a 10^10-URL frontier.  Exact per-bucket id
sets (sha1 hex, 40 B/id) are the ground truth — but at design scale a
bucket's exact set is hundreds of MB on disk, too hot to load for
every probe.  The Bloom filter is the RAM-resident negative filter:
~16 bits/key (p≈0.0005 at half fill), so the whole seen set is ~20 GB
across a 256-node cluster vs ~400 GB of raw ids.

Semantics: the bloom answers "definitely novel" with certainty;
"maybe seen" falls through to the exact set — so dedup stays EXACT
(the reference's LRU+`ON CONFLICT` pair gave approximate-then-exact
too, ``pkg/linkqueue/linkqueue.go:70`` + ``linkstorage.go:493``; here
the approximate layer can never admit a duplicate, only cost a probe).

Hashing is free: page_ids ARE sha1 digests — k bloom positions come
from double-hashing two 64-bit slices of the id itself.  Deterministic,
seed-free, stable across processes.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["BloomFilter", "bloom_path", "load_bloom", "save_bloom"]

_K = 7  # hash functions


class BloomFilter:
    def __init__(self, nbits: int, bits: np.ndarray | None = None, count: int = 0):
        assert nbits & (nbits - 1) == 0, "nbits must be a power of two"
        self.nbits = nbits
        self.bits = bits if bits is not None else np.zeros(nbits // 8, dtype=np.uint8)
        self.count = count  # ids added (for fill-ratio / regrowth decisions)

    @staticmethod
    def sized_for(n_ids: int) -> "BloomFilter":
        """~16 bits/key, power-of-two, min 8 KiB."""
        nbits = 1 << max(16, int(np.ceil(np.log2(max(1, n_ids) * 16))))
        return BloomFilter(nbits)

    def _positions(self, ids: list[str]) -> np.ndarray:
        """(n, _K) bit positions from the sha1-hex ids themselves."""
        if not ids:
            return np.empty((0, _K), dtype=np.uint64)
        h1 = np.array([int(i[0:16], 16) for i in ids], dtype=np.uint64)
        h2 = np.array([int(i[16:32], 16) for i in ids], dtype=np.uint64) | np.uint64(1)
        ks = np.arange(_K, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pos = (h1[:, None] + ks[None, :] * h2[:, None]) & np.uint64(self.nbits - 1)
        return pos

    def add_many(self, ids: list[str]) -> None:
        pos = self._positions(ids).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        self.count += len(ids)

    def contains_many(self, ids: list[str]) -> np.ndarray:
        """Boolean array: True = maybe seen, False = DEFINITELY novel."""
        pos = self._positions(ids)
        byte = (pos >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        hits = (self.bits[byte] & bit) != 0
        return hits.all(axis=1)

    @property
    def overfull(self) -> bool:
        return self.count * 16 > self.nbits  # past design fill → regrow


def bloom_path(work: str, bucket: int) -> str:
    return os.path.join(work, "bloom", f"bucket={bucket:04d}.npz")


def load_bloom(work: str, bucket: int) -> tuple[BloomFilter | None, int]:
    """Returns (bloom, through_round) or (None, -1)."""
    path = bloom_path(work, bucket)
    if not os.path.exists(path):
        return None, -1
    with np.load(path) as z:
        bits = z["bits"]
        meta = z["meta"]  # [nbits, count, through_round]
    return BloomFilter(int(meta[0]), bits=bits, count=int(meta[1])), int(meta[2])


def save_bloom(work: str, bucket: int, bloom: BloomFilter, through_round: int) -> None:
    path = bloom_path(work, bucket)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}.npz"
    np.savez(
        tmp.removesuffix(".npz"),
        bits=bloom.bits,
        meta=np.array([bloom.nbits, bloom.count, through_round], dtype=np.int64),
    )
    os.replace(tmp, path)
