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

__all__ = [
    "BloomFilter",
    "CuckooFilter",
    "bloom_path",
    "load_bloom",
    "save_bloom",
    "make_gate",
    "load_gate",
    "save_gate",
]

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


class CuckooFilter:
    """Partial-key cuckoo filter (Fan et al., CoNEXT 2014) — the
    north_rule's named alternative to the Bloom gate.  Same contract:
    ``contains_many`` False means DEFINITELY novel (exactness preserved
    by the downstream exact set), True means probe exactly.  What the
    Bloom can't do and this can: ``delete_many`` — a TTL horizon can
    retire expired ids from the gate in place instead of rebuilding or
    carrying sidecar churn.

    Layout: ``nbuckets × 4`` slots of 16-bit fingerprints (0 = empty;
    fingerprints are forced nonzero), ~18.1 bits/key at the standard
    95% target load.  As with the Bloom, hashing is free: page_ids ARE
    sha1 hex digests, so the fingerprint and primary index are disjoint
    64-bit slices of the id and the alternate index is the standard
    ``i ^ hash(fp)`` partial-key kick — deterministic, seed-free,
    stable across processes.  Evicted fingerprints that exceed the kick
    budget land in a small stash (checked by lookups), so the filter
    NEVER drops an inserted key; a non-empty stash or 95% load reports
    ``overfull`` and the caller regrows exactly like the Bloom path.
    """

    SLOTS = 4
    MAX_KICKS = 500
    _MIX = np.uint64(0x5BD1E995)  # fp -> alt-index mix (odd constant)

    def __init__(
        self,
        nbuckets: int,
        table: np.ndarray | None = None,
        stash: np.ndarray | None = None,
        count: int = 0,
    ):
        assert nbuckets & (nbuckets - 1) == 0, "nbuckets must be a power of two"
        self.nbuckets = nbuckets
        self.table = (
            table if table is not None
            else np.zeros((nbuckets, self.SLOTS), dtype=np.uint16)
        )
        # stash rows: (index, fingerprint) pairs that exceeded the kick
        # budget — bounded small; non-empty => overfull => regrow
        self.stash = (
            stash if stash is not None else np.empty((0, 2), dtype=np.uint64)
        )
        self.count = count

    @staticmethod
    def sized_for(n_ids: int) -> "CuckooFilter":
        """Buckets for ≤95% load at n_ids keys, power of two, min 2^11."""
        need = max(1, int(np.ceil(n_ids / (CuckooFilter.SLOTS * 0.95))))
        nbuckets = 1 << max(11, int(np.ceil(np.log2(need))))
        return CuckooFilter(nbuckets)

    def _fp_idx(self, ids: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(fingerprints, primary indexes) from the sha1-hex ids."""
        if not ids:
            return (np.empty(0, dtype=np.uint64),) * 2
        fp = np.array([int(i[32:36], 16) for i in ids], dtype=np.uint64)
        fp[fp == 0] = 1  # 0 marks an empty slot
        h1 = np.array([int(i[0:16], 16) for i in ids], dtype=np.uint64)
        return fp, h1 & np.uint64(self.nbuckets - 1)

    def _alt(self, idx, fp):
        with np.errstate(over="ignore"):
            return (idx ^ (fp * self._MIX)) & np.uint64(self.nbuckets - 1)

    def add_many(self, ids: list[str]) -> None:
        fps, idxs = self._fp_idx(ids)
        stash_new: list[tuple[int, int]] = []
        t = self.table
        for fp, i1 in zip(fps.tolist(), idxs.tolist()):
            placed = False
            for idx in (i1, int(self._alt(np.uint64(i1), np.uint64(fp)))):
                row = t[idx]
                for s in range(self.SLOTS):
                    if row[s] == 0:
                        row[s] = fp
                        placed = True
                        break
                if placed:
                    break
            if placed:
                continue
            # evict: deterministic kick path (slot chosen by kick count)
            idx, cur = i1, fp
            for kick in range(self.MAX_KICKS):
                s = (cur + kick) % self.SLOTS
                cur, t[idx][s] = int(t[idx][s]), cur
                idx = int(self._alt(np.uint64(idx), np.uint64(cur)))
                row = t[idx]
                placed = False
                for s2 in range(self.SLOTS):
                    if row[s2] == 0:
                        row[s2] = cur
                        placed = True
                        break
                if placed:
                    break
            else:
                stash_new.append((idx, cur))
        if stash_new:
            self.stash = np.concatenate(
                [self.stash, np.array(stash_new, dtype=np.uint64)]
            )
        self.count += len(ids)

    def contains_many(self, ids: list[str]) -> np.ndarray:
        """True = maybe seen, False = DEFINITELY novel (stash included)."""
        fps, i1 = self._fp_idx(ids)
        if not len(fps):
            return np.zeros(0, dtype=bool)
        i2 = self._alt(i1, fps)
        hit = (self.table[i1.astype(np.int64)] == fps[:, None].astype(np.uint16)).any(axis=1)
        hit |= (self.table[i2.astype(np.int64)] == fps[:, None].astype(np.uint16)).any(axis=1)
        if len(self.stash):
            sfp = self.stash[:, 1]
            si = self.stash[:, 0]
            salt = self._alt(si, sfp)
            for k in range(len(sfp)):
                m = (fps == sfp[k]) & ((i1 == si[k]) | (i2 == si[k])
                                       | (i1 == salt[k]) | (i2 == salt[k]))
                hit |= m
        return hit

    def delete_many(self, ids: list[str]) -> int:
        """Remove ONE fingerprint copy per id (cuckoo deletion is only
        sound for ids that were actually inserted — the TTL caller
        retires exactly the expired members).  Returns #removed."""
        fps, i1s = self._fp_idx(ids)
        removed = 0
        t = self.table
        for fp, i1 in zip(fps.tolist(), i1s.tolist()):
            done = False
            for idx in (i1, int(self._alt(np.uint64(i1), np.uint64(fp)))):
                row = t[idx]
                for s in range(self.SLOTS):
                    if row[s] == fp:
                        row[s] = 0
                        removed += 1
                        done = True
                        break
                if done:
                    break
            if not done and len(self.stash):
                i2 = int(self._alt(np.uint64(i1), np.uint64(fp)))
                m = (self.stash[:, 1] == fp) & (
                    (self.stash[:, 0] == i1) | (self.stash[:, 0] == i2)
                )
                if m.any():
                    # drop one matching stash row (same fp AND bucket pair)
                    drop = int(np.flatnonzero(m)[0])
                    self.stash = np.delete(self.stash, drop, axis=0)
                    removed += 1
                    done = True
            if done:
                self.count -= 1
        return removed

    @property
    def overfull(self) -> bool:
        return (
            len(self.stash) > 0
            or self.count > 0.95 * self.nbuckets * self.SLOTS
        )


def make_gate(kind: str, n_ids: int):
    """Factory for the seen-set negative gate: 'bloom' | 'cuckoo'."""
    if kind == "cuckoo":
        return CuckooFilter.sized_for(n_ids)
    if kind == "bloom":
        return BloomFilter.sized_for(n_ids)
    raise ValueError(f"unknown seen_gate kind: {kind!r}")


def bloom_path(work: str, bucket: int, name: str = "bloom") -> str:
    return os.path.join(work, name, f"bucket={bucket:04d}.npz")


def load_gate(work: str, bucket: int, name: str = "bloom", with_ttl: bool = False):
    """Returns (gate, through_round) or (None, -1).  Kind-sniffing: a
    sidecar with a ``table`` array is a cuckoo filter; the legacy
    ``bits`` layout is a Bloom — so switching ``seen_gate`` mid-crawl
    just regrows from the exact set on the first mismatched round.
    ``name`` picks the sidecar family: the all-time enqueued gate lives
    under ``bloom/``; the TTL-window gate (different through-round
    semantics — see pipelines/crawl.py) under ``ttl_gate/``.

    ``with_ttl=True`` returns (gate, through_round, ttl) where ``ttl``
    is the ``seen_ttl_rounds`` the gate was maintained under, or None
    for sidecars written before TTL stamping / without a TTL.  The TTL
    window-advance (delete exiting round, add entering round) is only
    sound when the resumed crawl's TTL matches the gate's — deleting a
    round's members that were never inserted strips the identical
    fingerprint of a still-in-window copy (CuckooFilter.delete_many's
    contract), so callers must rebuild on mismatch."""
    path = bloom_path(work, bucket, name)
    if not os.path.exists(path):
        return (None, -1, None) if with_ttl else (None, -1)
    with np.load(path) as z:
        if "table" in z:
            table = z["table"]
            stash = z["stash"]
            meta = z["meta"]  # [nbuckets, count, through_round(, ttl)]
            gate = CuckooFilter(
                int(meta[0]), table=table, stash=stash.astype(np.uint64),
                count=int(meta[1]),
            )
            ttl = int(meta[3]) if len(meta) > 3 and int(meta[3]) >= 0 else None
            if with_ttl:
                return gate, int(meta[2]), ttl
            return gate, int(meta[2])
        bits = z["bits"]
        meta = z["meta"]  # [nbits, count, through_round(, ttl)]
    gate = BloomFilter(int(meta[0]), bits=bits, count=int(meta[1]))
    ttl = int(meta[3]) if len(meta) > 3 and int(meta[3]) >= 0 else None
    if with_ttl:
        return gate, int(meta[2]), ttl
    return gate, int(meta[2])


def save_gate(work: str, bucket: int, gate, through_round: int, name: str = "bloom",
              ttl: int | None = None) -> None:
    """Persist either gate kind atomically under the shared sidecar path.
    ``ttl`` stamps the seen_ttl_rounds the gate tracks (-1 = none) so a
    resume under a different TTL rebuilds instead of mis-advancing."""
    if isinstance(gate, BloomFilter):
        save_bloom(work, bucket, gate, through_round, name, ttl=ttl)
        return
    path = bloom_path(work, bucket, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}.npz"
    np.savez(
        tmp.removesuffix(".npz"),
        table=gate.table,
        stash=gate.stash,
        meta=np.array(
            [gate.nbuckets, gate.count, through_round,
             -1 if ttl is None else ttl],
            dtype=np.int64,
        ),
    )
    os.replace(tmp, path)


def load_bloom(work: str, bucket: int) -> tuple[BloomFilter | None, int]:
    """Returns (bloom, through_round) or (None, -1)."""
    path = bloom_path(work, bucket)
    if not os.path.exists(path):
        return None, -1
    with np.load(path) as z:
        bits = z["bits"]
        meta = z["meta"]  # [nbits, count, through_round]
    return BloomFilter(int(meta[0]), bits=bits, count=int(meta[1])), int(meta[2])


def save_bloom(work: str, bucket: int, bloom: BloomFilter, through_round: int,
               name: str = "bloom", ttl: int | None = None) -> None:
    path = bloom_path(work, bucket, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}.npz"
    np.savez(
        tmp.removesuffix(".npz"),
        bits=bloom.bits,
        meta=np.array(
            [bloom.nbits, bloom.count, through_round,
             -1 if ttl is None else ttl],
            dtype=np.int64,
        ),
    )
    os.replace(tmp, path)
