"""Mergeable sketches (approximate aggregates at 100 TB scale).

The reference's only approximations are capacity-bounded LRUs and the
Postgres ``reltuples`` row-count estimate (SURVEY.md §2.5); here the
principled replacements: each map_batches task emits ONE serialized
sketch per batch, and a tiny final stage merges them — the shuffle
carries kilobytes regardless of input size.

- ``hll_distinct``: HyperLogLog distinct-count (dense, 2^p registers,
  deterministic seed-free FNV hashing — same estimate at any
  parallelism or partitioning).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.text import _fnv1a

__all__ = ["hll_distinct"]


_M64 = 0xFFFFFFFFFFFFFFFF


def _mix64(h: int) -> int:
    """murmur3 finalizer — FNV alone has weak high-bit avalanche, which
    biases the HLL rank estimate."""
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    h ^= h >> 33
    return h


def _hll_add_batch(registers: np.ndarray, values, p: int) -> None:
    m = 1 << p
    for v in values:
        h = _mix64(_fnv1a(str(v).encode()))
        idx = h & (m - 1)
        w = h >> p
        # rank = position of first set bit in the remaining 64-p bits
        rank = (64 - p) - w.bit_length() + 1 if w else (64 - p) + 1
        if rank > registers[idx]:
            registers[idx] = rank


def _hll_estimate(registers: np.ndarray) -> float:
    m = registers.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range fix
    return float(est)


def hll_distinct(
    ds: "ray.data.Dataset", col: str, p: int = 12
) -> dict:
    """Approximate distinct count of ``col``: one HLL per batch →
    register-wise max merge.  Returns {"estimate": float, "p": int}."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        registers = np.zeros(1 << p, dtype=np.uint8)
        _hll_add_batch(registers, batch[col].to_pylist(), p)
        return pa.Table.from_pydict({"sketch": pa.array([registers.tobytes()])})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        merged = np.maximum(merged, np.frombuffer(row["sketch"], dtype=np.uint8))
    return {"estimate": round(_hll_estimate(merged), 1), "p": p}
