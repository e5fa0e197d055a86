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
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.text import _fnv1a

__all__ = [
    "hll_distinct",
    "hll_distinct_grouped",
    "fnv1a64",
    "frequent_items",
    "count_min",
    "count_min_estimate",
    "kmv_distinct",
    "hist_quantile",
]


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


def _hll_add_batch_scalar(registers: np.ndarray, values, p: int) -> None:
    """Reference implementation (per-row Python) — kept only as the
    bit-parity oracle for the vectorized path below."""
    m = 1 << p
    for v in values:
        h = _mix64(_fnv1a(str(v).encode()))
        idx = h & (m - 1)
        w = h >> p
        # rank = position of first set bit in the remaining 64-p bits
        rank = (64 - p) - w.bit_length() + 1 if w else (64 - p) + 1
        if rank > registers[idx]:
            registers[idx] = rank


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv1a_buffers(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 over variable-length byte strings laid out in
    one flat buffer: column-wise over byte positions (max-length
    iterations of O(n) vector ops) — bit-identical to
    functions.text._fnv1a."""
    h = np.full(len(starts), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(lengths.max(initial=0))):
            active = lengths > j
            b = data[np.where(active, starts + j, 0)].astype(np.uint64)
            h = np.where(active, (h ^ b) * _FNV_PRIME, h)
    return h


def _utf8_layout(values) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data, starts, lengths) of str(v).encode() per value.  Arrow
    arrays cast to string in C++ (zero per-row Python); the list
    fallback joins encoded bytes once."""
    arr = None
    if isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks()
    elif isinstance(values, pa.Array):
        arr = values
    if (
        arr is not None
        and arr.null_count == 0
        and (pa.types.is_integer(arr.type) or pa.types.is_string(arr.type)
             or pa.types.is_large_string(arr.type))
    ):
        # int→string cast matches Python str() digits exactly; floats
        # would NOT (str(1.0)='1.0' vs Arrow '1') so they take the
        # fallback
        s = pa.compute.cast(arr, pa.large_string())
        if s is not None:
            offsets = s.buffers()[1]
            off = np.frombuffer(offsets, dtype=np.int64)[s.offset : s.offset + len(s) + 1]
            data = np.frombuffer(s.buffers()[2], dtype=np.uint8)
            return data, off[:-1].copy(), np.diff(off)
        values = arr.to_pylist()
    elif arr is not None:
        values = arr.to_pylist()
    bs = [str(v).encode() for v in values]
    n = len(bs)
    lengths = np.fromiter(map(len, bs), dtype=np.int64, count=n)
    data = np.frombuffer(b"".join(bs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1])) if n else np.zeros(0, np.int64)
    return data, starts, lengths


def fnv1a64(values) -> np.ndarray:
    """Vectorized stable FNV-1a 64 over str(v) per value — bit-identical
    to ``functions.hashing.hash64`` for ints and strings.  Accepts a
    pyarrow (Chunked)Array or a Python sequence; returns uint64."""
    data, starts, lengths = _utf8_layout(values)
    return _fnv1a_buffers(data, starts, lengths)


def _mix64_vec(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        h = h ^ (h >> np.uint64(33))
    return h


def _bit_length_vec(w: np.ndarray) -> np.ndarray:
    """Exact uint64 bit_length (no float round-trip)."""
    bl = np.zeros(w.shape, dtype=np.uint64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        step = (v >= (np.uint64(1) << np.uint64(shift))).astype(np.uint64) * np.uint64(shift)
        bl += step
        v >>= step
    return (bl + (w > 0)).astype(np.int64)


def _hll_add_batch(registers: np.ndarray, values, p: int) -> None:
    """Vectorized register update: values→utf8 via Arrow C++ cast (or a
    single bytes join), then numpy hashing, rank extraction and
    ``np.maximum.at``.  Bit-identical to the scalar reference."""
    if len(values) == 0:
        return
    h = _mix64_vec(_fnv1a_buffers(*_utf8_layout(values)))
    m = np.uint64((1 << p) - 1)
    idx = (h & m).astype(np.int64)
    w = h >> np.uint64(p)
    rank = np.where(w > 0, (64 - p) - _bit_length_vec(w) + 1, (64 - p) + 1)
    np.maximum.at(registers, idx, np.clip(rank, 0, 255).astype(np.uint8))


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
        _hll_add_batch(registers, batch[col], p)
        return pa.Table.from_pydict({"sketch": pa.array([registers.tobytes()])})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        merged = np.maximum(merged, np.frombuffer(row["sketch"], dtype=np.uint8))
    return {"estimate": round(_hll_estimate(merged), 1), "p": p}


def hist_quantile(
    ds: "ray.data.Dataset",
    col: str,
    qs: tuple = (0.5, 0.95),
    bins: int = 8192,
    round_to: int = 6,
) -> "pd.DataFrame":
    """Approximate quantiles from a mergeable fixed-width histogram —
    the one-merge-pass alternative to ``relational.exact_quantile``'s
    iterative narrowing (error ≤ one bin width = range/bins).  Pass 1
    is a min/max aggregate; pass 2 bins every value (np.bincount) into
    one bounded ``bins``-counter sketch per block, merged by counter
    sum (the Count-Min merge shape).  Answer per q: the upper edge of
    the first bin whose cumulative count reaches ceil(q·n).

    Deterministic and SQL-rederivable: bin = clip(floor((v-lo)/width),
    0, bins-1) with width = (hi-lo)/bins evaluates identically in
    numpy and DuckDB (same IEEE expression tree)."""
    import pandas as pd

    from ..functions.numeric import round_half_away

    stats = ds.aggregate(
        ray.data.aggregate.Min(col), ray.data.aggregate.Max(col)
    )
    lo, hi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    n = ds.count()
    if hi == lo:
        return pd.DataFrame(
            {"q": list(qs), "est": [round_half_away(hi, round_to)] * len(qs)}
        )
    width = (hi - lo) / bins

    def sketch_batch(batch: pa.Table) -> pa.Table:
        v = batch[col].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.clip(
            np.floor((v - lo) / width).astype(np.int64), 0, bins - 1
        )
        counts = np.bincount(idx, minlength=bins).astype(np.int64)
        return pa.Table.from_pydict({"sketch": pa.array([counts.tobytes()])})

    merged = np.zeros(bins, dtype=np.int64)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        merged += np.frombuffer(row["sketch"], dtype=np.int64)
    cum = np.cumsum(merged)
    out = []
    for q in qs:
        k = int(np.ceil(q * n))
        b = int(np.searchsorted(cum, k, side="left"))
        out.append(
            (q, float(round_half_away(lo + (b + 1) * width, round_to)))
        )
    return pd.DataFrame(out, columns=["q", "est"])


def kmv_sketch(ds: "ray.data.Dataset", col: str, k: int = 1024) -> np.ndarray:
    """Build the KMV bottom-k sketch (the k smallest DISTINCT mixed
    64-bit hashes, ascending uint64 array) without estimating — the
    mergeable half of kmv_distinct.  One bounded k·8-byte summary per
    block, driver union-merge."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        h = np.unique(_mix64_vec(_fnv1a_buffers(*_utf8_layout(batch[col]))))
        return pa.Table.from_pydict({"sketch": pa.array([h[:k].tobytes()])})

    parts = [
        np.frombuffer(row["sketch"], dtype=np.uint64)
        for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    ]
    merged = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.uint64)
    return merged[:k]


def kmv_union(sketches: list[np.ndarray], k: int = 1024) -> np.ndarray:
    """Merge KMV sketches: k smallest of the distinct union — EXACTLY
    the sketch of the concatenated inputs (min-k(min-k(A) ∪ min-k(B)) =
    min-k(A ∪ B)), so unions of independently-sketched datasets lose
    nothing.  The mergeability that makes bottom-k work distributed."""
    merged = (
        np.unique(np.concatenate(sketches)) if sketches else np.zeros(0, np.uint64)
    )
    return merged[:k]


def kmv_estimate(sketch: np.ndarray, k: int = 1024) -> dict:
    """Estimate from a bottom-k sketch: (k-1)·2^64 / h_(k) when the
    sketch is full, else the exact distinct-hash count."""
    from ..functions.numeric import round_half_away

    if sketch.size < k:
        est = float(sketch.size)
    else:
        est = (k - 1) * 18446744073709551616.0 / float(sketch[k - 1])
    return {"estimate": float(round_half_away(est, 2)), "k": k}


def kmv_distinct(ds: "ray.data.Dataset", col: str, k: int = 1024) -> dict:
    """KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002): keep the
    k smallest DISTINCT mixed 64-bit hashes; estimate = (k-1)·2^64 /
    h_(k) when ≥ k distinct hashes exist, else the exact distinct-hash
    count.  Unlike HLL the sketch is a pure function of the input's
    distinct-hash SET, so merge order and partitioning are irrelevant
    and an SQL oracle re-derives the estimate bit-for-bit.

    Scale shape: one bounded k·8-byte sketch per block (np.unique —
    vectorized), driver merge over ≤ k·blocks values — the HLL merge
    shape.  Mergeable: union → unique → first k (kmv_sketch /
    kmv_union / kmv_estimate expose the pieces)."""
    return kmv_estimate(kmv_sketch(ds, col, k=k), k=k)


def frequent_items(
    ds: "ray.data.Dataset",
    col: str,
    k: int,
    block_candidates: int = 2048,
) -> "pd.DataFrame":
    """Exact top-k frequent values via the candidate/recount two-pass:

    1. per block: exact local counts, keep the top ``block_candidates``
       by (count desc, value asc) — a bounded mergeable summary (the
       SpaceSaving-style candidate set);
    2. union of candidates (≤ block_candidates·blocks rows, driver-
       bounded like ANN's partial top-k) → broadcast → one vectorized
       recount pass restricted to candidates → exact global counts →
       top-k by (count desc, value asc).

    Result equals the exact top-k whenever every global top-k value is
    a local top-``block_candidates`` value in at least one block — with
    block_candidates ≫ k this holds for any realistic (Zipf-like)
    frequency distribution; the exact-shuffle alternative for
    adversarial data is the vocab-top-k path (bucketed_agg over every
    distinct value).  Unlike that path, NO per-value shuffle happens
    here: the only movement is two bounded candidate lists."""
    import pandas as pd

    def local_top(t: pa.Table) -> pa.Table:
        vc = pd.Series(t[col].to_pandas()).value_counts()
        df = vc.reset_index()
        df.columns = [col, "n"]
        df = df.sort_values(["n", col], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.head(block_candidates), preserve_index=False)

    cand = (
        ds.map_batches(local_top, batch_format="pyarrow")
        .to_pandas()[col]
        .drop_duplicates()
    )
    cand_ref = ray.put(set(cand.tolist()))

    def recount(t: pa.Table) -> pa.Table:
        s = pd.Series(t[col].to_pandas())
        s = s[s.isin(ray.get(cand_ref))]
        vc = s.value_counts()
        df = vc.reset_index()
        df.columns = [col, "n"]
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (
        ds.map_batches(recount, batch_format="pyarrow")
        .to_pandas()
        .groupby(col, as_index=False)["n"]
        .sum()
    )
    return (
        counts.sort_values(["n", col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def count_min(
    ds: "ray.data.Dataset",
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> np.ndarray:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of ``col``:
    depth×width counters, row j's hash = fnv1a64("<j>|<value>") mod
    width — d independent FNV streams, each exactly re-derivable in SQL
    (the estimate is a deterministic function of the exact per-value
    counts, so an oracle can reproduce it bit-for-bit).

    One sketch per batch (the batch pre-groups values, so the hash runs
    per DISTINCT value, not per row) → counter-wise SUM merge, the same
    one-row-per-block combiner as the HLL.  Returns the merged
    (depth, width) int64 counter array; query estimates via
    ``count_min_estimate``."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pandas().astype(str)
        counts = vals.groupby(vals).size()
        sk = np.zeros((depth, width), dtype=np.int64)
        c = counts.to_numpy()
        for j in range(depth):
            keyed = pa.array([f"{j}|{v}" for v in counts.index], pa.large_string())
            idx = (fnv1a64(keyed) % np.uint64(width)).astype(np.int64)
            np.add.at(sk[j], idx, c)
        return pa.Table.from_pydict({"sketch": pa.array([sk.tobytes()])})

    merged = np.zeros((depth, width), dtype=np.int64)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        merged += np.frombuffer(row["sketch"], dtype=np.int64).reshape(depth, width)
    return merged


def count_min_estimate(sketch: np.ndarray, keys) -> np.ndarray:
    """Point-estimate counts for ``keys`` from a count_min sketch:
    min over rows of the addressed counters (classic CM upper bound)."""
    depth, width = sketch.shape
    ests = np.full((depth, len(keys)), 0, dtype=np.int64)
    for j in range(depth):
        keyed = pa.array([f"{j}|{k}" for k in keys], pa.large_string())
        idx = (fnv1a64(keyed) % np.uint64(width)).astype(np.int64)
        ests[j] = sketch[j, idx]
    return ests.min(axis=0)


def hll_distinct_grouped(
    ds: "ray.data.Dataset",
    group_col: str,
    col: str,
    p: int = 12,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Approximate distinct ``col`` PER ``group_col`` value: one HLL per
    (batch, group) → group-bucketed register-max merge → estimate.
    Returns (group_col, estimate) — works at any group cardinality (the
    shuffle carries one 2^p-byte sketch per group per batch, the merge
    is per-bucket; no driver state)."""
    m = 1 << p

    def sketch_batch(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, col]).to_pandas()
        groups, sketches = [], []
        for g, sub in df.groupby(group_col, sort=False):
            registers = np.zeros(m, dtype=np.uint8)
            _hll_add_batch(registers, sub[col].to_numpy(), p)
            groups.append(g)
            sketches.append(registers.tobytes())
        return pa.Table.from_pydict(
            {group_col: pa.array(groups), "sketch": pa.array(sketches, pa.binary())}
        )

    from .relational import bucketed_group_map

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_e = [], []
        for g, sub in df.groupby(group_col, sort=True):
            merged = np.zeros(m, dtype=np.uint8)
            for b in sub["sketch"]:
                merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
            out_g.append(g)
            out_e.append(round(_hll_estimate(merged), 1))
        return pd.DataFrame({group_col: out_g, "estimate": out_e})

    return bucketed_group_map(
        ds.map_batches(sketch_batch, batch_format="pyarrow"),
        [group_col],
        merge_bucket,
        num_buckets=num_buckets,
    )
