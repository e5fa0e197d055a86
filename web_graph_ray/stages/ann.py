"""Similarity search over embedding columns.

- ``cosine_topk``: exact brute-force top-k — the baseline.  The query
  matrix is broadcast once (``ray.put``) and every batch does one
  float64 matmul against it; per-batch partial top-k rows flow into a
  tiny final reduce (partial/combiner pattern — the shuffle carries
  k×queries rows per batch, not the corpus).
- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH buckets
  (signed projections → bit signature); only same/near-bucket vectors
  are scored.  Approximate; recall grows with probes.
- ``ivf_cosine_topk``: the other classic scale path — IVF-flat with a
  deterministic hash-sampled coarse quantizer; cells are the natural
  partition key at 10^9 vectors.
- ``cosine_pairs``: all-pairs near-duplicate detection above a cosine
  threshold (blocked matmul within LSH buckets).

Scores are float64, rounded HALF-AWAY-FROM-ZERO to 6 decimals (SQL
ROUND semantics) so a DuckDB oracle (``list_cosine_similarity`` over
double-cast lists) reproduces them exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.numeric import round_half_away

__all__ = [
    "cosine_topk",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "cosine_pairs",
    "kmeans",
    "quantize_int8",
]

ROUND = 6

# exact-path guard: cosine_topk collects k×|queries|×blocks candidate
# rows on the driver AND broadcasts the full query matrix to every task —
# both scale linearly in |queries|.  Beyond this many queries route to
# ivf_cosine_topk / lsh_cosine_topk instead (the same loud-failure
# pattern as the join/dedup BROADCAST_BYTES gates).
MAX_EXACT_QUERIES = 4096


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """Embedding column → (n, d) float64 matrix without a Python-object
    round-trip: flatten the (FixedSize)List values buffer zero-copy and
    reshape; the only copy is the float64 upcast the matmul needs."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(len(col), col.type.list_size)
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64, copy=False).reshape(len(col), int(widths[0]))
    return np.asarray(col.to_pylist(), dtype=np.float64)  # ragged fallback


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def cosine_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k for each query row; returns a small pandas
    frame (query_id, vec_id, score) — k×|queries| rows, sorted by
    (query_id, -score, vec_id) with deterministic tie-breaks.

    Scale guard: driver candidate rows and the broadcast query matrix
    are both O(|queries|); above ``MAX_EXACT_QUERIES`` this raises with
    a routing hint to the IVF/LSH paths (whose per-query work is
    bucketed, not corpus-wide)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    if len(q) > MAX_EXACT_QUERIES:
        raise ValueError(
            f"cosine_topk: {len(q)} queries exceed MAX_EXACT_QUERIES="
            f"{MAX_EXACT_QUERIES} (driver holds k x |queries| x blocks "
            "candidates); use ivf_cosine_topk or lsh_cosine_topk for "
            "large query sets"
        )
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        scores = m @ qm.T  # (batch, nq)
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(qm.shape[0]):
            # deterministic partial top-k: order by (-rounded_score, id)
            # so ties at the k boundary keep the same rows as the SQL
            # oracle's (score desc, id asc) regardless of block layout
            s = round_half_away(scores[:, qi], ROUND)
            idx = np.lexsort((ids, -s))[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if "query_id" not in cand.columns:  # empty corpus: no neighbours
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                id_col: pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    cand = cand.sort_values(
        ["query_id", "score", id_col], ascending=[True, False, True], kind="mergesort"
    )
    return cand.groupby("query_id", as_index=False).head(k).reset_index(drop=True)


def _hyperplanes(dim: int, nbits: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (seed-free: derived from
    a fixed-seed Generator so every process agrees)."""
    rng = np.random.Generator(np.random.PCG64(20240817))
    return rng.standard_normal((nbits, dim))


def lsh_cosine_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 8,
    probes: int = 2,
) -> pd.DataFrame:
    """Approximate cosine top-k: random-hyperplane signatures bucket the
    corpus; each query scores only vectors in its ``probes`` nearest
    buckets (by signature Hamming distance).  The 100 TB shape: the
    bucketing is a map_batches + groupby-free filter (each batch keeps
    only rows whose bucket ∈ probed set — a broadcast semi-join)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    planes = _hyperplanes(q.shape[1], nbits)
    q_sig = (q @ planes.T > 0).astype(np.uint8)

    # probed buckets per query: enumerate signatures within small hamming
    def neighbors(sig: np.ndarray, max_flip: int) -> set[int]:
        base = int(np.packbits(sig, bitorder="little")[0]) if nbits <= 8 else None
        out = {base}
        if max_flip >= 1:
            for b in range(nbits):
                out.add(base ^ (1 << b))
        return out

    probed = [neighbors(q_sig[i], probes - 1) for i in range(q.shape[0])]
    wanted: set[int] = set().union(*probed)
    q_ref = ray.put((q, probed, wanted, planes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm, probed_l, wanted_l, pl = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        sigs = np.packbits((m @ pl.T > 0).astype(np.uint8), axis=1, bitorder="little")[:, 0]
        keep = np.isin(sigs, list(wanted_l))
        m, ids, sigs = m[keep], ids[keep], sigs[keep]
        out_q, out_id, out_s = [], [], []
        if len(ids):
            scores = m @ qm.T
            for qi in range(qm.shape[0]):
                mask = np.isin(sigs, list(probed_l[qi]))
                if not mask.any():
                    continue
                s = round_half_away(scores[mask, qi], ROUND)
                sel_ids = ids[mask]
                kk = min(k, len(sel_ids))
                idx = np.lexsort((sel_ids, -s))[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(sel_ids[idx].tolist())
                out_s.extend(s[idx].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if "query_id" not in cand.columns:  # empty corpus: no neighbours
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                id_col: pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    cand = cand.sort_values(
        ["query_id", "score", id_col], ascending=[True, False, True], kind="mergesort"
    )
    return cand.groupby("query_id", as_index=False).head(k).reset_index(drop=True)


def cosine_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 6,
) -> "ray.data.Dataset":
    """Embedding near-duplicate pairs (cosine ≥ threshold), exact within
    LSH buckets: groupby(bucket) → blocked matmul per bucket.  With
    nbits=0 this is exact all-pairs (test scale); at 100 TB nbits bounds
    each block."""
    if nbits > 0:
        planes_ref = ray.put(_hyperplanes(_first_dim(ds, vec_col), nbits))
    else:
        planes_ref = None

    def add_bucket(batch: pa.Table) -> pa.Table:
        if planes_ref is None:
            bucket = np.zeros(batch.num_rows, dtype=np.int64)
        else:
            pl = ray.get(planes_ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            bucket = np.packbits((m @ pl.T > 0).astype(np.uint8), axis=1, bitorder="little")[:, 0].astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "score": pd.Series(dtype="float64")}
        )
        if len(df) < 2:
            return empty
        m = _normalize(np.asarray(df[vec_col].tolist(), dtype=np.float64))
        ids = np.asarray(df[id_col].tolist(), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        m, ids = m[order], ids[order]
        s = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        sel = s[ii, jj] >= threshold
        if not sel.any():
            return empty
        return pd.DataFrame(
            {
                "a": ids[ii[sel]],
                "b": ids[jj[sel]],
                "score": round_half_away(s[ii, jj][sel], ROUND),
            }
        )

    # coalesce before the sort-based groupby (per-block fixed cost —
    # see relational.bucketed_group_map); one task per LSH bucket anyway
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(max(1, min(64, 1 << nbits)))
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )


def _first_dim(ds: "ray.data.Dataset", vec_col: str) -> int:
    row = ds.take(1)[0]
    return len(row[vec_col])


def ivf_centroids(
    ds: "ray.data.Dataset",
    nlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: the ``nlist`` vectors with the
    smallest (fnv1a64(id), id) — a seed-free hash sample every process
    agrees on (and a SQL twin can re-derive).  Partial bottom-nlist per
    batch → driver merge of ≤ nlist·blocks rows; driver state is
    O(nlist·dim), the quantizer itself (broadcast state, like the query
    matrix — never corpus-sized)."""
    from .sketch import fnv1a64

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        hv = fnv1a64(batch[id_col])  # uint64: unsigned order matches SQL hugeint
        take = np.lexsort((ids, hv))[:nlist]
        m = _batch_matrix(batch, vec_col)[take]
        return pa.Table.from_pydict(
            {
                "h": pa.array(hv[take].astype(np.uint64), pa.uint64()),
                id_col: pa.array(ids[take], pa.int64()),
                vec_col: pa.array(list(m), pa.list_(pa.float64())),
            }
        )

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "h" not in cand.columns:
        # no data, no centroids: an honest raise beats silently training
        # a 0-cell index that would mis-route every later insert
        raise ValueError("ivf_centroids: empty dataset — cannot derive centroids")
    cand = cand.sort_values(["h", id_col], kind="mergesort").head(nlist)
    return np.asarray(cand[vec_col].tolist(), dtype=np.float64)


def ivf_cosine_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
) -> pd.DataFrame:
    """IVF-flat approximate cosine top-k: vectors are assigned to the
    nearest of ``nlist`` hash-sampled centroids (cells); each query
    scores only vectors in its ``nprobe`` closest cells.  The scale
    path alongside lsh_cosine_topk — at 10^9 vectors the cell id is the
    natural partition key (write one Parquet directory per cell; probes
    become per-cell pruned reads).

    Determinism: cell assignment and probe selection use 6-dp-rounded
    cosine with lowest-cell tie-break, so a DuckDB twin
    (list_cosine_similarity + row_number) reproduces the exact
    candidate sets; final ranking is (score desc, id asc) as in
    cosine_topk."""
    cm = _normalize(ivf_centroids(ds, nlist, id_col, vec_col))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    # probe sets: top-nprobe cells per query by rounded sim, cell-asc ties
    qsims = round_half_away(qn @ cm.T, ROUND)
    probes = [
        np.lexsort((np.arange(cm.shape[0]), -qsims[qi]))[:nprobe]
        for qi in range(qn.shape[0])
    ]
    state = ray.put((cm, qn, probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        cmat, qmat, prb = ray.get(state)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        cells = np.argmax(round_half_away(m @ cmat.T, ROUND), axis=1)  # first max = lowest cell
        scores = m @ qmat.T
        out_q, out_id, out_s = [], [], []
        for qi in range(qmat.shape[0]):
            mask = np.isin(cells, prb[qi])
            if not mask.any():
                continue
            s = round_half_away(scores[mask, qi], ROUND)
            mids = ids[mask]
            idx = np.lexsort((mids, -s))[: min(k, len(mids))]
            out_q.extend([qi] * len(idx))
            out_id.extend(mids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if "query_id" not in cand.columns:  # empty corpus: no neighbours
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                id_col: pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    cand = cand.sort_values(
        ["query_id", "score", id_col], ascending=[True, False, True], kind="mergesort"
    )
    return cand.groupby("query_id", as_index=False).head(k).reset_index(drop=True)


def quantize_int8(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = ROUND,
) -> "ray.data.Dataset":
    """Per-vector symmetric int8 quantization audit — the
    quantized-ANN-index build step: scale = max|x|/127, q_i =
    round_half_away(x_i/scale), reconstruction = q·scale.  Emits
    (id, scale, mse) per vector (both rounded, SQL half-away) so the
    quantization error budget is checkable downstream.  All-zero
    vectors get scale 0 / mse 0.

    Embarrassingly parallel: a pure batch map over the zero-copy
    (n, d) matrix (``_batch_matrix``), zero shuffles.  Per-row sums
    are sequential left-to-right (d < numpy's 128-element pairwise
    threshold), matching SQL list_aggregate order, so an oracle
    agrees bit-for-bit before the round."""

    def f(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        amax = np.abs(m).max(axis=1) if m.size else np.zeros(len(batch))
        scale = amax / 127.0
        safe = np.where(scale == 0.0, 1.0, scale)
        q = round_half_away(m / safe[:, None], 0)
        err = m - q * safe[:, None]
        mse = (err * err).sum(axis=1) / m.shape[1] if m.size else np.zeros(0)
        return pa.Table.from_pydict(
            {
                id_col: batch[id_col].combine_chunks()
                if isinstance(batch[id_col], pa.ChunkedArray)
                else batch[id_col],
                "scale": pa.array(round_half_away(scale, round_to)),
                "mse": pa.array(round_half_away(mse, round_to)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def kmeans(
    ds: "ray.data.Dataset",
    k: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_round: int = ROUND,
    cent_round: int = 9,
) -> tuple[np.ndarray, "ray.data.Dataset"]:
    """Distributed spherical k-means (Lloyd iterations, cosine
    assignment) over an embedding column; returns ``(centroids,
    assignments)`` where assignments is a (id_col, cell) Dataset.

    - init: the deterministic ``ivf_centroids`` hash sample (cell j =
      j-th smallest (fnv1a64(id), id)) — seed-free and SQL-rederivable;
    - assign: per-batch float64 matmul against the broadcast centroid
      matrix (``ray.put`` once per iteration, read per task); cosine
      rounded half-away to ``sim_round`` dp with lowest-cell
      tie-break, the ANN family's determinism policy;
    - update: per-batch partial (cell, count, coordinate sums) — the
      shuffle-free combiner; the driver merges k×blocks partial rows
      (O(k·dim) driver state, quantizer-sized, never corpus-sized) and
      rounds the new means to ``cent_round`` dp so an oracle that sums
      in any order reproduces them bit-for-bit (pagerank's policy);
      empty cells keep their previous centroid.
    """
    cents = ivf_centroids(ds, k, id_col, vec_col)
    kk, dim = cents.shape

    def make_partial(ref):
        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _batch_matrix(batch, vec_col)
            sims = round_half_away(_normalize(m) @ _normalize(c).T, sim_round)
            cell = np.argmax(sims, axis=1)  # first (lowest) max wins ties
            counts = np.bincount(cell, minlength=kk)
            sums = np.zeros((kk, dim))
            np.add.at(sums, cell, m)
            return pa.Table.from_pydict(
                {
                    "cell": pa.array(np.arange(kk), pa.int64()),
                    "n": pa.array(counts.astype(np.int64)),
                    "s": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        return partial

    for _ in range(iterations):
        ref = ray.put(np.ascontiguousarray(cents))
        parts = ds.map_batches(make_partial(ref), batch_format="pyarrow").to_pandas()
        sums = np.zeros((kk, dim))
        counts = np.zeros(kk, dtype=np.int64)
        for cell, n, s in parts.itertuples(index=False):
            counts[cell] += n
            sums[cell] += np.asarray(s)
        nz = counts > 0
        new = cents.copy()
        new[nz] = round_half_away(sums[nz] / counts[nz, None], cent_round)
        cents = new

    ref = ray.put(np.ascontiguousarray(cents))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _batch_matrix(batch, vec_col)
        sims = round_half_away(_normalize(m) @ _normalize(c).T, sim_round)
        return pa.Table.from_pydict(
            {
                id_col: batch[id_col].combine_chunks(),
                "cell": pa.array(np.argmax(sims, axis=1).astype(np.int64)),
            }
        )

    return cents, ds.map_batches(assign, batch_format="pyarrow")


def _murmur_fmix64(x: np.ndarray) -> np.ndarray:
    """The murmur3 64-bit finalizer over a uint64 array — the SAME
    arithmetic the SQL twins stage through their mx1→mx2→hx CTEs
    (__ray_entry__._sql_mix_ctes), so hash-derived values agree
    bit-for-bit across engine and oracle."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def jl_signs(dim: int, out_dim: int) -> np.ndarray:
    """Deterministic ±1 Johnson–Lindenstrauss sign matrix (dim ×
    out_dim): cell (i, j) takes the parity of murmur-fmix64(i·out_dim +
    j + 1).  Seed-free and process-stable — the same grid regenerates
    on every worker and in the SQL twin."""
    idx = np.arange(1, dim * out_dim + 1, dtype=np.uint64)
    h = _murmur_fmix64(idx)
    return (1 - 2 * (h & np.uint64(1)).astype(np.int64)).reshape(dim, out_dim)


def jl_project(
    ds: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    quant: int = 1_000_000,
    round_to: int | None = 6,
) -> "ray.data.Dataset":
    """Johnson–Lindenstrauss dimensionality reduction with a ±1 sign
    matrix (Achlioptas 2003): y = (x · S) / sqrt(out_dim) — the cheap
    distance-preserving projection that shrinks embeddings before ANN /
    clustering at 10^9-vector scale.  Returns LONG form (id_col, dim,
    value); a wide layout is one pivot away.

    Determinism across engines: inputs quantize to integers
    (round-half-away(x·quant)) so the projection sum is EXACT integer
    arithmetic — no float accumulation order anywhere — and the single
    final division by (quant·sqrt(out_dim)) rounds identically in
    numpy and SQL.  Embarrassingly parallel: one zero-copy matrix
    matmul per batch, zero shuffles, the sign grid is regenerated
    per worker (dim·out_dim ints, never shipped)."""

    def project(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        if m.size == 0:
            # a drained block: (0, d) @ (d, k) is fine but an empty
            # variable-list column flattens to shape (0,), which would
            # matmul into k phantom values — return the typed empty
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        s = jl_signs(m.shape[1], out_dim)
        q = round_half_away(m * quant, 0).astype(np.int64)
        y = (q @ s).astype(np.float64) / (quant * np.sqrt(float(out_dim)))
        if round_to is not None:
            y = round_half_away(y, round_to)
        n = len(m)
        ids = np.repeat(
            np.asarray(batch[id_col].to_pylist(), dtype=np.int64), out_dim
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "dim": pa.array(np.tile(np.arange(out_dim, dtype=np.int64), n)),
                "value": pa.array(y.reshape(-1), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")
