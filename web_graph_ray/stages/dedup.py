"""Deduplication stages for training-data curation (exact, n-gram
Jaccard, MinHash-LSH, SimHash).

The reference's only dedups are first-wins key dedups (D1–D3); these
stages add the content-level family a web-text pipeline needs.  Every
stage is expressed as map_batches (+ at most one groupby shuffle per
logical exchange), with the partial/pre-aggregate pattern where it cuts
shuffle volume.

Scale notes per stage are in the docstrings; the common skew guard is
``max_block``: blocking keys whose posting list exceeds it are dropped
from candidate *generation* (standard blocking practice — a 10^6-doc
shingle would generate 10^12 pairs); verification still uses full
shingle sets, so similarity values are exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.text import char_shingles, minhash_signature, minhash_signatures_batch

# broadcast-vs-partitioned-join gate: small sides below this ride one
# ray.put; above it the code switches to Dataset.join (the 10^9-doc
# path).  Module-level so tests can force the join path by patching.
BROADCAST_BYTES = 64 << 20


# NOTE on joins: the partitioned paths below use bucket_semi_join /
# bucket_hash_join (relational.py) — union + bucketed group map — NOT
# ray.data.Dataset.join.  In Ray 2.49 the JoinOperator deadlocks when
# composed with upstream map / downstream sort operators in one
# streaming execution (aggregator-owned output blocks get lost), which
# these dedup DAGs always do.

__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_clusters",
    "simhash_pairs",
    "decontaminate",
    "passage_dedup",
    "keep_best_per_cluster",
    "edit_distance_pairs",
]


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Exact duplicate removal: one survivor per distinct text, winner =
    min id (deterministic).  Pattern: per-batch partial winner (combiner)
    → groupby(hash) final — the pre-aggregate idiom that ships one row
    per distinct text per batch into the shuffle instead of every row."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "h": [
                    hashlib.sha1(t.encode("utf-8", "surrogateescape")).hexdigest()
                    for t in batch[text_col].to_pylist()
                ],
                id_col: batch[id_col].to_pylist(),
            }
        )
        win = df.groupby("h", as_index=False)[id_col].min()
        return pa.Table.from_pandas(win, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", as_index=False)[id_col].min()[[id_col]]

    from .relational import bucketed_group_map

    return bucketed_group_map(
        ds.map_batches(partial, batch_format="pyarrow"), ["h"], per_bucket
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact similarity, shingle blocking)
# ---------------------------------------------------------------------------


def _shingle_rows(text_col: str, id_col: str, k: int):
    """Explode distinct HASHED k-gram shingles (int64 FNV of the
    lowercased gram, via char_shingles — same shingling the minhash
    path uses).  Hashing at the source keeps every downstream shuffle
    payload fixed-width ints instead of strings (~3× cheaper); Jaccard
    over hashed sets equals Jaccard over raw grams up to 64-bit hash
    collisions (negligible, and shared with the minhash path)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, shingles = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            grams = char_shingles(t, k)
            ids.extend([i] * len(grams))
            shingles.extend(
                h - (1 << 64) if h >= 1 << 63 else h for h in grams
            )
        return pa.Table.from_pydict(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "shingle": pa.array(shingles, type=pa.int64()),
            }
        )

    return explode


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.8,
    max_block: int | None = None,
    min_shared: int = 5,
    score: str = "jaccard",
) -> "ray.data.Dataset":
    """Exact character-k-gram near-duplicate pairs — ``score`` picks the
    measure: "jaccard" = |A∩B| / |A∪B| (symmetric resemblance) or
    "containment" = |A∩B| / min(|A|, |B|) (Broder's max-containment —
    catches subset duplicates like quoted or truncated copies that
    Jaccard dilutes).  Same blocking/verify plan either way.

    1. explode distinct shingles per doc (map_batches, 1→N)
    2. candidates: pairs sharing ≥ ``min_shared`` RARE shingles (doc
       frequency ≤ ``max_block``) — the df-cap bounds the quadratic
       blow-up on hot shingles, the min-shared count prunes the long
       tail of incidental collisions (both knobs are part of the
       operator's deterministic semantics, mirrored in the SQL oracle)
    3. verify: EXACT Jaccard — intersection counted over ALL shingles of
       candidate pairs (vectorized self-merge restricted to candidate
       members), union from per-doc distinct counts.

    True near-dups above any reasonable threshold share many rare
    shingles, so the pruning does not cost recall on actual duplicates;
    MinHash-LSH below is the approximate scale path.
    """
    from .relational import bucketed_agg, bucketed_group_map

    # The exploded shingle table is the largest intermediate (≫ corpus
    # size).  It is consumed by three passes; rather than pinning it in
    # the object store with materialize(), each pass RECOMPUTES it from
    # the (streaming) input — trading one extra scan per pass for zero
    # resident state, the right trade at 100 TB where the object store
    # must hold only in-flight blocks.  The exception is ``sizes``
    # (one row per doc, ≪ shingle table): it is needed twice (df-cap +
    # scoring) and also yields n_docs, so materializing it folds the
    # former separate ds.count() scan into the first shingle pass.
    explode = _shingle_rows(text_col, id_col, k)

    def shingles() -> "ray.data.Dataset":
        return ds.map_batches(explode, batch_format="pyarrow")

    sizes = bucketed_agg(shingles(), [id_col]).materialize()  # distinct shingles per doc
    # n_docs = docs with ≥1 shingle (docs shorter than k chars cannot
    # pair anyway); counting via the materialized sizes folds the former
    # separate ds.count() input scan into the first shingle pass.
    n_docs = sizes.count()

    if max_block is None:
        # adaptive df-cap: "rare" must scale with corpus size or the
        # blocking finds nothing at larger corpora (near-identical pairs
        # always share many df≈2 shingles, so recall is kept)
        max_block = max(20, n_docs // 100)

    def rare_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket: pairs per rare shingle (one row per co-occurrence)."""
        df = df[df.groupby("shingle")["shingle"].transform("size").le(max_block)]
        m = df.merge(df, on="shingle")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        return m.rename(columns={f"{id_col}_x": "a", f"{id_col}_y": "b"})[["a", "b"]]

    cand = (
        bucketed_agg(bucketed_group_map(shingles(), ["shingle"], rare_pairs), ["a", "b"])
        .map_batches(
            lambda t: t.filter(
                pa.compute.greater_equal(t["count()"], min_shared)
            ).select(["a", "b"]),
            batch_format="pyarrow",
        )
        .materialize()  # candidate PAIRS only: df-cap-bounded, output-scale
    )
    n_cand = cand.count()
    if n_cand == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"a": pa.array([], type=pa.int64()),
                 "b": pa.array([], type=pa.int64()),
                 score: pa.array([], type=pa.float64())}
            )
        )

    _empty_ab = pd.DataFrame(
        {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
    )

    # second pass: intersection sizes over ALL shingles, candidate
    # members only.  Size-gated like the minhash verifier: candidates
    # below 64 MB ride one ray.put broadcast (zero shuffle); above that
    # the 10^9-doc path is two partitioned hash joins — semi-join shingle
    # rows to candidate members, then inner-join generated pairs to the
    # candidate set.  No O(n_docs) driver state on either path.
    if n_cand * 16 <= BROADCAST_BYTES:
        cand_ref = ray.put(cand.to_pandas())

        def pair_hits(df: pd.DataFrame) -> pd.DataFrame:
            cands = ray.get(cand_ref)
            members = set(cands["a"]).union(cands["b"])
            df = df[df[id_col].isin(members)]
            if not len(df):
                return _empty_ab
            m = df.merge(df, on="shingle")
            m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
            m = m.rename(columns={f"{id_col}_x": "a", f"{id_col}_y": "b"})[["a", "b"]]
            return m.merge(cands, on=["a", "b"])

        inter = bucketed_agg(
            bucketed_group_map(shingles(), ["shingle"], pair_hits), ["a", "b"]
        )
    else:
        # Join path: intersections computed per CANDIDATE PAIR, not per
        # shingle — (cand ⋈ shingles-of-a) gives (a, b, shingle) rows,
        # a semi join against (b, shingle) keeps exactly the shared
        # shingles, and a bucketed count yields |sh(a) ∩ sh(b)|.  Work
        # is Σ_pairs |sh(a)| — LINEAR in candidates, immune to the
        # hot-shingle quadratic a per-shingle self-merge would hit when
        # the candidate member set approaches the corpus.
        from .relational import bucket_hash_join, bucket_semi_join

        sh_a = shingles().map_batches(
            lambda t: pa.Table.from_pydict(
                {"a": t[id_col].combine_chunks(), "shingle": t["shingle"].combine_chunks()}
            ),
            batch_format="pyarrow",
        )
        sh_b_keys = shingles().map_batches(
            lambda t: pa.Table.from_pydict(
                {"b": t[id_col].combine_chunks(), "shingle": t["shingle"].combine_chunks()}
            ),
            batch_format="pyarrow",
        )
        pair_sh = bucket_hash_join(cand, sh_a, ["a"])
        inter = bucketed_agg(
            bucket_semi_join(pair_sh, sh_b_keys, ["b", "shingle"]), ["a", "b"]
        )

    # scoring needs |shingles(a)|, |shingles(b)| — same size gate:
    # broadcast the per-doc counts when small, else join them in.
    if n_docs * 16 <= BROADCAST_BYTES:
        sz_df = sizes.to_pandas()
        n_ref = ray.put(dict(zip(sz_df[id_col], sz_df["count()"])))

        def score_bcast(batch: pa.Table) -> pa.Table:
            n = ray.get(n_ref)
            a = batch["a"].to_pylist()
            b = batch["b"].to_pylist()
            inter_n = np.asarray(batch["count()"].to_pylist(), dtype=np.float64)
            na = np.asarray([n[x] for x in a], dtype=np.float64)
            nb = np.asarray([n[y] for y in b], dtype=np.float64)
            if score == "containment":
                val = inter_n / np.minimum(na, nb)
            else:
                val = inter_n / (na + nb - inter_n)
            t = pa.Table.from_pydict(
                {
                    "a": pa.array(a, type=pa.int64()),
                    "b": pa.array(b, type=pa.int64()),
                    score: pa.array(val, type=pa.float64()),
                }
            )
            return t.filter(pa.compute.greater_equal(t[score], threshold))

        return inter.map_batches(score_bcast, batch_format="pyarrow")

    size_a = sizes.map_batches(
        lambda t: pa.Table.from_pydict(
            {"a": t[id_col].combine_chunks(), "n_a": t["count()"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )
    size_b = sizes.map_batches(
        lambda t: pa.Table.from_pydict(
            {"b": t[id_col].combine_chunks(), "n_b": t["count()"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )
    from .relational import bucket_hash_join

    joined = bucket_hash_join(
        bucket_hash_join(inter, size_a, ["a"]), size_b, ["b"]
    )

    def score_j(batch: pa.Table) -> pa.Table:
        inter_n = batch["count()"].cast(pa.float64())
        na = batch["n_a"].cast(pa.float64())
        nb = batch["n_b"].cast(pa.float64())
        if score == "containment":
            denom = pa.compute.min_element_wise(na, nb)
        else:
            denom = pa.compute.subtract(pa.compute.add(na, nb), inter_n)
        val = pa.compute.divide(inter_n, denom)
        t = pa.Table.from_pydict(
            {
                "a": batch["a"].combine_chunks().cast(pa.int64()),
                "b": batch["b"].combine_chunks().cast(pa.int64()),
                score: val,
            }
        )
        return t.filter(pa.compute.greater_equal(t[score], threshold))

    return joined.map_batches(score_j, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate, the 100 TB path)
# ---------------------------------------------------------------------------


def _band_rows(text_col: str, id_col: str, k: int, num_perm: int, bands: int):
    from .sketch import _fnv1a_buffers  # seed-free (Python hash() is salted!)

    rows_per_band = num_perm // bands
    seg = rows_per_band * 8  # bytes per band slice of a signature row

    def to_bands(batch: pa.Table) -> pa.Table:
        ids_in = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        # whole-batch signature matrix (chunked min-segment-reduce), then
        # band hashes via the vectorized FNV kernel over the matrix's own
        # row-major buffer — each row is `bands` contiguous 8·r-byte
        # slices, byte-identical to per-doc sig[b*r:(b+1)*r].tobytes()
        sigs = minhash_signatures_batch(
            [char_shingles(t, k) for t in texts], num_perm
        )
        n = len(ids_in)
        data = np.ascontiguousarray(sigs).view(np.uint8).ravel()
        starts = np.arange(n * bands, dtype=np.int64) * seg
        lengths = np.full(n * bands, seg, dtype=np.int64)
        bh = (
            _fnv1a_buffers(data, starts, lengths) & np.uint64(0x7FFFFFFFFFFFFFFF)
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                id_col: pa.array(np.repeat(np.asarray(ids_in, dtype=np.int64), bands)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh),
            }
        )

    return to_bands


def _signatures(ds, text_col: str, id_col: str, k: int, num_perm: int):
    """(id, sig:list<uint64>) dataset — joined against candidate pairs
    for verification (no driver-side collection of signatures)."""

    def to_sig(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs_m = minhash_signatures_batch(
            [char_shingles(t, k) for t in batch[text_col].to_pylist()], num_perm
        )
        # serialized as binary: Arrow hash joins reject list payloads
        sigs = [sigs_m[r].tobytes() for r in range(len(ids))]
        return pa.Table.from_pydict(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "sig": pa.array(sigs, type=pa.binary()),
            }
        )

    return ds.map_batches(to_sig, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.7,
    max_block: int = 200,
) -> "ray.data.Dataset":
    """Near-dup pairs via MinHash banding: shingle→minhash→(band,hash)
    rows → groupby band bucket → candidate pairs → verify by estimated
    Jaccard (fraction of equal signature rows) ≥ threshold.

    Signatures are recomputed for verification inside the scoring stage
    from a broadcast of candidate ids' texts? No — signatures travel as
    columns: verification joins the two sides' signatures via a second
    groupby on the pair.  Approximate by construction (banding recall
    <1); the exactness-checkable twin is ngram_jaccard_pairs."""
    to_bands = _band_rows(text_col, id_col, k, num_perm, bands)
    band_rows = ds.map_batches(to_bands, batch_format="pyarrow")

    from .relational import bucketed_group_map

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby(["band", "band_hash"]):
            if len(g) < 2 or len(g) > max_block:
                continue
            ids = sorted(set(g[id_col].tolist()))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype="int64"), "b": pd.Series(out_b, dtype="int64")}
        ).drop_duplicates()

    dedup_pairs = lambda df: df.drop_duplicates(["a", "b"])
    cand = bucketed_group_map(
        bucketed_group_map(band_rows, ["band", "band_hash"], bucket_pairs),
        ["a", "b"],
        dedup_pairs,
        batch_partial=dedup_pairs,
    )

    # verification: estimated Jaccard = matching signature positions.
    # Signature table is num_perm*8 B/doc — broadcast it below ~64 MB
    # (one ray.put, zero shuffle); above that, two partitioned hash
    # joins (the 10^9-doc path).
    sigs = _signatures(ds, text_col, id_col, k, num_perm)
    n_docs = ds.count()
    if n_docs == 0:
        # empty corpus: typed empty pairs (an all-empty sigs dataset is
        # schema-less — indexing it would crash, and there is nothing
        # to verify anyway)
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "est_jaccard": pd.Series([], dtype="float64"),
                }
            )
        )
    if n_docs * num_perm * 8 <= BROADCAST_BYTES:
        sig_df = sigs.to_pandas()
        sig_ref = ray.put(dict(zip(sig_df[id_col], sig_df["sig"])))

        def score_bc(batch: pa.Table) -> pa.Table:
            sig_of = ray.get(sig_ref)
            a = batch["a"].to_pylist()
            b = batch["b"].to_pylist()
            est = [
                float(np.mean(np.frombuffer(sig_of[x], dtype=np.uint64)
                              == np.frombuffer(sig_of[y], dtype=np.uint64)))
                for x, y in zip(a, b)
            ]
            t = pa.Table.from_pydict(
                {
                    "a": pa.array(a, type=pa.int64()),
                    "b": pa.array(b, type=pa.int64()),
                    "est_jaccard": pa.array(est, type=pa.float64()),
                }
            )
            return t.filter(pa.compute.greater_equal(t["est_jaccard"], threshold))

        return cand.map_batches(score_bc, batch_format="pyarrow")

    from .relational import bucket_hash_join

    sig_a = sigs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"a": t[id_col].combine_chunks(), "sig_a": t["sig"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )
    sig_b = sigs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"b": t[id_col].combine_chunks(), "sig_b": t["sig"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )
    joined = bucket_hash_join(
        bucket_hash_join(cand, sig_a, ["a"]), sig_b, ["b"]
    )

    def score(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        est = [
            float(np.mean(np.frombuffer(sa, dtype=np.uint64)
                          == np.frombuffer(sb, dtype=np.uint64)))
            for sa, sb in zip(batch["sig_a"].to_pylist(), batch["sig_b"].to_pylist())
        ]
        t = pa.Table.from_pydict(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "est_jaccard": pa.array(est, type=pa.float64()),
            }
        )
        return t.filter(pa.compute.greater_equal(t["est_jaccard"], threshold))

    return joined.map_batches(score, batch_format="pyarrow")


def minhash_clusters(
    pairs: "ray.data.Dataset", id_col: str = "doc_id", rounds: int = 4
) -> "ray.data.Dataset":
    """Connected components over near-dup pairs — delegates to the
    generic ``stages.graph.connected_components`` min-label propagation
    (no driver-side union-find; duplicate clusters have tiny diameters
    so ``rounds``=4 converges)."""
    from .graph import connected_components

    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "src": t["a"].combine_chunks().cast(pa.int64()),
                "dst": t["b"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return connected_components(edges, rounds=rounds)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_hamming: int = 3,
    bands: int = 4,
) -> "ray.data.Dataset":
    """Near-dup pairs via 64-bit SimHash: bucket on each of ``bands``
    (64/bands)-bit bands (a pair within Hamming distance ≤ bands-1 must
    collide on ≥1 band — pigeonhole), verify Hamming ≤ max_hamming.

    Recall is GUARANTEED only for max_hamming ≤ bands-1; beyond that,
    pairs are found only via incidental band collisions.  Callers wanting
    full recall at distance d must pass bands ≥ d+1."""
    from ..functions.text import simhash64

    def to_bands(batch: pa.Table) -> pa.Table:
        ids, band_ids, keys, hashes = [], [], [], []
        width = 64 // bands
        mask = (1 << width) - 1
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            h = simhash64(t, k) & 0xFFFFFFFFFFFFFFFF
            for b in range(bands):
                ids.append(i)
                band_ids.append(b)
                keys.append((h >> (b * width)) & mask)
                hashes.append(h - (1 << 64) if h >= 1 << 63 else h)
        return pa.Table.from_pydict(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "band": pa.array(band_ids, type=pa.int32()),
                "key": pa.array(keys, type=pa.int64()),
                "simhash": pa.array(hashes, type=pa.int64()),
            }
        )

    rows = ds.map_batches(to_bands, batch_format="pyarrow")

    from .relational import bucketed_group_map

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = {"a": [], "b": [], "hamming": []}
        for _, g in df.groupby(["band", "key"]):
            if len(g) < 2:
                continue
            recs = sorted(set(zip(g[id_col].tolist(), g["simhash"].tolist())))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    d = bin((recs[i][1] ^ recs[j][1]) & 0xFFFFFFFFFFFFFFFF).count("1")
                    if d <= max_hamming:
                        out["a"].append(recs[i][0])
                        out["b"].append(recs[j][0])
                        out["hamming"].append(d)
        return pd.DataFrame(
            {
                "a": pd.Series(out["a"], dtype="int64"),
                "b": pd.Series(out["b"], dtype="int64"),
                "hamming": pd.Series(out["hamming"], dtype="int64"),
            }
        ).drop_duplicates(["a", "b"])

    dedup_pairs = lambda df: df.drop_duplicates(["a", "b"])
    return bucketed_group_map(
        bucketed_group_map(rows, ["band", "key"], bucket_pairs),
        ["a", "b"],
        dedup_pairs,
        batch_partial=dedup_pairs,
    )


# ---------------------------------------------------------------------------
# decontamination (train/eval n-gram overlap removal)
# ---------------------------------------------------------------------------


def _token_ngram_rows(text_col: str, id_col: str, n: int):
    """Explode distinct hashed token n-grams per doc: tokens =
    ``[a-z0-9]+`` runs of the lowercased text (the same tokenizer the
    text-analysis family uses), gram hash = polynomial combine (mod
    2^64, multiplier 1000003) over per-token FNV-1a hashes.  The token
    hashing is one vectorized ``fnv1a64`` call per batch and the window
    combine is ``n`` shifted uint64 vector ops over the flat token
    stream with doc-boundary masking — no per-gram Python.

    Gram equality via 64-bit hashes equals string equality up to hash
    collisions (negligible; shared policy with the shingle family)."""
    from ..functions.text import WORD_RE
    from .sketch import fnv1a64

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        toks_per_doc = [WORD_RE.findall(t.lower()) for t in batch[text_col].to_pylist()]
        counts = np.fromiter(map(len, toks_per_doc), dtype=np.int64, count=len(ids))
        flat = [tok for toks in toks_per_doc for tok in toks]
        empty = pa.Table.from_pydict(
            {
                id_col: pa.array([], batch[id_col].type),
                "gram": pa.array([], pa.int64()),
            }
        )
        if len(flat) < n:
            return empty
        th = fnv1a64(pa.array(flat, type=pa.large_string()))
        doc_idx = np.repeat(np.arange(len(ids)), counts)
        L = len(flat)
        acc = np.zeros(L - n + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n):
                acc = acc * np.uint64(1000003) + th[j : L - n + 1 + j]
        valid = doc_idx[: L - n + 1] == doc_idx[n - 1 :]
        if not valid.any():
            return empty
        pairs = pd.DataFrame(
            {"_pos": doc_idx[: L - n + 1][valid], "gram": acc[valid].view(np.int64)}
        ).drop_duplicates()
        id_arr = pa.array(ids)
        return pa.Table.from_pydict(
            {
                id_col: id_arr.take(pa.array(pairs["_pos"].to_numpy())),
                "gram": pa.array(pairs["gram"].to_numpy(), pa.int64()),
            }
        )

    return explode


def decontaminate(
    docs: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Benchmark decontamination: drop every training doc that shares at
    least one n-token gram with any benchmark/eval doc (the standard
    train/test-overlap guard for LLM training corpora).  Returns the
    surviving ``docs`` rows, all columns intact.

    Scale shape: the benchmark gram set is deduped distributedly, then
    - small (≤ BROADCAST_BYTES): one ``ray.put`` of the hash array; each
      doc batch marks itself with a vectorized ``np.isin`` — ZERO
      shuffles, the common case (eval sets are tiny vs the corpus);
    - large: co-partitioned ``bucket_semi_join`` of exploded doc grams
      against the gram keys → distinct contaminated ids →
      ``bucket_anti_join`` — no driver state at any corpus size.
    """
    from .relational import bucket_anti_join, bucket_semi_join, bucketed_group_map

    explode = _token_ngram_rows(text_col, id_col, n)
    bench_grams = bucketed_group_map(
        benchmark.map_batches(explode, batch_format="pyarrow").map_batches(
            lambda t: pa.table({"gram": t["gram"].combine_chunks()}),
            batch_format="pyarrow",
        ),
        ["gram"],
        lambda df: df.drop_duplicates(),
        num_buckets=num_buckets,
        batch_partial=lambda df: df.drop_duplicates(),
    ).materialize()
    n_grams = bench_grams.count()
    if n_grams == 0:
        return docs  # no benchmark grams: nothing can be contaminated

    if n_grams * 8 <= BROADCAST_BYTES:
        gram_set = ray.put(
            bench_grams.to_pandas()["gram"].to_numpy(dtype=np.int64)
        )

        def keep_clean(batch: pa.Table) -> pa.Table:
            grams = explode(batch)
            hit_ids = grams.filter(
                pa.array(
                    np.isin(
                        grams["gram"].to_numpy(zero_copy_only=False),
                        ray.get(gram_set),
                    )
                )
            )[id_col]
            if len(hit_ids) == 0:
                return batch
            bad = pa.compute.is_in(batch[id_col], value_set=hit_ids.combine_chunks().unique())
            return batch.filter(pa.compute.invert(bad))

        return docs.map_batches(keep_clean, batch_format="pyarrow")

    doc_grams = docs.map_batches(explode, batch_format="pyarrow")
    contaminated = bucketed_group_map(
        bucket_semi_join(doc_grams, bench_grams, ["gram"], num_buckets=num_buckets)
        .map_batches(
            lambda t: pa.table({id_col: t[id_col].combine_chunks()}),
            batch_format="pyarrow",
        ),
        [id_col],
        lambda df: df.drop_duplicates(),
        num_buckets=num_buckets,
        batch_partial=lambda df: df.drop_duplicates(),
    )
    return bucket_anti_join(docs, contaminated, [id_col], num_buckets=num_buckets)


def remove_boilerplate_lines(
    docs: "ray.data.Dataset",
    min_docs: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """CCNet/RefinedWeb-style boilerplate line scrub: any LINE occurring
    in ≥ ``min_docs`` distinct documents (nav menus, cookie banners,
    footers — the stuff that repeats across a whole host) is deleted
    from every document; remaining lines keep their order.  Returns the
    input columns with ``text_col`` rewritten plus an ``n_removed``
    per-doc count of deleted line instances.

    Scale shape — two passes over lines, never over doc pairs:

    * pass 1 counts DISTINCT docs per line: per-batch (doc, line) pair
      dedup (combiner) → one bucketed exchange keyed on the line → df
      counts → boilerplate keys (``df ≥ min_docs``).  Grouping is on
      the line STRING, not a hash, so a collision can never delete an
      innocent line.
    * pass 2 rewrites docs.  The boilerplate set is small by
      construction (its total bytes ≤ corpus line bytes / min_docs), so
      within ``BROADCAST_BYTES`` it ships once via ``ray.put`` and each
      batch rewrites itself with vectorized isin — zero further
      shuffles (the realistic path at any corpus size with a sane
      threshold).  Past the gate: exploded (doc, line_no, line) rows
      take a ``bucket_anti_join`` against the keys, reassemble per doc
      in one more keyed exchange, and ``bucket_left_join`` back onto
      the docs so fully-boilerplate docs survive with empty text.
    """
    from .relational import bucket_anti_join, bucket_left_join, bucketed_group_map

    def pair_rows(t: pa.Table) -> pa.Table:
        df = t.select([id_col, text_col]).to_pandas()
        ex = df[[id_col]].assign(line=df[text_col].str.split("\n")).explode("line")
        return pa.Table.from_pandas(ex.drop_duplicates(), preserve_index=False)

    counts = bucketed_group_map(
        docs.map_batches(pair_rows, batch_format="pyarrow"),
        ["line"],
        lambda d: d.drop_duplicates()
        .groupby("line", as_index=False)
        .agg(df=(id_col, "nunique")),
        num_buckets=num_buckets,
        batch_partial=lambda d: d.drop_duplicates(),
    )
    boiler = counts.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t["df"], pa.scalar(min_docs, pa.int64()))
        ).select(["line"]),
        batch_format="pyarrow",
    ).materialize()
    sizes = boiler.map_batches(
        lambda t: pa.table(
            {
                "b": pa.array(
                    [int(pa.compute.sum(pa.compute.binary_length(t["line"])).as_py() or 0)]
                ),
                "n": pa.array([t.num_rows]),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    total_bytes = int(sizes["b"].sum()) + 16 * int(sizes["n"].sum())

    def split_cols(df: pd.DataFrame):
        s = df[text_col].str.split("\n")
        ex = df[[id_col]].assign(line=s).explode("line")
        return ex  # index repeats the batch row position per line

    if total_bytes <= BROADCAST_BYTES:
        key_ref = ray.put(frozenset(boiler.to_pandas()["line"].tolist()))

        def rewrite(t: pa.Table) -> pa.Table:
            keys = ray.get(key_ref)
            df = t.to_pandas()
            ex = split_cols(df)
            drop = ex["line"].isin(keys)
            kept = ex[~drop].groupby(level=0)["line"].agg("\n".join)
            out = df.copy()
            out[text_col] = kept.reindex(df.index, fill_value="")
            out["n_removed"] = (
                drop.groupby(ex.index).sum().reindex(df.index, fill_value=0).astype("int64")
            )
            return pa.Table.from_pandas(out, preserve_index=False)

        return docs.map_batches(rewrite, batch_format="pyarrow")

    def line_rows(t: pa.Table) -> pa.Table:
        df = t.select([id_col, text_col]).to_pandas()
        ex = split_cols(df)
        ex["line_no"] = ex.groupby(level=0).cumcount().astype("int64")
        return pa.Table.from_pandas(ex.reset_index(drop=True), preserve_index=False)

    lines = docs.map_batches(line_rows, batch_format="pyarrow")
    kept = bucket_anti_join(lines, boiler, ["line"], num_buckets=num_buckets)
    reassembled = bucketed_group_map(
        kept,
        [id_col],
        lambda d: d.sort_values("line_no")
        .groupby(id_col, as_index=False)
        .agg(_clean=("line", "\n".join), _kept=("line", "size")),
        num_buckets=num_buckets,
    )

    def with_totals(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["_lines"] = df[text_col].str.count("\n").astype("int64") + 1
        return pa.Table.from_pandas(df.drop(columns=[text_col]), preserve_index=False)

    joined = bucket_left_join(
        docs.map_batches(with_totals, batch_format="pyarrow"),
        reassembled,
        [id_col],
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df[text_col] = df["_clean"].fillna("")
        df["n_removed"] = (
            df["_lines"] - df["_kept"].fillna(0).astype("int64")
        ).astype("int64")
        return pa.Table.from_pandas(
            df.drop(columns=["_clean", "_kept", "_lines"]), preserve_index=False
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# passage-level first-wins dedup (ExactSubstr at segment granularity)
# ---------------------------------------------------------------------------


def _segment_rows(text_col: str, id_col: str, k: int):
    """Explode (id, seg_idx, gram) rows: the text is split on single
    spaces (``str.split(' ')`` — exactly DuckDB ``string_split``), cut
    into consecutive k-token segments (last one ragged), and each
    segment string is hashed with the shared vectorized ``fnv1a64``.
    Segment equality via 64-bit hashes equals string equality up to
    hash collisions (negligible; shared policy with the gram family).

    The per-doc tokenize/slice loop is Python, but every join/hash is a
    C-level call over the whole batch; no per-token Python."""
    from .sketch import fnv1a64

    def explode(batch: pa.Table) -> pa.Table:
        ids_py = batch[id_col].to_pylist()
        segs: list[str] = []
        counts = np.empty(len(ids_py), dtype=np.int64)
        for pos, t in enumerate(batch[text_col].to_pylist()):
            toks = t.split(" ")
            n = (len(toks) + k - 1) // k
            counts[pos] = n
            segs.extend(" ".join(toks[i * k : (i + 1) * k]) for i in range(n))
        if not segs:
            return pa.Table.from_pydict(
                {
                    id_col: pa.array([], batch[id_col].type),
                    "seg_idx": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.int64()),
                }
            )
        gram = fnv1a64(pa.array(segs, type=pa.large_string())).view(np.int64)
        doc_idx = np.repeat(np.arange(len(ids_py)), counts)
        seg_idx = np.arange(len(segs), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        return pa.Table.from_pydict(
            {
                id_col: pa.array(ids_py).take(pa.array(doc_idx)),
                "seg_idx": pa.array(seg_idx),
                "gram": pa.array(gram),
            }
        )

    return explode


def passage_dedup(
    docs: "ray.data.Dataset",
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Corpus-wide passage-level first-wins dedup (the ExactSubstr idea
    of Lee et al. 2022 at fixed k-token segment granularity): every
    k-token segment of every doc is kept only at its first occurrence
    corpus-wide (lexicographic min ``(doc_id, seg_idx)``); later copies
    — across docs or repeated within one doc — are cut, and each doc's
    surviving segments are re-joined in order.  Returns
    ``(id_col, text_dedup, kept_segments)``; docs whose every segment
    is a duplicate drop out.

    Scale shape: TWO bucketed exchanges total, and segment TEXT never
    shuffles in the first.  (1) Winner election: (id, seg_idx, gram64)
    triples bucketed by gram hash with a per-batch min-combiner; the
    per-gram minimum occurrence IS the kept set — no join-back needed.
    (2) Rebuild: the kept (id, seg_idx) pairs and the original docs are
    co-partitioned by id hash in one union exchange; each bucket
    re-segments its docs locally and re-joins the surviving segments.
    Segments are recomputed rather than materialized (zero resident
    state, same trade as the shingle family).  No driver state, no
    broadcast, no all-pairs anywhere.
    """
    from .relational import bucketed_group_map

    explode = _segment_rows(text_col, id_col, k)

    def min_occ(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["gram", id_col, "seg_idx"], kind="mergesort")
            .drop_duplicates("gram")
            .reset_index(drop=True)
        )

    kept = bucketed_group_map(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["gram"],
        min_occ,
        num_buckets=num_buckets,
        batch_partial=min_occ,
    ).map_batches(
        lambda df: df[[id_col, "seg_idx"]].assign(_txt=None), batch_format="pandas"
    )

    side2 = docs.map_batches(
        lambda df: pd.DataFrame(
            {id_col: df[id_col], "seg_idx": np.int64(-1), "_txt": df[text_col]}
        ),
        batch_format="pandas",
    )

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[df["seg_idx"] == -1].set_index(id_col)["_txt"]
        kept_idx = (
            df[df["seg_idx"] >= 0]
            .sort_values([id_col, "seg_idx"], kind="mergesort")
            .groupby(id_col, sort=True)["seg_idx"]
        )
        sizes = kept_idx.size()
        out_ids, out_txt = [], []
        for doc, idxs in kept_idx.agg(list).items():
            toks = texts[doc].split(" ")
            out_ids.append(doc)
            out_txt.append(
                " ".join(" ".join(toks[i * k : (i + 1) * k]) for i in idxs)
            )
        return pd.DataFrame(
            {
                id_col: out_ids,
                "text_dedup": out_txt,
                "kept_segments": sizes.to_numpy().astype("int64"),
            }
        )

    return bucketed_group_map(
        kept.union(side2), [id_col], rebuild, num_buckets=num_buckets
    )


def keep_best_per_cluster(
    clusters: "ray.data.Dataset",
    quality: "ray.data.Dataset",
    score_col: str,
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Canonical-document selection — the step AFTER near-dup clustering
    that decides WHICH duplicate survives (SemDeDup / CCNet keep-best
    policy: highest quality, ties to the smallest id, instead of
    exact-dedup's arbitrary first-wins).

    ``clusters`` is minhash_clusters / connected_components output
    (node, label); ``quality`` holds (id_col, score_col).  Returns one
    row per cluster: (label, kept_<id_col>, best_<score_col>,
    n_members).

    Scale shape: one co-partitioned hash join to attach scores (no
    broadcast at any corpus size), then one label-bucketed argmax fold
    whose output is O(#clusters) — member rows never reach the driver.
    """
    from .relational import bucket_hash_join, bucketed_group_map

    c = clusters.map_batches(
        lambda t: pa.table(
            {
                id_col: t["node"].combine_chunks().cast(pa.int64()),
                "label": t["label"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucket_hash_join(c, quality, [id_col], num_buckets=num_buckets)
    kept_col, best_col = f"kept_{id_col}", f"best_{score_col}"

    def per_bucket(df):
        df = df.sort_values(
            [score_col, id_col], ascending=[False, True], kind="mergesort"
        )
        g = df.groupby("label").agg(
            **{
                kept_col: (id_col, "first"),
                best_col: (score_col, "first"),
                "n_members": (id_col, "size"),
            }
        )
        return g.reset_index()

    return bucketed_group_map(joined, ["label"], per_bucket, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# banded edit-distance near-dup pairs
# ---------------------------------------------------------------------------


def edit_distance_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 40,
    max_dist: int = 5,
    num_buckets: int = 32,
    max_band_rows: int = 20_000,
) -> "ray.data.Dataset":
    """Near-dup pairs by EXACT Levenshtein distance over the UTF-8
    bytes of a ``prefix_len``-character prefix (distance ≤ max_dist).
    Byte-level distance + character-level prefix deliberately mirror
    DuckDB's ``levenshtein(substr(text, 1, P))`` so the SQL twin is
    exact on any input (see functions.text.levenshtein_bytes).

    Length-band blocking: edit distance ≥ |byte_len(a) − byte_len(b)|,
    so a qualifying pair's byte lengths differ by ≤ max_dist and its
    band ids g = L // (max_dist + 1) differ by ≤ 1.  Each doc is
    emitted once to its native band and once as a GHOST to the band
    above; a band's task generates native×native pairs plus
    ghost×native pairs (the cross-boundary ones) — every candidate
    pair exactly once, ghost×ghost pairs are the band-below's
    native×native pairs.  Verification is the banded O(P·max_dist) DP
    with early cap exit, run only on pairs that pass a sorted
    two-pointer length-gap scan.

    Scale: the one exchange carries (id, prefix, L) twice — O(2·N·P)
    bytes, independent of text size; bands are independent tasks.  A
    degenerate corpus (every prefix the same length) collapses into
    one band and O(n²) candidate checks, as in any blocking scheme —
    ``max_band_rows`` raises before that work is attempted; split such
    corpora on a secondary key (e.g. first-byte band) instead.
    """
    from ..functions.text import levenshtein_bytes
    from .relational import bucketed_group_map

    width = max_dist + 1

    def to_band_rows(t: pa.Table) -> pa.Table:
        ids, bands, native, prefixes, lens = [], [], [], [], []
        for i, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            p = (txt or "")[:prefix_len].encode("utf-8")
            g = len(p) // width
            for band, nat in ((g, True), (g + 1, False)):
                ids.append(i)
                bands.append(band)
                native.append(nat)
                prefixes.append(p)
                lens.append(len(p))
        return pa.Table.from_pydict(
            {
                id_col: pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int64()),
                "native": pa.array(native, pa.bool_()),
                "prefix": pa.array(prefixes, pa.binary()),
                "blen": pa.array(lens, pa.int64()),
            }
        )

    rows = ds.map_batches(to_band_rows, batch_format="pyarrow")

    def band_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        for _, g in df.groupby("band"):
            if len(g) < 2:
                continue
            if len(g) > max_band_rows:
                raise ValueError(
                    f"edit_distance_pairs: band holds {len(g)} rows "
                    f"(> max_band_rows={max_band_rows}); prefix lengths are "
                    "too uniform for length-band blocking — add a secondary "
                    "blocking key or raise max_band_rows deliberately."
                )
            g = g.sort_values(["blen", id_col], kind="mergesort")
            ids = g[id_col].to_numpy()
            nat = g["native"].to_numpy()
            pref = g["prefix"].tolist()
            lens = g["blen"].to_numpy()
            n = len(g)
            for i in range(n):
                li = lens[i]
                pi = pref[i]
                for j in range(i + 1, n):
                    if lens[j] - li > max_dist:
                        break
                    # native×native or ghost×native; ghost×ghost pairs
                    # belong to (and are produced by) the band below
                    if not (nat[i] or nat[j]):
                        continue
                    if ids[i] == ids[j]:
                        continue
                    d = levenshtein_bytes(pi, pref[j], max_dist=max_dist)
                    if d <= max_dist:
                        a, b = ids[i], ids[j]
                        if a > b:
                            a, b = b, a
                        out_a.append(a)
                        out_b.append(b)
                        out_d.append(d)
        return pd.DataFrame(
            {
                "a": pd.Series(out_a, dtype="int64"),
                "b": pd.Series(out_b, dtype="int64"),
                "dist": pd.Series(out_d, dtype="int64"),
            }
        ).drop_duplicates(["a", "b"])

    return bucketed_group_map(rows, ["band"], band_pairs, num_buckets=num_buckets)


def contamination_fraction(
    docs: "ray.data.Dataset",
    bench_col: str = "is_bench",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_buckets: int = 32,
    round_to: int | None = 6,
) -> "ray.data.Dataset":
    """FRACTIONAL benchmark-overlap contamination score (the GPT-3 /
    PaLM screening variant, vs :func:`decontaminate`'s any-hit drop):
    per document, the share of its word-token ``n``-gram windows that
    occur anywhere in the benchmark slice (``bench_col`` = 0/1).
    Returns (id_col, n_windows, n_matched, contam_frac); docs with
    fewer than ``n`` tokens have no windows and drop (no denominator).
    Benchmark docs score 1.0 by construction — a built-in sanity band.

    Scale shape: per-(doc, gram) counts combine per batch before the
    single gram-keyed exchange; the gram→is-benchmark flag is a masked
    MAX over the same exchange (every gram keeps a row, so the score
    join is a plain co-partitioned inner join — defined even with an
    empty benchmark); per-doc totals are one doc-keyed aggregation.
    Nothing broadcasts, nothing exceeds O(distinct grams per bucket)."""
    from ..functions.text import WORD_RE
    from .relational import bucket_hash_join, bucketed_agg, bucketed_group_map

    def explode(batch: pa.Table) -> pa.Table:
        ids, grams, flags = [], [], []
        for i, t, b in zip(
            batch[id_col].to_pylist(),
            batch[text_col].to_pylist(),
            batch[bench_col].to_pylist(),
        ):
            ts = WORD_RE.findall(t.lower())
            for j in range(len(ts) - n + 1):
                ids.append(i)
                grams.append(" ".join(ts[j : j + n]))
                flags.append(int(b))
        df = (
            pd.DataFrame({id_col: ids, "gram": grams, "is_b": flags})
            .groupby([id_col, "gram", "is_b"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        # explicit types — a batch where every doc is shorter than n
        # tokens must not emit a float64-typed schema into the exchange
        return pa.table(
            {
                id_col: pa.array(df[id_col], batch.schema.field(id_col).type),
                "gram": pa.array(df["gram"], pa.string()),
                "is_b": pa.array(df["is_b"], pa.int64()),
                "c": pa.array(df["c"], pa.int64()),
            }
        )

    dg = bucketed_agg(
        docs.map_batches(explode, batch_format="pyarrow"),
        [id_col, "gram", "is_b"],
        value_col="c",
        how="sum",
        out_col="c",
        num_buckets=num_buckets,
    ).materialize()  # consumed by the flag table AND the score join

    bg = bucketed_agg(
        dg, ["gram"], value_col="is_b", how="max", out_col="ib",
        num_buckets=num_buckets,
    )

    joined = bucket_hash_join(
        dg.map_batches(
            lambda df: df[[id_col, "gram", "c"]], batch_format="pandas"
        ),
        bg,
        ["gram"],
        num_buckets=num_buckets,
    )

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(dtype="int64")
        m = c * df["ib"].to_numpy(dtype="int64")
        g = pd.DataFrame({id_col: df[id_col], "n_windows": c, "n_matched": m})
        out = g.groupby(id_col, as_index=False)[["n_windows", "n_matched"]].sum()
        frac = out["n_matched"].to_numpy(dtype="float64") / out[
            "n_windows"
        ].to_numpy(dtype="float64")
        if round_to is not None:
            from ..functions.numeric import round_half_away

            frac = round_half_away(frac, round_to)
        out["contam_frac"] = frac
        return out

    return bucketed_group_map(joined, [id_col], per_doc, num_buckets=num_buckets)


def prefix_blocked_pairs(
    ds: "ray.data.Dataset",
    score_fn,
    keep_fn,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 24,
    block_chars: int = 4,
    num_buckets: int = 32,
    max_block_rows: int = 20_000,
    score_name: str = "score",
    score_dtype: str = "float64",
) -> "ray.data.Dataset":
    """Record-linkage BLOCKING-KEY pairs: candidate pairs share the
    first ``block_chars`` characters of their ``prefix_len``-char key
    (the textbook blocking strategy — cheap, high-recall for
    prefix-stable near-dups), scored pairwise by ``score_fn(bytes,
    bytes)`` and kept when ``keep_fn(score)``.  The complement to
    :func:`edit_distance_pairs`' length-band blocking: prefix blocks
    admit any length difference (Jaro-Winkler tolerates them) but
    miss pairs that diverge inside the first ``block_chars`` chars —
    the standard recall trade of blocking keys.

    One exchange carries (id, key-prefix) — O(N·prefix_len) bytes;
    each block is an independent task doing the quadratic verify.  A
    degenerate corpus (one shared prefix) collapses into one block, as
    in any blocking scheme — ``max_block_rows`` raises before that
    O(n²) work is attempted.  Char-level keys mirror SQL
    ``substr(text, 1, P)`` so DuckDB twins join on the identical
    block (scores must themselves be oracle-exact; see
    functions.text.jaro_winkler_bytes / damerau_levenshtein_bytes)."""
    from .relational import bucketed_group_map

    def to_rows(t: pa.Table) -> pd.DataFrame:
        import pandas as pd

        # Drop NULL-text rows before blocking: the SQL twins' substr join
        # predicate never matches NULL, so two null-text docs must not meet
        # in the shared "" block (latent divergence flagged in ADVICE r4).
        t = t.filter(pc.is_valid(t[text_col]))
        keys = [(txt or "")[:prefix_len] for txt in t[text_col].to_pylist()]
        return pd.DataFrame(
            {
                id_col: t[id_col].to_pandas(),
                "_key": keys,
                "_blk": [k[:block_chars] for k in keys],
            }
        )

    def per_block(df):
        import pandas as pd

        out_a, out_b, out_s = [], [], []
        for _, g in df.groupby("_blk", sort=False):
            if len(g) > max_block_rows:
                raise ValueError(
                    f"prefix block of {len(g)} rows exceeds max_block_rows="
                    f"{max_block_rows}; use a longer block key or a"
                    " capped/sampled variant for this corpus"
                )
            ids = g[id_col].to_numpy()
            keys = [k.encode("utf-8") for k in g["_key"]]
            order = np.argsort(ids, kind="mergesort")
            for x in range(len(order)):
                i = order[x]
                for y in range(x + 1, len(order)):
                    j = order[y]
                    s = score_fn(keys[i], keys[j])
                    if keep_fn(s):
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_s.append(s)
        return pd.DataFrame(
            {
                f"{id_col}_a": pd.Series(out_a, dtype="int64"),
                f"{id_col}_b": pd.Series(out_b, dtype="int64"),
                # explicit dtype: a no-pairs block must not poison the
                # exchange with an object-typed empty column
                score_name: pd.Series(out_s, dtype=score_dtype),
            }
        )

    return bucketed_group_map(
        ds.map_batches(to_rows, batch_format="pyarrow"),
        ["_blk"],
        per_block,
        num_buckets=num_buckets,
    )
