"""Graph analytics over edge-list Datasets (PageRank, connected
components).

The reference stores a web graph (pages + links,
/root/reference/pkg/linkstorage/linkstorage.go:23-66) but offers only
point lookups over it — no whole-graph analytics.  PageRank is the
canonical query such a store exists to answer, so the engine adds it
(plus min-label connected components) as first-class distributed
operators over any (src, dst) edge Dataset — including the crawl's own
page graph.

Execution model — WHY raw Ray tasks here: iterative graph algorithms
need the same co-partitioning reused every iteration (ranks of bucket b
joined to edges of bucket b, messages exchanged bucket→bucket).  Ray
Data has no hash-co-partitioned zip, so a Dataset formulation pays a
full sort-shuffle per join per iteration — measured ~7 sort jobs ×
iterations on the bucketed-join version, 60×+ slower than direct
exchange.  This is the one documented case (brief: "shared mutable /
iterative state") where the engine drops below the Dataset API:

- ``_partition_graph`` (Ray Data, one pass): hash-partition edges into
  per-bucket Parquet sidecars (the crawl engine's own state idiom) with
  the receiver's bucket precomputed per edge, and per-bucket node
  files.  Static across iterations; file bytes ride the OS page cache.
- per iteration: B map tasks (read own edge bucket + own ranks block →
  partial-aggregate messages per destination bucket; ``num_returns=B``
  so each reducer fetches ONLY its slice) and B reduce tasks (merge
  message partials onto the bucket's node set).  Driver state: O(B)
  object refs + O(B) scalars — never nodes or edges.
- results come back as a Dataset via ``from_pandas_refs`` (blocks stay
  in the object store).

This is the standard Pregel/Spark-GraphX cost profile: one exchange of
message partials per iteration, no sorts.  Partitioning assumption:
none beyond hashability of the node id column (ints and strings both
work; bucket = pd.util.hash_pandas_object, the same stable hash the
relational bucket primitives use).

Determinism / SQL-twin policy (pagerank): ranks are rounded
HALF-AWAY-FROM-ZERO to ``iter_round`` decimals after EVERY iteration
(initial rank included), in both the engine and the DuckDB oracle, so
float summation-order differences (~1e-16) can never accumulate across
iterations or flip the final 6-dp comparison.  Connected components is
exact integer/string min-propagation — no float policy needed.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.numeric import round_half_away
from .relational import bucketed_group_map, _as_arrow

__all__ = [
    "pagerank",
    "connected_components",
    "distinct_nodes",
    "degrees",
    "triangle_count",
    "hits",
    "bfs_layers",
    "kcore",
]


def _bucket_of(s: pd.Series, num_buckets: int) -> np.ndarray:
    return (pd.util.hash_pandas_object(s, index=False).values % num_buckets).astype(
        np.int64
    )


def _node_column(ds: "ray.data.Dataset", col: str) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda t: pa.table({"node": t[col].combine_chunks()}),
        batch_format="pyarrow",
    )


def distinct_nodes(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distinct node ids appearing on either side of the edge list —
    union of the two columns, deduped per hash bucket (never on the
    driver)."""
    both = _node_column(edges, src_col).union(_node_column(edges, dst_col))
    return bucketed_group_map(
        both,
        ["node"],
        lambda df: df.drop_duplicates(),
        num_buckets=num_buckets,
        batch_partial=lambda df: df.drop_duplicates(),
    )


def _partition_graph(
    edges: "ray.data.Dataset",
    src_col: str,
    dst_col: str,
    num_buckets: int,
    work_dir: str | None,
    symmetric: bool = False,
    with_degree: bool = False,
    bidirectional: bool = False,
) -> tuple[str, str]:
    """One Ray Data pass each for edges and nodes → bucket-affine
    Parquet sidecars under ``work_dir`` (tempdir if None):

    - edges/bucket=B.parquet: all edges whose SENDER hashes to B
      (sender = src, or both endpoints when ``symmetric``), columns
      (src, dst, dst_bucket[, odeg]).  ``odeg`` can be computed inside
      the bucket task because a bucket holds every edge of its senders.
    - nodes/bucket=B.parquet: the bucket's distinct node ids.

    Returns (edges_dir, nodes_dir).  Static state for the iteration
    loop; written once, read per iteration via the OS page cache."""
    root = work_dir or tempfile.mkdtemp(prefix="wg_graph_", dir="/tmp")
    edir, ndir = os.path.join(root, "edges"), os.path.join(root, "nodes")
    os.makedirs(edir, exist_ok=True)
    os.makedirs(ndir, exist_ok=True)

    edges = _as_arrow(edges)

    def canon(t: pa.Table) -> pa.Table:
        s, d = t[src_col].combine_chunks(), t[dst_col].combine_chunks()
        if symmetric:
            s, d = pa.concat_arrays([s, d]), pa.concat_arrays([d, s])
        if bidirectional:
            # both orientations in ONE partitioning pass, tagged by
            # direction — halves the static-state jobs for algorithms
            # that exchange along edges both ways (HITS)
            n = len(s)
            s, d = pa.concat_arrays([s, d]), pa.concat_arrays([d, s])
            return pa.table(
                {"src": s, "dst": d,
                 "dir": pa.array([0] * n + [1] * n, pa.int8())}
            )
        return pa.table({"src": s, "dst": d})

    canon_edges = edges.map_batches(canon, batch_format="pyarrow")

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["_bucket"].iloc[0])
        df = df.drop(columns=["_bucket"])
        df["dst_bucket"] = _bucket_of(df["dst"], num_buckets)
        if with_degree:
            df["odeg"] = df.groupby("src")["src"].transform("size").astype("int64")
        df.to_parquet(os.path.join(edir, f"bucket={b}.parquet"), index=False)
        return pd.DataFrame({"bucket": [b], "rows": [len(df)]})

    def tag_src(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_bucket"] = _bucket_of(out["src"], num_buckets)
        return out

    (
        canon_edges.map_batches(tag_src, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .materialize()
    )

    # distinct per node-bucket, written bucket-affine (node's own hash)
    both = _node_column(canon_edges, "src").union(_node_column(canon_edges, "dst"))

    def tag_node(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates().copy()
        out["_bucket"] = _bucket_of(out["node"], num_buckets)
        return out

    def dedup_write(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["_bucket"].iloc[0])
        nodes = df.drop(columns=["_bucket"]).drop_duplicates().sort_values("node")
        nodes.to_parquet(os.path.join(ndir, f"bucket={b}.parquet"), index=False)
        return pd.DataFrame({"bucket": [b], "rows": [len(nodes)]})

    (
        both.map_batches(tag_node, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(dedup_write, batch_format="pandas")
        .materialize()
    )
    return edir, ndir


def _bucket_path(d: str, b: int) -> str:
    return os.path.join(d, f"bucket={b}.parquet")


@ray.remote
def _pr_init(ndir: str, b: int, r0: float) -> tuple:
    p = _bucket_path(ndir, b)
    if not os.path.exists(p):
        df = pd.DataFrame({"node": pd.Series([], dtype="object"), "rank": []})
        return df, 0.0
    nodes = pd.read_parquet(p)
    df = pd.DataFrame({"node": nodes["node"], "rank": np.full(len(nodes), r0)})
    return df, float(df["rank"].sum())


@ray.remote
def _pr_messages(edir: str, b: int, num_buckets: int, ranks: pd.DataFrame):
    """Map phase for src-bucket b: contributions rank/odeg per edge,
    partial-summed by (dst_bucket, dst).  Returns B per-destination
    frames + the bucket's total outgoing contribution (for the dangling
    -mass identity).  Only slice i is shipped to reducer i."""
    p = _bucket_path(edir, b)
    empty = pd.DataFrame({"node": pd.Series([], dtype="object"), "c": []})
    if not os.path.exists(p):
        return [empty] * num_buckets + [0.0]
    e = pd.read_parquet(p)
    m = e.merge(ranks.rename(columns={"node": "src", "rank": "_r"}), on="src", how="inner")
    m["c"] = m["_r"].to_numpy() / m["odeg"].to_numpy()
    parts = m.groupby(["dst_bucket", "dst"], as_index=False)["c"].sum()
    out = []
    grouped = dict(tuple(parts.groupby("dst_bucket")))
    for nb in range(num_buckets):
        g = grouped.get(nb)
        out.append(
            g.rename(columns={"dst": "node"})[["node", "c"]]
            if g is not None
            else empty
        )
    return out + [float(parts["c"].sum())]


@ray.remote
def _pr_reduce(
    ndir: str, b: int, base: float, damping: float, dm: float, iter_round: int, *parts
) -> tuple:
    p = _bucket_path(ndir, b)
    if not os.path.exists(p):
        return pd.DataFrame({"node": pd.Series([], dtype="object"), "rank": []}), 0.0
    nodes = pd.read_parquet(p)
    live = [x for x in parts if len(x)]
    allp = pd.concat(live, ignore_index=True) if live else None
    if allp is not None and len(allp):
        sums = allp.groupby("node", as_index=False)["c"].sum()
        s = nodes.merge(sums, on="node", how="left")["c"].fillna(0.0).to_numpy()
    else:
        s = np.zeros(len(nodes))
    rank = round_half_away(base + damping * (s + dm), iter_round)
    df = pd.DataFrame({"node": nodes["node"], "rank": rank})
    return df, float(df["rank"].sum())


def pagerank(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    num_buckets: int = 32,
    iter_round: int = 9,
    work_dir: str | None = None,
) -> "ray.data.Dataset":
    """PageRank over an edge-list Dataset; returns (node, rank).

    Duplicate edge rows are multi-edges (they count in the out-degree
    and contribute once each — matching a SQL twin that aggregates per
    edge row).  Dangling-node mass is redistributed uniformly each
    iteration via the totals identity dm = sum(prev) − sum(sent), so
    total rank stays ≈1 (exactly 1 up to the per-iteration rounding).
    See the module docstring for the partition-once / message-exchange
    execution model."""
    edir, ndir = _partition_graph(
        edges, src_col, dst_col, num_buckets, work_dir, with_degree=True
    )
    n = sum(
        pq.read_metadata(_bucket_path(ndir, b)).num_rows
        for b in range(num_buckets)
        if os.path.exists(_bucket_path(ndir, b))
    )
    if n == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"node": pd.Series([], dtype="object"), "rank": []})
        )

    r0 = float(round_half_away([1.0 / n], iter_round)[0])
    base = (1.0 - damping) / n
    init = [
        _pr_init.options(num_returns=2).remote(ndir, b, r0)
        for b in range(num_buckets)
    ]
    rank_refs = [t[0] for t in init]  # frames stay in the object store
    prev_total = float(np.sum(ray.get([t[1] for t in init])))

    for _ in range(iterations):
        msg = [
            _pr_messages.options(num_returns=num_buckets + 1).remote(
                edir, b, num_buckets, rank_refs[b]
            )
            for b in range(num_buckets)
        ]
        sent = float(np.sum(ray.get([m[num_buckets] for m in msg])))
        dm = (prev_total - sent) / n
        red = [
            _pr_reduce.options(num_returns=2).remote(
                ndir, b, base, damping, dm, iter_round,
                *[msg[sb][b] for sb in range(num_buckets)],
            )
            for b in range(num_buckets)
        ]
        rank_refs = [r[0] for r in red]
        prev_total = float(np.sum(ray.get([r[1] for r in red])))

    return ray.data.from_pandas_refs(rank_refs)


@ray.remote
def _cc_init(ndir: str, b: int) -> "pd.DataFrame":
    p = _bucket_path(ndir, b)
    if not os.path.exists(p):
        return pd.DataFrame({"node": pd.Series([], dtype="object")}).assign(label=None)
    nodes = pd.read_parquet(p)
    return pd.DataFrame({"node": nodes["node"], "label": nodes["node"]})


@ray.remote
def _cc_messages(edir: str, b: int, num_buckets: int, labels: pd.DataFrame):
    """Map phase for sender-bucket b of the SYMMETRIZED edges: each
    sender src forwards its current label to dst; partial-min by
    (dst_bucket, dst)."""
    p = _bucket_path(edir, b)
    empty = pd.DataFrame({"node": pd.Series([], dtype="object"), "m": pd.Series([], dtype="object")})
    if not os.path.exists(p):
        return [empty] * num_buckets
    e = pd.read_parquet(p)
    m = e.merge(labels.rename(columns={"node": "src", "label": "m"}), on="src", how="inner")
    parts = m.groupby(["dst_bucket", "dst"], as_index=False)["m"].min()
    out = []
    grouped = dict(tuple(parts.groupby("dst_bucket")))
    for nb in range(num_buckets):
        g = grouped.get(nb)
        out.append(
            g.rename(columns={"dst": "node"})[["node", "m"]] if g is not None else empty
        )
    return out


@ray.remote
def _cc_reduce(ndir: str, b: int, *parts) -> "pd.DataFrame":
    p = _bucket_path(ndir, b)
    if not os.path.exists(p):
        return pd.DataFrame({"node": pd.Series([], dtype="object")}).assign(label=None)
    nodes = pd.read_parquet(p)
    live = [x for x in parts if len(x)]
    allp = pd.concat(live, ignore_index=True) if live else None
    if allp is not None and len(allp):
        mins = allp.groupby("node", as_index=False)["m"].min()
        df = nodes.merge(mins, on="node", how="left")
        df["label"] = df[["m", "node"]].min(axis=1)
        return df[["node", "label"]]
    return pd.DataFrame({"node": nodes["node"], "label": nodes["node"]})


def connected_components(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 4,
    num_buckets: int = 32,
    work_dir: str | None = None,
) -> "ray.data.Dataset":
    """Connected components by iterative min-label propagation over the
    symmetrized edge list; returns (node, label), label = the component
    minimum after ``rounds`` propagation rounds (converges in
    O(component diameter)):

    label_1(x)   = min(x, min over peers)            (identity labels in)
    label_k+1(x) = min(x, min over peers of label_k(peer))

    Same partition-once / message-exchange loop as pagerank (module
    docstring) — zero driver-side state (no union-find), node ids may
    be any orderable dtype (ints and strings).  Generalizes the dedup
    family's minhash_clusters, which delegates here."""
    edir, ndir = _partition_graph(
        edges, src_col, dst_col, num_buckets, work_dir, symmetric=True
    )
    label_refs = [_cc_init.remote(ndir, b) for b in range(num_buckets)]
    for _ in range(rounds):
        msg = [
            _cc_messages.options(num_returns=num_buckets).remote(
                edir, b, num_buckets, label_refs[b]
            )
            for b in range(num_buckets)
        ]
        label_refs = [
            _cc_reduce.remote(ndir, b, *[msg[sb][b] for sb in range(num_buckets)])
            for b in range(num_buckets)
        ]
    return ray.data.from_pandas_refs(label_refs)


# ---------------------------------------------------------------------------
# degrees / triangle counting (one-shot Dataset compositions, no iteration)
# ---------------------------------------------------------------------------


def degrees(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-node degree triple over a directed edge list — (node,
    out_deg, in_deg, deg) with multi-edge rows counted once each.
    One endpoint explode + one bucketed count per direction flag; the
    per-batch partial pre-sums before the shuffle so only (node, flag,
    partial) rows move."""
    from .relational import bucketed_group_map

    def explode(t: pa.Table) -> pa.Table:
        s, d = t[src_col].combine_chunks(), t[dst_col].combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([s, d]),
                "_out": pa.array([1] * len(s) + [0] * len(d), pa.int64()),
                "_in": pa.array([0] * len(s) + [1] * len(d), pa.int64()),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)[["_out", "_in"]].sum()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)[["_out", "_in"]].sum()
        return pd.DataFrame(
            {
                "node": g["node"],
                "out_deg": g["_out"].astype("int64"),
                "in_deg": g["_in"].astype("int64"),
                "deg": (g["_out"] + g["_in"]).astype("int64"),
            }
        )

    return bucketed_group_map(
        edges.map_batches(explode, batch_format="pyarrow"),
        ["node"],
        per_bucket,
        num_buckets=num_buckets,
        batch_partial=partial,
    )


def _canon_edges(
    edges: "ray.data.Dataset",
    src_col: str,
    dst_col: str,
    num_buckets: int,
) -> "ray.data.Dataset":
    """Canonicalize a directed edge list to the undirected SIMPLE edge
    set (lo < hi, loops and duplicate rows dropped) — per-batch partial
    dedup, then one bucketed exact dedup."""
    from .relational import bucketed_group_map

    edges = _as_arrow(edges)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        s, d = df[src_col], df[dst_col]
        out = pd.DataFrame({"lo": s.where(s < d, d), "hi": d.where(s < d, s)})
        return out[out["lo"] != out["hi"]].drop_duplicates()

    return bucketed_group_map(
        edges.map_batches(canon, batch_format="pandas"),
        ["lo", "hi"],
        lambda df: df.drop_duplicates(),
        num_buckets=num_buckets,
        batch_partial=lambda df: df.drop_duplicates(),
    )


def _oriented_edges(
    e0: "ray.data.Dataset", num_buckets: int, deg: "ray.data.Dataset | None" = None
) -> "ray.data.Dataset":
    """Degree-orient the canonical edge set (Schank & Wagner): every
    edge points from its lexicographically smaller (degree, node)
    endpoint, so out-degree is O(sqrt(E)) for any node and hub nodes
    generate NO wedges.  Returns a MATERIALIZED Dataset[u, v, v_deg]:
    both the wedge generator and the closing semi-join consume it, and
    its lineage is 4 shuffles deep — recomputing it twice costs more
    than holding O(E) blocks in the (spillable) object store.
    Distributed blocks, never driver rows."""
    from .relational import bucket_hash_join

    if deg is None:
        deg = degrees(e0, "lo", "hi", num_buckets=num_buckets).map_batches(
            lambda df: df[["node", "deg"]], batch_format="pandas"
        )

    j = bucket_hash_join(
        e0,
        deg.map_batches(
            lambda df: df.rename(columns={"node": "lo", "deg": "lo_deg"}),
            batch_format="pandas",
        ),
        ["lo"],
        num_buckets=num_buckets,
    )
    j = bucket_hash_join(
        j,
        deg.map_batches(
            lambda df: df.rename(columns={"node": "hi", "deg": "hi_deg"}),
            batch_format="pandas",
        ),
        ["hi"],
        num_buckets=num_buckets,
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        # lo < hi always, so ties on degree orient lo -> hi
        fwd = df["lo_deg"] <= df["hi_deg"]
        return pd.DataFrame(
            {
                "u": df["lo"].where(fwd, df["hi"]),
                "v": df["hi"].where(fwd, df["lo"]),
                "v_deg": df["hi_deg"].where(fwd, df["lo_deg"]).astype("int64"),
            }
        )

    return j.map_batches(orient, batch_format="pandas").materialize()


def _wedge_fn(with_apex: bool):
    """Per-bucket wedge generator over oriented edges grouped by source
    u: each out-neighbor pair (v1, v2) in min-(deg, node)-first order is
    one wedge.  ONE definition of the corner-ordering predicate — the
    triangle counter and the per-node crediting must agree on which
    corner discovers a triangle."""

    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="u", suffixes=("_1", "_2"))
        first = (m["v_deg_1"] < m["v_deg_2"]) | (
            (m["v_deg_1"] == m["v_deg_2"]) & (m["v_1"] < m["v_2"])
        )
        m = m[first]
        out = {"u": m["v_1"], "v": m["v_2"]}
        if with_apex:
            out["apex"] = m["u"]
        return pd.DataFrame(out)

    return wedge_pairs


def _tag_uv(side: int, with_apex: bool):
    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["u", "v"]].copy()
        if with_apex:
            # side-1 (edge) rows never read apex; duplicating u keeps
            # the union schema dtype-stable for any node type
            out["apex"] = df["apex"] if side == 0 else df["u"]
        out["_side"] = np.int8(side)
        return out

    return f


def clustering_coefficients(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-node triangle participation over the undirected simple
    graph: Dataset[node, deg, triangles] (local clustering coefficient
    = 2·triangles / (deg·(deg−1)) is left to the caller's rounding
    policy).  Same oriented wedge-closure as :func:`triangle_count` —
    each triangle is DISCOVERED once at its minimum-(deg, node) corner
    but CREDITED to all three corners: the closing co-partition keeps
    the wedge apex, explodes the three corners, and pre-sums per
    bucket, so the final exchange carries (node, partial-count) rows,
    never the triangle list."""
    from .relational import bucket_left_join, bucketed_agg, bucketed_group_map

    # e0 feeds BOTH the degree pass and the orientation joins — without
    # materializing, its canon+dedup exchange re-executes per consumer;
    # deg likewise feeds orientation AND the final left join
    e0 = _canon_edges(edges, src_col, dst_col, num_buckets).materialize()
    deg = degrees(e0, "lo", "hi", num_buckets=num_buckets).map_batches(
        lambda df: df[["node", "deg"]], batch_format="pandas"
    ).materialize()
    oriented = _oriented_edges(e0, num_buckets, deg=deg)

    def zero_fill(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["triangles"] = (
            out["triangles"].fillna(0).astype("int64")
            if "triangles" in out
            else np.int64(0)
        )
        return out[["node", "deg", "triangles"]]

    if oriented.count() == 0:
        return deg.map_batches(
            lambda df: df.assign(triangles=np.int64(0)), batch_format="pandas"
        )

    wedges = bucketed_group_map(
        oriented, ["u"], _wedge_fn(with_apex=True), num_buckets=num_buckets
    )
    tag = lambda side: _tag_uv(side, with_apex=True)  # noqa: E731

    def credit_corners(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["_side"] == 1][["u", "v"]].drop_duplicates()
        w = df[df["_side"] == 0][["u", "v", "apex"]]
        hit = w.merge(e, on=["u", "v"])  # each row IS one triangle
        nodes = pd.concat([hit["apex"], hit["u"], hit["v"]], ignore_index=True)
        vc = nodes.value_counts()
        return pd.DataFrame({"node": vc.index, "t": vc.to_numpy(dtype="int64")})

    # materialize: O(nodes·buckets) partial rows at most, and a
    # triangle-free graph (e.g. a star) yields ZERO rows and a
    # schema-less dataset the left join below cannot plan around
    partials = bucketed_group_map(
        wedges.map_batches(tag(0), batch_format="pandas").union(
            oriented.map_batches(tag(1), batch_format="pandas")
        ),
        ["u", "v"],
        credit_corners,
        num_buckets=num_buckets,
    ).materialize()
    if partials.count() == 0:
        return deg.map_batches(
            lambda df: df.assign(triangles=np.int64(0)), batch_format="pandas"
        )
    tri = bucketed_agg(
        partials, ["node"], value_col="t", how="sum", out_col="triangles",
        num_buckets=num_buckets,
    )
    return bucket_left_join(deg, tri, on=["node"], num_buckets=num_buckets).map_batches(
        zero_fill, batch_format="pandas"
    )


def triangle_count(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
) -> int:
    """Exact triangle count of the UNDIRECTED simple graph induced by
    the edge list (direction, loops and duplicate rows ignored), via
    the degree-ordered node-iterator (Schank & Wagner 2005; the
    standard MapReduce/Spark formulation):

    1. canonicalize + dedup edges (lo, hi) per hash bucket;
    2. per-node degrees (one bucketed count);
    3. orient every edge from its lexicographically smaller
       (degree, node) endpoint — out-degree is then O(sqrt(E)) for any
       node, so wedge volume is bounded by E^1.5 instead of sum(deg^2)
       (hub nodes generate NO wedges);
    4. wedges = per-source out-neighbor pairs (vectorized per-bucket
       self-merge), each unordered pair emitted once in oriented order;
    5. close: co-partitioned semi-join of wedges against the oriented
       edge set — surviving rows ARE the triangles, each counted
       exactly once (at its minimum-(deg,node) corner).

    Every exchange is a bucketed co-partition; no broadcast, no driver
    state beyond the final scalar."""
    from .relational import bucketed_group_map

    e0 = _canon_edges(edges, src_col, dst_col, num_buckets)
    oriented = _oriented_edges(e0, num_buckets)
    if oriented.count() == 0:
        return 0

    wedges = bucketed_group_map(
        oriented, ["u"], _wedge_fn(with_apex=False), num_buckets=num_buckets
    )

    # closing semi-join, inlined as one co-partitioned exchange: a
    # wedge-free graph (e.g. a star — every edge orients into the hub)
    # produces ZERO wedge blocks and an unknown schema, which the
    # generic bucket_semi_join cannot plan around; tagging both sides
    # explicitly sidesteps schema introspection and returns one count
    # row per bucket (O(num_buckets) driver rows)
    tag = lambda side: _tag_uv(side, with_apex=False)  # noqa: E731

    def count_closed(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["_side"] == 1][["u", "v"]].drop_duplicates()
        w = df[df["_side"] == 0][["u", "v"]]
        return pd.DataFrame({"n": [int(len(w.merge(e, on=["u", "v"])))]})

    counts = bucketed_group_map(
        wedges.map_batches(tag(0), batch_format="pandas").union(
            oriented.map_batches(tag(1), batch_format="pandas")
        ),
        ["u", "v"],
        count_closed,
        num_buckets=num_buckets,
    ).to_pandas()
    return int(counts["n"].sum())


# ---------------------------------------------------------------------------
# HITS hubs & authorities
# ---------------------------------------------------------------------------


@ray.remote
def _hits_init(ndir: str, b: int) -> "pd.DataFrame":
    p = _bucket_path(ndir, b)
    if not os.path.exists(p):
        return pd.DataFrame({"node": pd.Series([], dtype="object"), "val": []})
    nodes = pd.read_parquet(p)
    return pd.DataFrame({"node": nodes["node"], "val": np.ones(len(nodes))})


@ray.remote
def _hits_messages(edir: str, b: int, num_buckets: int, vals: pd.DataFrame,
                   direction: int):
    """Map phase for sender-bucket b: forward each sender's current
    score along its edges (multi-edge rows contribute once each),
    partial-summed by (dst_bucket, dst).  Returns B per-destination
    frames + the bucket's total forwarded mass (the normalizer is the
    global sum of these)."""
    p = _bucket_path(edir, b)
    empty = pd.DataFrame({"node": pd.Series([], dtype="object"), "c": []})
    if not os.path.exists(p):
        return [empty] * num_buckets + [0.0]
    e = pd.read_parquet(p)
    e = e[e["dir"] == direction]
    m = e.merge(vals.rename(columns={"node": "src", "val": "_v"}), on="src", how="inner")
    parts = m.groupby(["dst_bucket", "dst"], as_index=False)["_v"].sum()
    out = []
    grouped = dict(tuple(parts.groupby("dst_bucket")))
    for nb in range(num_buckets):
        g = grouped.get(nb)
        out.append(
            g.rename(columns={"dst": "node", "_v": "c"})[["node", "c"]]
            if g is not None
            else empty
        )
    return out + [float(parts["_v"].sum())]


@ray.remote
def _hits_reduce(
    ndir: str, b: int, total: float, iter_round: int, *parts
) -> "pd.DataFrame":
    p = _bucket_path(ndir, b)
    if not os.path.exists(p):
        return pd.DataFrame({"node": pd.Series([], dtype="object"), "val": []})
    nodes = pd.read_parquet(p)
    live = [x for x in parts if len(x)]
    allp = pd.concat(live, ignore_index=True) if live else None
    if allp is not None and len(allp):
        sums = allp.groupby("node", as_index=False)["c"].sum()
        s = nodes.merge(sums, on="node", how="left")["c"].fillna(0.0).to_numpy()
    else:
        s = np.zeros(len(nodes))
    denom = total if total != 0.0 else 1.0
    return pd.DataFrame(
        {"node": nodes["node"], "val": round_half_away(s / denom, iter_round)}
    )


@ray.remote
def _hits_merge(auth: pd.DataFrame, hub: pd.DataFrame) -> "pd.DataFrame":
    out = auth.rename(columns={"val": "authority"}).merge(
        hub.rename(columns={"val": "hub"}), on="node", how="outer"
    )
    return out[["node", "authority", "hub"]]


def hits(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    num_buckets: int = 32,
    iter_round: int = 9,
    work_dir: str | None = None,
) -> "ray.data.Dataset":
    """HITS (Kleinberg 1999) over a directed edge-list Dataset; returns
    (node, authority, hub).  Each iteration: authority(v) = sum of
    hub over in-edges, hub(u) = sum of authority over out-edges, each
    half-step L1-normalized (divide by the global forwarded mass) and
    rounded HALF-AWAY-FROM-ZERO to ``iter_round`` decimals — the same
    float-determinism policy as pagerank, so a SQL twin that rounds
    identically is bit-stable.  Multi-edge rows contribute once each.

    Execution: the same partition-once / message-exchange loop as
    pagerank (module docstring).  Both orientations are written in ONE
    bidirectional partitioning pass (each edge appears twice, keyed by
    its half-step sender and tagged with a direction flag), so the
    authority pass and the hub pass are each one bucket-to-bucket
    exchange over the same static sidecars.  Driver state:
    O(num_buckets) refs + one normalizer scalar per half-step."""
    edir, ndir = _partition_graph(
        edges, src_col, dst_col, num_buckets, work_dir, bidirectional=True
    )

    hub_refs = [_hits_init.remote(ndir, b) for b in range(num_buckets)]
    auth_refs = hub_refs

    def half_step(direction: int, refs: list) -> list:
        msg = [
            _hits_messages.options(num_returns=num_buckets + 1).remote(
                edir, b, num_buckets, refs[b], direction
            )
            for b in range(num_buckets)
        ]
        total = float(np.sum(ray.get([m[num_buckets] for m in msg])))
        return [
            _hits_reduce.remote(
                ndir, b, total, iter_round, *[msg[sb][b] for sb in range(num_buckets)]
            )
            for b in range(num_buckets)
        ]

    for _ in range(iterations):
        auth_refs = half_step(0, hub_refs)
        hub_refs = half_step(1, auth_refs)

    merged = [
        _hits_merge.remote(auth_refs[b], hub_refs[b]) for b in range(num_buckets)
    ]
    return ray.data.from_pandas_refs(merged)


# ---------------------------------------------------------------------------
# BFS distance layers
# ---------------------------------------------------------------------------

_BFS_INF = np.int64(1 << 62)


@ray.remote
def _bfs_init(ndir: str, b: int, sources: list) -> "pd.DataFrame":
    p = _bucket_path(ndir, b)
    if not os.path.exists(p):
        return pd.DataFrame({"node": pd.Series([], dtype="object"), "dist": []})
    nodes = pd.read_parquet(p)
    dist = np.where(nodes["node"].isin(sources), np.int64(0), _BFS_INF)
    return pd.DataFrame({"node": nodes["node"], "dist": dist.astype("int64")})


@ray.remote
def _bfs_messages(edir: str, b: int, num_buckets: int, dists: pd.DataFrame):
    p = _bucket_path(edir, b)
    empty = pd.DataFrame({"node": pd.Series([], dtype="object"), "m": []})
    if not os.path.exists(p):
        return [empty] * num_buckets
    e = pd.read_parquet(p)
    src = dists[dists["dist"] < _BFS_INF]
    m = e.merge(src.rename(columns={"node": "src", "dist": "m"}), on="src", how="inner")
    if not len(m):
        return [empty] * num_buckets
    m["m"] = m["m"] + 1
    parts = m.groupby(["dst_bucket", "dst"], as_index=False)["m"].min()
    out = []
    grouped = dict(tuple(parts.groupby("dst_bucket")))
    for nb in range(num_buckets):
        g = grouped.get(nb)
        out.append(
            g.rename(columns={"dst": "node"})[["node", "m"]] if g is not None else empty
        )
    return out


@ray.remote
def _bfs_reduce(b: int, prev: pd.DataFrame, *parts) -> "pd.DataFrame":
    live = [x for x in parts if len(x)]
    if not live:
        return prev
    mins = pd.concat(live, ignore_index=True).groupby("node", as_index=False)["m"].min()
    df = prev.merge(mins, on="node", how="left")
    df["dist"] = df[["dist", "m"]].min(axis=1).astype("int64")
    return df[["node", "dist"]]


def bfs_layers(
    edges: "ray.data.Dataset",
    sources: list,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 32,
    work_dir: str | None = None,
) -> "ray.data.Dataset":
    """Multi-source BFS over the DIRECTED edge list: (node, dist) with
    dist = length of the shortest path from any source, bounded by
    ``rounds`` (unreached nodes are dropped).  Same partition-once /
    message-exchange loop as connected_components — per round, each
    reached node forwards dist+1 along its out-edges and receivers take
    the min.  ``sources`` is a small explicit list (broadcast by value
    into the B init tasks, never corpus-sized)."""
    edir, ndir = _partition_graph(edges, src_col, dst_col, num_buckets, work_dir)
    dist_refs = [_bfs_init.remote(ndir, b, list(sources)) for b in range(num_buckets)]
    for _ in range(rounds):
        msg = [
            _bfs_messages.options(num_returns=num_buckets).remote(
                edir, b, num_buckets, dist_refs[b]
            )
            for b in range(num_buckets)
        ]
        dist_refs = [
            _bfs_reduce.remote(b, dist_refs[b], *[msg[sb][b] for sb in range(num_buckets)])
            for b in range(num_buckets)
        ]

    reached = ray.data.from_pandas_refs(dist_refs)
    return reached.map_batches(
        lambda df: df[df["dist"] < _BFS_INF], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# k-core decomposition (synchronous peel)
# ---------------------------------------------------------------------------


@ray.remote
def _kc_init(ndir: str, b: int) -> "pd.DataFrame":
    p = _bucket_path(ndir, b)
    if not os.path.exists(p):
        return pd.DataFrame(
            {"node": pd.Series([], dtype="object"), "alive": pd.Series([], dtype=bool)}
        )
    nodes = pd.read_parquet(p)
    return pd.DataFrame({"node": nodes["node"], "alive": True})


@ray.remote
def _kc_messages(edir: str, b: int, num_buckets: int, state: pd.DataFrame):
    """Map phase for sender-bucket b: every ALIVE sender contributes 1
    to each of its neighbours; partial-sum by (dst_bucket, dst)."""
    p = _bucket_path(edir, b)
    empty = pd.DataFrame(
        {"node": pd.Series([], dtype="object"), "m": pd.Series([], dtype="int64")}
    )
    if not os.path.exists(p):
        return [empty] * num_buckets
    e = pd.read_parquet(p)
    alive = state.loc[state["alive"], ["node"]].rename(columns={"node": "src"})
    m = e.merge(alive, on="src", how="inner")
    parts = (
        m.groupby(["dst_bucket", "dst"], as_index=False)
        .size()
        .rename(columns={"size": "m"})
    )
    out = []
    grouped = dict(tuple(parts.groupby("dst_bucket")))
    for nb in range(num_buckets):
        g = grouped.get(nb)
        out.append(
            g.rename(columns={"dst": "node"})[["node", "m"]] if g is not None else empty
        )
    return out


@ray.remote
def _kc_reduce(k: int, prev: pd.DataFrame, *parts) -> "pd.DataFrame":
    if not len(prev):
        return prev
    live = [x for x in parts if len(x)]
    if live:
        allp = pd.concat(live, ignore_index=True)
        deg = allp.groupby("node", as_index=False)["m"].sum()
        df = prev.merge(deg, on="node", how="left")
        df["m"] = df["m"].fillna(0)
    else:
        df = prev.copy()
        df["m"] = 0
    df["alive"] = df["alive"] & (df["m"] >= k)
    return df[["node", "alive"]]


def kcore(
    edges: "ray.data.Dataset",
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 12,
    num_buckets: int = 32,
    work_dir: str | None = None,
) -> "ray.data.Dataset":
    """k-core membership by SYNCHRONOUS iterative peeling: each round,
    every alive node counts its alive neighbours in the SIMPLE
    undirected graph (distinct min/max pairs, self-loops dropped) and
    dies if the count is < k.  After ``rounds`` synchronous rounds the
    survivors are returned as (node) rows — exactly reproducible by an
    unrolled-SQL twin because both engines peel the same fixed number
    of rounds (extra rounds past convergence are no-ops).

    Same partition-once / message-exchange shape as
    connected_components: edge sidecars written once, O(k)-free driver
    state (only num_buckets object refs).

    NOTE: a graph that peels to nothing returns an EMPTY Dataset, and
    Ray 2.49 drops pandas-block schema on fully-empty datasets —
    ``to_pandas()`` then has no columns; check ``len()`` first."""
    from .relational import bucketed_group_map

    def canon(t: pa.Table) -> pd.DataFrame:
        s = t[src_col].to_numpy(zero_copy_only=False)
        d = t[dst_col].to_numpy(zero_copy_only=False)
        u, v = np.minimum(s, d), np.maximum(s, d)
        keep = u != v
        return pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()

    simple = bucketed_group_map(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        lambda df: df.drop_duplicates(),
        num_buckets=num_buckets,
        batch_partial=lambda df: df.drop_duplicates(),
    )
    edir, ndir = _partition_graph(
        simple, "u", "v", num_buckets, work_dir, symmetric=True
    )
    state = [_kc_init.remote(ndir, b) for b in range(num_buckets)]
    for _ in range(rounds):
        msg = [
            _kc_messages.options(num_returns=num_buckets).remote(
                edir, b, num_buckets, state[b]
            )
            for b in range(num_buckets)
        ]
        state = [
            _kc_reduce.remote(k, state[b], *[msg[sb][b] for sb in range(num_buckets)])
            for b in range(num_buckets)
        ]
    members = ray.data.from_pandas_refs(state)
    return members.map_batches(
        lambda df: df.loc[df["alive"], ["node"]], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# label propagation (synchronous LPA community detection)
# ---------------------------------------------------------------------------


@ray.remote
def _lp_init(ndir: str, b: int) -> "pd.DataFrame":
    p = _bucket_path(ndir, b)
    if not os.path.exists(p):
        return pd.DataFrame({"node": pd.Series([], dtype="object")}).assign(label=None)
    nodes = pd.read_parquet(p)
    return pd.DataFrame({"node": nodes["node"], "label": nodes["node"]})


@ray.remote
def _lp_messages(edir: str, b: int, num_buckets: int, labels: pd.DataFrame):
    """Map phase for sender-bucket b: each sender forwards its current
    label to every neighbour; PARTIAL VOTE COUNTS by (dst_bucket, dst,
    label) — the combiner that keeps the exchange O(nodes × distinct
    neighbour labels), never O(edges)."""
    p = _bucket_path(edir, b)
    empty = pd.DataFrame(
        {
            "node": pd.Series([], dtype="object"),
            "m": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
        }
    )
    if not os.path.exists(p):
        return [empty] * num_buckets
    e = pd.read_parquet(p)
    m = e.merge(labels.rename(columns={"node": "src", "label": "m"}), on="src", how="inner")
    parts = (
        m.groupby(["dst_bucket", "dst", "m"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    out = []
    grouped = dict(tuple(parts.groupby("dst_bucket")))
    for nb in range(num_buckets):
        g = grouped.get(nb)
        out.append(
            g.rename(columns={"dst": "node"})[["node", "m", "n"]]
            if g is not None
            else empty
        )
    return out


@ray.remote
def _lp_reduce(prev: pd.DataFrame, *parts) -> "pd.DataFrame":
    """Reduce phase for one node bucket: sum the partial vote counts,
    take the most frequent neighbour label per node (tie → smallest
    label — the deterministic synchronous-LPA update), keep the
    previous label for nodes that received no votes."""
    if not len(prev):
        return prev
    live = [x for x in parts if len(x)]
    if not live:
        return prev
    allp = pd.concat(live, ignore_index=True)
    votes = allp.groupby(["node", "m"], as_index=False)["n"].sum()
    win = votes.sort_values(
        ["node", "n", "m"], ascending=[True, False, True], kind="mergesort"
    ).drop_duplicates("node")
    out = prev.merge(win[["node", "m"]], on="node", how="left")
    upd = out["m"].notna()
    lab = out["label"].where(~upd, out["m"])
    if pd.api.types.is_integer_dtype(prev["label"].dtype):
        lab = lab.astype(prev["label"].dtype)
    return pd.DataFrame({"node": out["node"], "label": lab})


def label_propagation(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 3,
    num_buckets: int = 32,
    work_dir: str | None = None,
) -> "ray.data.Dataset":
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, deterministic variant) over the SIMPLE undirected graph
    (loops dropped, multi-edges collapsed so every neighbour votes
    once); returns (node, label) after ``rounds`` synchronous updates:

    label_0(x)   = x
    label_k+1(x) = argmax over neighbour-label vote counts of
                   label_k(peers), ties → smallest label; a node with
                   no neighbours keeps its label.

    Same partition-once / message-exchange loop as pagerank /
    connected_components (module docstring): edges and nodes are
    bucket-affine Parquet sidecars written once, each round exchanges
    only PARTIAL VOTE COUNTS (combined per sender bucket), and the
    driver holds O(num_buckets) object refs — no driver-side graph.
    Unlike connected_components' min-fold, the vote histogram is not
    idempotent, so the reduce must see the previous labels (passed as
    the bucket's ref, zero extra IO)."""
    from .relational import bucketed_group_map

    def canon(t: pa.Table) -> pd.DataFrame:
        s = t[src_col].to_numpy(zero_copy_only=False)
        d = t[dst_col].to_numpy(zero_copy_only=False)
        u, v = np.minimum(s, d), np.maximum(s, d)
        keep = u != v
        return pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()

    simple = bucketed_group_map(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        lambda df: df.drop_duplicates(),
        num_buckets=num_buckets,
        batch_partial=lambda df: df.drop_duplicates(),
    )
    edir, ndir = _partition_graph(
        simple, "u", "v", num_buckets, work_dir, symmetric=True
    )
    label_refs = [_lp_init.remote(ndir, b) for b in range(num_buckets)]
    for _ in range(rounds):
        msg = [
            _lp_messages.options(num_returns=num_buckets).remote(
                edir, b, num_buckets, label_refs[b]
            )
            for b in range(num_buckets)
        ]
        label_refs = [
            _lp_reduce.remote(label_refs[b], *[msg[sb][b] for sb in range(num_buckets)])
            for b in range(num_buckets)
        ]
    return ray.data.from_pandas_refs(label_refs)
