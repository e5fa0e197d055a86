"""Graph analytics over edge-list Datasets (PageRank and helpers).

The reference stores a web graph (pages + links,
/root/reference/pkg/linkstorage/linkstorage.go:23-66) but offers only
point lookups over it — no whole-graph analytics.  PageRank is the
canonical query such a store exists to answer, so the engine adds it as
a first-class distributed operator over any (src, dst) edge Dataset —
including the crawl's own host graph.

Distributed formulation (the classic Spark/Pregel shape, expressed in
this repo's bucketed co-partition primitives):

- out-degrees: ``bucketed_agg(edges, [src], count)`` — partial-combine,
  one small shuffle.
- one up-front ``bucket_hash_join(edges, deg)`` so the per-iteration
  join carries the degree along instead of re-joining it every round.
- per iteration: ``bucket_hash_join(edges_deg, ranks)`` on src →
  contributions (rank/odeg per out-edge) → ``bucketed_agg`` sum by dst
  → new rank.  Nodes with no in-edges keep the base term via a
  zero-contribution union (no left join needed).
- dangling mass (nodes with no out-edges) is redistributed uniformly:
  dm = sum(prev ranks) − sum(contributions); both are single-scalar
  ``Dataset.sum`` reductions, O(1) driver state.

Each iteration materializes only node-sized ranks plus one edge-sized
contribution pass — the same per-iteration cost profile as Spark's
PageRank; there is no driver-side collection of nodes or edges at any
count.  Partitioning assumption: none beyond hashability of the node
id column (hash co-partitioning is done inside the bucket primitives).

Determinism / SQL-twin policy: ranks are rounded HALF-AWAY-FROM-ZERO
to ``iter_round`` decimals after EVERY iteration (initial rank
included), in both the engine and the DuckDB oracle, so float
summation-order differences (~1e-16) can never accumulate across
iterations or flip the final 6-dp comparison.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.numeric import round_half_away
from .relational import bucket_hash_join, bucketed_agg, bucketed_group_map, _as_arrow

__all__ = ["pagerank"]


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


def pagerank(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    num_buckets: int = 32,
    iter_round: int = 9,
) -> "ray.data.Dataset":
    """PageRank over an edge-list Dataset; returns (node, rank).

    Duplicate edge rows are multi-edges (they count in the out-degree
    and contribute once each — matching a SQL twin that aggregates per
    edge row).  Dangling-node mass is redistributed uniformly each
    iteration, so total rank stays ≈1 (exactly 1 up to the per-
    iteration rounding).
    """
    edges = _as_arrow(edges)

    nodes = distinct_nodes(edges, src_col, dst_col, num_buckets).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: pa.table({"node": t["node"], "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow",
        )

    deg = bucketed_agg(edges, [src_col], how="count", out_col="_odeg",
                       num_buckets=num_buckets)
    edges_deg = bucket_hash_join(
        edges.select_columns([src_col, dst_col]), deg, [src_col],
        num_buckets=num_buckets,
    ).materialize()

    r0 = float(round_half_away([1.0 / n], iter_round)[0])
    ranks = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array([r0] * t.num_rows, pa.float64())),
        batch_format="pyarrow",
    ).materialize()
    zeros = nodes.map_batches(
        lambda t: t.append_column("_contrib", pa.array([0.0] * t.num_rows, pa.float64())),
        batch_format="pyarrow",
    ).materialize()

    base = (1.0 - damping) / n
    for _ in range(iterations):
        prev_total = ranks.sum("rank")

        as_src = ranks.map_batches(
            lambda t: pa.table(
                {src_col: t["node"].combine_chunks(), "_srank": t["rank"].combine_chunks()}
            ),
            batch_format="pyarrow",
        )
        contribs = (
            bucket_hash_join(edges_deg, as_src, [src_col], num_buckets=num_buckets)
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t[dst_col].combine_chunks(),
                        "_contrib": pa.compute.divide(
                            t["_srank"].combine_chunks().cast(pa.float64()),
                            t["_odeg"].combine_chunks().cast(pa.float64()),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        contrib_total = contribs.sum("_contrib") or 0.0
        dm = (prev_total - contrib_total) / n  # dangling mass, spread uniformly

        sums = bucketed_agg(
            contribs.union(zeros), ["node"], "_contrib", how="sum",
            out_col="_sum", num_buckets=num_buckets,
        )

        def finish(df: pd.DataFrame, _dm=dm) -> pd.DataFrame:
            rank = base + damping * (df["_sum"].to_numpy() + _dm)
            return pd.DataFrame(
                {"node": df["node"], "rank": round_half_away(rank, iter_round)}
            )

        ranks = sums.map_batches(finish, batch_format="pandas").materialize()

    return ranks
