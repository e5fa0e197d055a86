"""k-core and melt operator tests: exact agreement with a local
reference peel / pandas melt on small adversarial graphs and frames."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from web_graph_ray.stages.graph import kcore
from web_graph_ray.stages.relational import melt


def reference_kcore(edges, k, rounds):
    """Synchronous peel on the SIMPLE undirected graph (dedup, no
    self-loops) — the semantics kcore() promises."""
    simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for u, v in simple:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    for _ in range(rounds):
        alive = {n for n in alive if len(adj[n] & alive) >= k}
    return sorted(alive)


GRAPHS = {
    # triangle + pendant: 2-core is the triangle, pendant peels off
    "triangle_pendant": ([(1, 2), (2, 3), (3, 1), (3, 4)], 2),
    # chain: 2-core empty (cascade: endpoints peel, then everything)
    "chain_cascade": ([(1, 2), (2, 3), (3, 4), (4, 5)], 2),
    # K4 with a 2-path bridge to a second triangle: 3-core = K4 only
    "k4_bridge": (
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (6, 7), (7, 8), (8, 6)],
        3,
    ),
    # multi-edges and self-loops must NOT inflate degree
    "multi_self": ([(1, 2), (1, 2), (2, 1), (1, 1), (2, 3), (3, 1)], 2),
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_kcore_matches_reference(name, ray_session):
    edges, k = GRAPHS[name]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    out = kcore(ds, k=k, rounds=8, num_buckets=4).to_pandas()
    # Ray drops pandas-block schema on fully-empty datasets — a peeled-
    # to-nothing core comes back as a 0-column frame
    got = sorted(out["node"]) if "node" in out.columns else []
    assert got == reference_kcore(edges, k, rounds=8)


def test_kcore_fixed_rounds_midpeel(ray_session):
    """Short of convergence, the result must equal EXACTLY r synchronous
    rounds (the SQL-twin contract), not the fixed point."""
    edges, k = GRAPHS["chain_cascade"]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    got = sorted(kcore(ds, k=k, rounds=1, num_buckets=4).to_pandas()["node"])
    assert got == reference_kcore(edges, k, rounds=1) == [2, 3, 4]


def test_melt_matches_pandas(ray_session):
    df = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "grp": ["a", "b", "a"],
            "x": [1.5, 2.5, 3.5],
            "y": [10.0, 20.0, 30.0],
        }
    )
    got = (
        melt(
            ray.data.from_pandas(df),
            id_cols=["id", "grp"],
            value_cols=["x", "y"],
            var_col="metric",
            val_col="value",
        )
        .to_pandas()
        .sort_values(["id", "metric"])
        .reset_index(drop=True)
    )
    want = (
        df.melt(
            id_vars=["id", "grp"],
            value_vars=["x", "y"],
            var_name="metric",
            value_name="value",
        )
        .sort_values(["id", "metric"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_melt_int_values_upcast(ray_session):
    """Mixed int/float value columns melt into ONE float64 value column
    (measure dtypes can't share a column otherwise)."""
    df = pd.DataFrame({"id": [1], "a": [2], "b": [3.5]})
    out = melt(
        ray.data.from_pandas(df), id_cols=["id"], value_cols=["a", "b"]
    ).to_pandas()
    assert out["value"].dtype == np.float64
    assert sorted(out["value"]) == [2.0, 3.5]


def test_melt_preserves_big_int64_and_strings(ray_session):
    """All-int64 value columns stay int64 (a float64 force-cast would
    silently corrupt ids above 2^53); string value columns melt as
    objects instead of raising."""
    big = 9007199254740993  # 2^53 + 1: not representable in float64
    df = pd.DataFrame({"id": [1], "a": [big], "b": [7]})
    out = melt(
        ray.data.from_pandas(df), id_cols=["id"], value_cols=["a", "b"]
    ).to_pandas()
    assert out["value"].dtype == np.int64
    assert sorted(out["value"]) == [7, big]

    sdf = pd.DataFrame({"id": [1, 2], "u": ["x", "y"], "v": ["p", "q"]})
    sout = melt(
        ray.data.from_pandas(sdf), id_cols=["id"], value_cols=["u", "v"]
    ).to_pandas()
    assert sorted(sout["value"]) == ["p", "q", "x", "y"]
