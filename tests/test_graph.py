"""PageRank operator tests: exact agreement with a local numpy power
iteration that mirrors the engine's semantics (multi-edges, uniform
dangling-mass redistribution, per-iteration half-away rounding)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from web_graph_ray.functions.numeric import round_half_away
from web_graph_ray.stages.graph import pagerank


def reference_pagerank(edges, damping=0.85, iterations=3, iter_round=9):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(n, round_half_away([1.0 / n], iter_round)[0])
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / deg[idx[s]]
        dm = (r.sum() - contrib.sum()) / n
        r = round_half_away((1 - damping) / n + damping * (contrib + dm), iter_round)
    return pd.DataFrame({"node": nodes, "rank": r})


GRAPHS = {
    # chain with a dangling tail: c has no out-edges
    "dangling_chain": [(1, 2), (2, 3), (3, 4), (4, 3)],
    # multi-edge: a→b twice counts twice in degree and contribution
    "multi_edge": [(1, 2), (1, 2), (1, 3), (3, 1)],
    # disconnected components + self loop
    "components": [(1, 2), (2, 1), (5, 5), (7, 8)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_matches_reference(name, ray_session):
    edges = GRAPHS[name]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    got = (
        pagerank(ds, iterations=4, num_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = reference_pagerank(edges, iterations=4).astype({"node": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_pagerank_mass_conserved(ray_session):
    edges = GRAPHS["dangling_chain"]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    out = pagerank(ds, iterations=5, num_buckets=4).to_pandas()
    assert abs(out["rank"].sum() - 1.0) < 1e-6


def test_pagerank_string_nodes(ray_session):
    """Node ids need only be hashable/groupable — the crawl's page-id
    (sha1 hex) graph uses string nodes."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b")]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = (
        pagerank(ds, iterations=3, num_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = reference_pagerank(edges, iterations=3)
    pd.testing.assert_frame_equal(got, want)


class TestIvfAnn:
    def test_ivf_recall_vs_exact(self, ray_session):
        """IVF with nprobe=nlist is exhaustive (== exact top-k); with
        fewer probes it keeps reasonable recall on clustered data."""
        import ray.data
        from web_graph_ray.stages.ann import cosine_topk, ivf_cosine_topk

        rng = np.random.Generator(np.random.PCG64(7))
        centers = rng.standard_normal((8, 16)) * 4
        vecs = np.concatenate(
            [centers[i % 8] + rng.standard_normal(16) * 0.3 for i in range(400)]
        ).reshape(400, 16)
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(400, dtype=np.int64), "embedding": list(vecs)}
            )
        ).repartition(4)
        q = vecs[:3]

        exact = cosine_topk(ds, q, k=10)
        full = ivf_cosine_topk(ds, q, k=10, nlist=8, nprobe=8)
        pd.testing.assert_frame_equal(
            exact.reset_index(drop=True), full.reset_index(drop=True)
        )

        part = ivf_cosine_topk(ds, q, k=10, nlist=8, nprobe=2)
        hits = len(
            set(map(tuple, part[["query_id", "vec_id"]].values))
            & set(map(tuple, exact[["query_id", "vec_id"]].values))
        )
        assert hits >= 20  # ≥2/3 recall on well-clustered data


class TestConnectedComponents:
    def test_cc_matches_local_union(self, ray_session):
        import ray.data
        from web_graph_ray.stages.graph import connected_components

        edges = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 20), (30, 31), (31, 32), (32, 33)]
        ds = ray.data.from_pandas(
            pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
        )
        got = (
            connected_components(ds, rounds=5, num_buckets=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

        # local exact components via iterative closure
        import itertools

        nodes = sorted({n for e in edges for n in e})
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = pd.DataFrame(
            {"node": nodes, "label": [find(n) for n in nodes]}
        ).astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_cc_string_nodes(self, ray_session):
        import ray.data
        from web_graph_ray.stages.graph import connected_components

        ds = ray.data.from_pandas(
            pd.DataFrame([("b", "c"), ("a", "b"), ("x", "y")], columns=["src", "dst"])
        )
        got = connected_components(ds, rounds=4, num_buckets=2).to_pandas()
        labels = dict(zip(got["node"], got["label"]))
        assert labels == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


class TestTrianglesAndDegrees:
    def _edges(self, pairs):
        return ray.data.from_pandas(
            pd.DataFrame(pairs, columns=["src", "dst"])
        ).repartition(4)

    def test_known_small_graph(self, ray_session):
        from web_graph_ray.stages.graph import triangle_count

        # K4 on {0,1,2,3} (4 triangles) + a pendant edge + a dup + a loop
        pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        pairs += [(3, 9), (1, 0), (2, 2)]
        assert triangle_count(self._edges(pairs)) == 4

    def test_direction_and_multiplicity_ignored(self, ray_session):
        from web_graph_ray.stages.graph import triangle_count

        assert triangle_count(self._edges([(0, 1), (1, 2), (2, 0)])) == 1
        assert (
            triangle_count(self._edges([(1, 0), (1, 2), (0, 2), (2, 0), (2, 0)]))
            == 1
        )

    def test_triangle_free(self, ray_session):
        from web_graph_ray.stages.graph import triangle_count

        # star graph: no triangles
        assert triangle_count(self._edges([(0, i) for i in range(1, 8)])) == 0

    def test_random_graph_vs_local(self, ray_session):
        from web_graph_ray.stages.graph import triangle_count

        rng = np.random.RandomState(7)
        n, m = 60, 400
        pairs = list({(int(a), int(b)) for a, b in rng.randint(0, n, (m, 2)) if a != b})
        # local oracle: adjacency-matrix trace
        adj = np.zeros((n, n), dtype=np.int64)
        for a, b in pairs:
            adj[a, b] = adj[b, a] = 1
        expected = int(np.trace(adj @ adj @ adj) // 6)
        assert triangle_count(self._edges(pairs)) == expected

    def test_degrees_match_pandas(self, ray_session):
        from web_graph_ray.stages.graph import degrees

        rng = np.random.RandomState(3)
        df = pd.DataFrame(rng.randint(0, 20, (300, 2)), columns=["src", "dst"])
        got = (
            degrees(ray.data.from_pandas(df).repartition(4))
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        out = df.groupby("src").size()
        inn = df.groupby("dst").size()
        nodes = sorted(set(df.src) | set(df.dst))
        exp = pd.DataFrame(
            {
                "node": nodes,
                "out_deg": [int(out.get(v, 0)) for v in nodes],
                "in_deg": [int(inn.get(v, 0)) for v in nodes],
            }
        )
        exp["deg"] = exp.out_deg + exp.in_deg
        assert got.astype("int64").equals(exp.astype("int64"))


class TestHits:
    def test_matches_local_reference(self, ray_session):
        from web_graph_ray.functions.numeric import round_half_away
        from web_graph_ray.stages.graph import hits

        rng = np.random.RandomState(11)
        df = pd.DataFrame(rng.randint(0, 30, (200, 2)), columns=["src", "dst"])
        got = (
            hits(ray.data.from_pandas(df).repartition(4), iterations=2)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        nodes = sorted(set(df.src) | set(df.dst))
        idx = {v: i for i, v in enumerate(nodes)}
        h = np.ones(len(nodes))
        a = None
        for _ in range(2):
            raw_a = np.zeros(len(nodes))
            for s, d in df.values:
                raw_a[idx[d]] += h[idx[s]]
            a = round_half_away(raw_a / raw_a.sum(), 9)
            raw_h = np.zeros(len(nodes))
            for s, d in df.values:
                raw_h[idx[s]] += a[idx[d]]
            h = round_half_away(raw_h / raw_h.sum(), 9)
        exp = pd.DataFrame({"node": nodes, "authority": a, "hub": h})
        m = got.merge(exp, on="node", suffixes=("_g", "_e"))
        assert len(m) == len(nodes)
        assert (m.authority_g == m.authority_e).all()
        assert (m.hub_g == m.hub_e).all()

    def test_pure_hub_and_authority(self, ray_session):
        from web_graph_ray.stages.graph import hits

        # 0 -> {1,2,3}: node 0 is a pure hub, 1-3 pure authorities
        df = pd.DataFrame({"src": [0, 0, 0], "dst": [1, 2, 3]})
        out = (
            hits(ray.data.from_pandas(df), iterations=2)
            .to_pandas()
            .set_index("node")
        )
        assert out.loc[0, "authority"] == 0.0 and out.loc[0, "hub"] == 1.0
        for v in (1, 2, 3):
            assert abs(out.loc[v, "authority"] - 1 / 3) < 1e-6
            assert out.loc[v, "hub"] == 0.0


class TestKmeans:
    def _blobs(self, n_per=40, k=3, dim=16, seed=5):
        rng = np.random.RandomState(seed)
        centers = rng.randn(k, dim) * 5
        vecs, true = [], []
        for c in range(k):
            vecs.append(centers[c] + rng.randn(n_per, dim) * 0.1)
            true.extend([c] * n_per)
        m = np.vstack(vecs)
        df = pd.DataFrame(
            {"vec_id": np.arange(len(m)), "embedding": list(m.astype(np.float32))}
        )
        return df, np.array(true)

    def test_separable_blobs_recovered(self, ray_session):
        """With one init centroid per orthogonal blob (membership laid
        out against the deterministic hash-sample order), Lloyd must
        recover the blobs exactly — cosine separation is total."""
        from web_graph_ray.stages.ann import kmeans
        from web_graph_ray.stages.sketch import fnv1a64

        n, k, dim = 120, 3, 16
        ids = np.arange(n)
        order = np.lexsort((ids, fnv1a64(list(ids))))
        true = np.full(n, -1)
        true[order[:k]] = np.arange(k)  # init picks: one per blob
        true[order[k:]] = np.arange(n - k) % k
        rng = np.random.RandomState(5)
        dirs = np.eye(dim)[:k] * 5
        m = dirs[true] + rng.randn(n, dim) * 0.05
        df = pd.DataFrame(
            {"vec_id": ids, "embedding": list(m.astype(np.float32))}
        )
        cents, assign = kmeans(
            ray.data.from_pandas(df).repartition(4), k=k, iterations=3
        )
        got = assign.to_pandas().sort_values("vec_id")["cell"].to_numpy()
        for c in range(k):
            labels = got[true == c]
            assert (labels == labels[0]).all()
        assert len(set(got)) == k
        assert cents.shape == (k, dim)

    def test_parallelism_invariance(self, ray_session):
        from web_graph_ray.stages.ann import kmeans

        df, _ = self._blobs(n_per=30, k=4, seed=9)
        outs = []
        for parts in (1, 8):
            ds = ray.data.from_pandas(df).repartition(parts)
            cents, assign = kmeans(ds, k=4, iterations=2)
            outs.append(
                (
                    cents.copy(),
                    assign.to_pandas().sort_values("vec_id").reset_index(drop=True),
                )
            )
        assert np.array_equal(outs[0][0], outs[1][0])
        assert outs[0][1].equals(outs[1][1])


class TestBfsLayers:
    def test_chain_and_unreachable(self, ray_session):
        from web_graph_ray.stages.graph import bfs_layers

        # 0->1->2->3->4, plus island 9->10
        df = pd.DataFrame(
            {"src": [0, 1, 2, 3, 9], "dst": [1, 2, 3, 4, 10]}
        )
        out = (
            bfs_layers(ray.data.from_pandas(df).repartition(4), [0], rounds=3)
            .to_pandas()
            .set_index("node")["dist"]
            .to_dict()
        )
        # depth bounded at 3; node 4 unreached, island unreached
        assert out == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_multi_source_min(self, ray_session):
        from web_graph_ray.stages.graph import bfs_layers

        df = pd.DataFrame({"src": [0, 1, 5], "dst": [1, 2, 2]})
        out = (
            bfs_layers(ray.data.from_pandas(df), [0, 5], rounds=3)
            .to_pandas()
            .set_index("node")["dist"]
            .to_dict()
        )
        assert out == {0: 0, 5: 0, 1: 1, 2: 1}  # 2 via source 5, not via 0->1->2


class TestClusteringCoefficients:
    def _edges(self, pairs):
        return ray.data.from_pandas(
            pd.DataFrame(pairs, columns=["src", "dst"])
        ).repartition(4)

    def test_random_graph_vs_local(self, ray_session):
        from web_graph_ray.stages.graph import clustering_coefficients

        rng = np.random.RandomState(11)
        n, m = 50, 350
        pairs = list({(int(a), int(b)) for a, b in rng.randint(0, n, (m, 2)) if a != b})
        adj = np.zeros((n, n), dtype=np.int64)
        for a, b in pairs:
            adj[a, b] = adj[b, a] = 1
        # local oracle: per-node triangles = diag(A^3)/2, degree = row sum
        tri_local = np.diag(adj @ adj @ adj) // 2
        deg_local = adj.sum(axis=1)

        got = (
            clustering_coefficients(self._edges(pairs))
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        present = np.flatnonzero(deg_local > 0)
        assert got["node"].to_numpy().tolist() == present.tolist()
        assert got["deg"].to_numpy().tolist() == deg_local[present].tolist()
        assert got["triangles"].to_numpy().tolist() == tri_local[present].tolist()
        # total credit = 3 * global triangle count
        assert got["triangles"].sum() == 3 * int(np.trace(adj @ adj @ adj) // 6)

    def test_triangle_free_graph_all_zero(self, ray_session):
        from web_graph_ray.stages.graph import clustering_coefficients

        # star: every edge orients into the hub -> zero wedges
        got = clustering_coefficients(
            self._edges([(0, i) for i in range(1, 8)])
        ).to_pandas()
        assert (got["triangles"] == 0).all()
        assert len(got) == 8


class TestInterpQuantile:
    def test_matches_numpy_and_duckdb(self, ray_session):
        import duckdb

        from web_graph_ray.stages.relational import interp_quantile

        rng = np.random.RandomState(5)
        vals = np.round(rng.uniform(0, 1000, 3001), 2)
        ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(5)
        for q in [0.0, 0.25, 0.5, 0.613, 0.75, 1.0]:
            got = interp_quantile(ds, "v", q, max_driver_rows=200)
            exp_np = float(np.quantile(vals, q))  # linear interpolation
            exp_dd = duckdb.sql(
                f"select quantile_cont(v, {q}) from (select unnest($v) v)",
                params={"v": vals.tolist()},
            ).fetchone()[0]
            assert abs(got - exp_np) < 1e-9, (q, got, exp_np)
            assert abs(got - exp_dd) < 1e-9, (q, got, exp_dd)


class TestJlProject:
    def test_distance_preservation_and_determinism(self, ray_session):
        """JL with a ±1 sign matrix: (1) deterministic across block
        layouts; (2) pairwise squared distances are preserved in
        expectation — check the empirical distortion of random pairs
        stays within the loose JL band for k=16; (3) the sign grid is
        process-stable (pure function of (dim, out_dim))."""
        import numpy as np
        import pandas as pd

        from web_graph_ray.stages.ann import jl_project, jl_signs

        rng = np.random.default_rng(5)
        n, d, k = 200, 64, 16
        X = rng.normal(size=(n, d)).astype(np.float32)
        df = pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)}
        )

        got1 = (
            jl_project(ray.data.from_pandas(df).repartition(1),
                       out_dim=k, round_to=None)
            .to_pandas().sort_values(["vec_id", "dim"]).reset_index(drop=True)
        )
        got8 = (
            jl_project(ray.data.from_pandas(df).repartition(8),
                       out_dim=k, round_to=None)
            .to_pandas().sort_values(["vec_id", "dim"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got1, got8)

        Y = got1["value"].to_numpy().reshape(n, k)
        pairs = rng.integers(0, n, size=(300, 2))
        pairs = pairs[pairs[:, 0] != pairs[:, 1]]
        dx = np.linalg.norm(X[pairs[:, 0]].astype(np.float64)
                            - X[pairs[:, 1]].astype(np.float64), axis=1)
        dy = np.linalg.norm(Y[pairs[:, 0]] - Y[pairs[:, 1]], axis=1)
        ratio = (dy / dx) ** 2
        # E[ratio]=1; spread shrinks with k — loose sanity band
        assert 0.85 < ratio.mean() < 1.15
        assert (ratio > 0.2).all() and (ratio < 3.0).all()

        s = jl_signs(d, k)
        assert s.shape == (d, k) and set(np.unique(s)) == {-1, 1}
        assert (jl_signs(d, k) == s).all()  # stable regeneration
        assert abs(s.mean()) < 0.15  # balanced ±1


def test_jl_project_empty_block(ray_session):
    """A filter-drained block must not crash the projection (an empty
    variable-list column flattens to shape (0,), which would matmul
    into phantom values)."""
    import numpy as np
    import pandas as pd

    from web_graph_ray.stages.ann import jl_project

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(6, dtype=np.int64),
            "embedding": list(rng.normal(size=(6, 16)).astype(np.float32)),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6).filter(
        lambda r: r["vec_id"] % 3 == 0
    )
    out = jl_project(ds, out_dim=4).to_pandas()
    assert sorted(out["vec_id"].unique()) == [0, 3]
    assert len(out) == 2 * 4
