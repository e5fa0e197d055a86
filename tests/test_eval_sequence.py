"""Unit tests for the model-eval / sequence block: roc_auc
(stages/eval.py), keyed_ewma (stages/relational.py), and the
power-iteration PCA entry — each against a literal local reference and
under parallelism invariance (repartition(1) vs (8))."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data


def _auc_reference(score: np.ndarray, y: np.ndarray) -> float:
    """Rank-based Mann-Whitney AUC with average-rank ties (the scipy
    formulation, re-derived locally)."""
    order = np.argsort(score, kind="mergesort")
    s, ys = score[order], y[order]
    ranks = np.empty(len(s), dtype="float64")
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = 0.5 * (i + 1 + j)  # average rank of the tie run
        i = j
    n_pos = int(ys.sum())
    n_neg = len(ys) - n_pos
    u = ranks[ys == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


class TestRocAuc:
    def test_matches_rank_reference_with_ties(self, ray_session):
        from web_graph_ray.stages.eval import roc_auc

        rng = np.random.default_rng(7)
        # quantized scores force tie runs; positives score higher on average
        y = (rng.random(4000) < 0.3).astype("int64")
        score = np.round(rng.normal(size=4000) + 0.8 * y, 1)
        df = pd.DataFrame({"s": score, "y": y})
        out = roc_auc(ray.data.from_pandas(df).repartition(8), "s", "y")
        assert int(out["n_pos"][0]) == int(y.sum())
        assert int(out["n_neg"][0]) == int(len(y) - y.sum())
        assert out["auc"][0] == pytest.approx(
            _auc_reference(score, y), abs=5e-7
        )

    def test_parallelism_invariance(self, ray_session):
        from web_graph_ray.stages.eval import roc_auc

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "s": np.round(rng.random(1000), 2),
                "y": (rng.random(1000) < 0.5).astype("int64"),
            }
        )
        a = roc_auc(ray.data.from_pandas(df).repartition(1), "s", "y")
        b = roc_auc(ray.data.from_pandas(df).repartition(8), "s", "y")
        assert a["auc"][0] == b["auc"][0]

    def test_perfect_and_random_separation(self, ray_session):
        from web_graph_ray.stages.eval import roc_auc

        # perfectly separated: every positive above every negative
        df = pd.DataFrame(
            {"s": np.arange(100, dtype="float64"), "y": (np.arange(100) >= 50).astype("int64")}
        )
        out = roc_auc(ray.data.from_pandas(df).repartition(4), "s", "y")
        assert out["auc"][0] == 1.0
        # constant score: AUC is exactly 1/2 from the tie half-credit
        df2 = df.assign(s=1.0)
        out2 = roc_auc(ray.data.from_pandas(df2).repartition(4), "s", "y")
        assert out2["auc"][0] == 0.5


def test_bucketed_agg_merges_negative_zero_keys(ray_session):
    """-0.0 and +0.0 are one group key (pandas and SQL both merge
    them) but hash to different buckets by bit pattern — the split key
    produced duplicate per-score rows in roc_auc until add_bucket
    normalized float keys."""
    from web_graph_ray.stages.relational import bucketed_agg

    df = pd.DataFrame({"s": [-0.0, 0.0, -0.0, 1.0], "v": [1, 2, 3, 4]})
    out = (
        bucketed_agg(
            ray.data.from_pandas(df).repartition(4), ["s"],
            value_col="v", how="sum", out_col="sv",
        )
        .to_pandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.loc[0, "sv"] == 6 and not np.signbit(out.loc[0, "s"])


class TestKeyedEwma:
    def test_matches_recursion_and_invariance(self, ray_session):
        from web_graph_ray.stages.relational import keyed_ewma

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 20, 500),
                "t": np.arange(500, dtype="int64"),
                "v": rng.integers(0, 100, 500).astype("int64"),
            }
        )
        out = (
            keyed_ewma(
                ray.data.from_pandas(df).repartition(8), "k", ["t"], "v", alpha=0.3
            )
            .to_pandas()
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        # literal recursion: s_0 = v_0, s_t = a*v + (1-a)*s
        exp = {}
        for k, g in df.sort_values("t").groupby("k"):
            s = None
            for t_, v_ in zip(g["t"], g["v"]):
                s = float(v_) if s is None else 0.3 * v_ + (1 - 0.3) * s
                exp[(k, t_)] = s
        got = dict(zip(zip(out["k"], out["t"]), out["ewma"]))
        assert got.keys() == exp.keys()
        for key in exp:
            assert got[key] == pytest.approx(exp[key], rel=1e-12), key

        out1 = (
            keyed_ewma(
                ray.data.from_pandas(df).repartition(1), "k", ["t"], "v", alpha=0.3
            )
            .to_pandas()
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, out1)


class TestPcaPowerIteration:
    def test_recovers_planted_component(self, ray_session, tmp_path):
        """On embeddings with one strongly dominant direction, 12 power
        steps land on the eigh top eigenvector (sign-fixed)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as entrymod

        rng = np.random.default_rng(5)
        d, n = 16, 400
        u = rng.normal(size=d)
        u /= np.linalg.norm(u)
        # variance 25 along u, ~0.01 isotropic noise elsewhere
        x = (
            np.outer(rng.normal(size=n) * 5.0, u)
            + rng.normal(size=(n, d)) * 0.1
        ).astype("float32")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array(list(x), pa.list_(pa.float32())),
                    "label": pa.array(np.zeros(n, dtype="int32"), pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        out = entrymod.pca_top_embeddings(str(tmp_path))
        assert len(out) == d
        x6 = np.round(x.astype("float64") * 1e6) / 1e6
        cov = np.cov(x6, rowvar=False, bias=True)
        w, vecs = np.linalg.eigh(cov)
        top = vecs[:, -1]
        lead = int(np.lexsort((np.arange(d), -np.abs(top)))[0])
        if top[lead] < 0:
            top = -top
        assert np.abs(out["loading"].to_numpy() - top).max() < 1e-4
        assert out["eigval"][0] == pytest.approx(w[-1], rel=1e-3)
