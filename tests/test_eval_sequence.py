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

    def test_single_class_returns_nan_not_crash(self, ray_session):
        """All-positive (or all-negative) input: AUC is undefined —
        NaN with honest counts, never a ZeroDivisionError."""
        from web_graph_ray.stages.eval import roc_auc

        df = pd.DataFrame({"s": [1.0, 2.0, 3.0, 4.0], "y": [1, 1, 1, 1]})
        out = roc_auc(
            ray.data.from_pandas(df).repartition(2), "s", "y", stats=True
        )
        assert np.isnan(out["auc"][0]) and np.isnan(out["z"][0])
        assert int(out["n_pos"][0]) == 4 and int(out["n_neg"][0]) == 0

    def test_single_distinct_score_z_is_nan(self, ray_session):
        """One tied score covering both classes: the tie-corrected
        variance is 0, so z is undefined — a defined NaN (mirrored in
        the mannwhitney twin via a var>0 CASE), not inf/nan from a
        sqrt(0) division with a runtime warning (ADVICE r4)."""
        import warnings

        from web_graph_ray.stages.eval import roc_auc

        df = pd.DataFrame({"s": [2.0] * 6, "y": [1, 0, 1, 0, 1, 0]})
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any RuntimeWarning fails
            out = roc_auc(
                ray.data.from_pandas(df).repartition(2), "s", "y", stats=True
            )
        assert out["auc"][0] == pytest.approx(0.5)
        assert np.isnan(out["z"][0])
        assert out["u_stat"][0] == pytest.approx(4.5)

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


class TestRocAucProperty:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.tuples(
                st.sampled_from([-2.0, -1.0, -0.5, -0.0, 0.0, 0.5, 1.0, 2.0]),
                st.integers(0, 1),
            ),
            min_size=12,
            max_size=120,
        ).filter(
            lambda rows: 0 < sum(y for _, y in rows) < len(rows)
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_random_tied_data_matches_reference(self, ray_session, rows):
        """Heavy ties (a 6-value score alphabet incl. ±0.0) against the
        rank-based reference, at parallelism 8."""
        from web_graph_ray.stages.eval import roc_auc

        score = np.array([s for s, _ in rows], dtype="float64")
        y = np.array([l for _, l in rows], dtype="int64")
        df = pd.DataFrame({"s": score, "y": y})
        out = roc_auc(ray.data.from_pandas(df).repartition(8), "s", "y")
        # tolerance is one 6 dp grid step: an AUC landing EXACTLY on a
        # rounding midpoint (hypothesis found 0.3828125) differs from
        # the unrounded reference by exactly 5e-7 after half-away
        # rounding — legitimate, not an error
        assert out["auc"][0] == pytest.approx(
            _auc_reference(score + 0.0, y), abs=1.01e-6
        )


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


SF = "/root/testdata/sf0.001"


def _weekend_xy(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "value", "event_type"])
    us = t["ts"].cast("int64").to_numpy()
    dow = (us // 1_000_000 // 86400 + 4) % 7
    return (
        t["value"].to_numpy(),
        ((dow == 0) | (dow == 6)).astype("int64"),
        t["event_type"].to_pandas().to_numpy(),
    )


class TestEvalEntriesVsLocalReference:
    def test_mannwhitney_z_literal(self, ray_session):
        import __ray_entry__ as entrymod

        s, y, _ = _weekend_xy(SF)
        out = entrymod.mannwhitney_weekend_events(SF)
        auc = _auc_reference(s, y)
        n1, n2 = int(y.sum()), int(len(y) - y.sum())
        u = auc * n1 * n2
        nt = n1 + n2
        _, t_sizes = np.unique(s, return_counts=True)
        tc = float(np.sum(t_sizes.astype("float64") ** 3 - t_sizes))
        var = n1 * n2 / 12.0 * ((nt + 1) - tc / (nt * (nt - 1.0)))
        z = (u - n1 * n2 / 2.0) / np.sqrt(var)
        assert int(out["n_pos"][0]) == n1 and int(out["n_neg"][0]) == n2
        assert out["u_stat"][0] == pytest.approx(u, rel=1e-9)
        assert out["z"][0] == pytest.approx(z, abs=1e-5)

    def test_auc_by_type_matches_per_type_reference(self, ray_session):
        import __ray_entry__ as entrymod

        s, y, et = _weekend_xy(SF)
        out = entrymod.auc_by_type_events(SF)
        assert sorted(out["event_type"]) == sorted(np.unique(et))
        for _, r in out.iterrows():
            m = et == r["event_type"]
            assert r["auc"] == pytest.approx(
                _auc_reference(s[m], y[m]), abs=5e-7
            ), r["event_type"]

    def test_calibration_bins_literal(self, ray_session):
        import __ray_entry__ as entrymod

        s, y, _ = _weekend_xy(SF)
        x = s.astype("float64")
        yf = y.astype("float64")
        b0 = b1 = 0.0
        for _ in range(4):
            p = 1.0 / (1.0 + np.exp(-(b0 + b1 * x)))
            w = p * (1.0 - p)
            g0, g1 = np.sum(yf - p), np.sum((yf - p) * x)
            h00, h01, h11 = np.sum(w), np.sum(w * x), np.sum(w * x * x)
            det = h00 * h11 - h01 * h01
            b0 += (h11 * g0 - h01 * g1) / det
            b1 += (-h01 * g0 + h00 * g1) / det
        from web_graph_ray.functions.numeric import round_half_away

        b0r, b1r = round_half_away(np.array([b0, b1]), 6)
        p = 1.0 / (1.0 + np.exp(-(b0r + b1r * x)))
        bins = np.minimum(np.floor(p * 10), 9).astype("int64")
        out = entrymod.calibration_bins_events(SF)
        assert int(out["n"].sum()) == len(x)
        for _, r in out.iterrows():
            m = bins == r["bin"]
            assert int(r["n"]) == int(m.sum())
            assert r["mean_pred"] == pytest.approx(p[m].mean(), abs=1e-6)
            assert r["emp_rate"] == pytest.approx(yf[m].mean(), abs=1e-6)
            assert r["brier"] == pytest.approx(
                np.mean((p[m] - yf[m]) ** 2), abs=1e-6
            )

    def test_cov_by_label_matches_numpy(self, ray_session):
        import pyarrow.parquet as pq

        import __ray_entry__ as entrymod
        from web_graph_ray.functions.numeric import round_half_away

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding", "label"])
        lab = t["label"].to_numpy()
        x = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype("float64")
        x6 = round_half_away(x * 1e6, 0) / 1e6
        out = entrymod.cov_by_label_embeddings(SF)
        d = x.shape[1]
        assert len(out) == len(np.unique(lab)) * d * d
        for lv in np.unique(lab):
            ref = np.cov(x6[lab == lv], rowvar=False, bias=True)
            got = (
                out[out["label"] == lv]
                .sort_values(["i", "j"])["cov"]
                .to_numpy()
                .reshape(d, d)
            )
            assert np.abs(got - ref).max() < 2e-6


class TestHeapsAndStump:
    def test_heaps_law_matches_literal(self, ray_session):
        import re

        import pyarrow.parquet as pq

        import __ray_entry__ as entrymod

        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        word = re.compile(r"[A-Za-z0-9]+")
        seen, pts = set(), []
        cn = cv = 0
        for i, txt in sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())):
            toks = word.findall(txt.lower())
            cn += len(toks)
            new = set(toks) - seen
            cv += len(new)
            seen |= new
            if cn > 0 and cv > 0:
                pts.append((np.log(cn), np.log(cv)))
        x, y = np.array(pts).T
        n = len(x)
        beta = (n * np.sum(x * y) - x.sum() * y.sum()) / (
            n * np.sum(x * x) - x.sum() ** 2
        )
        k = np.exp((y.sum() - beta * x.sum()) / n)
        out = entrymod.heaps_law_documents(SF)
        assert int(out["n_docs"][0]) == n
        assert out["beta"][0] == pytest.approx(beta, abs=1e-5)
        assert out["k"][0] == pytest.approx(k, rel=1e-4)
        # natural corpora give β≈0.4-0.6; the synthetic table's tiny
        # shared word pool saturates instantly, so only 0 ≤ β < 1 holds
        assert 0.0 <= out["beta"][0] < 1.0

    def test_stump_matches_bruteforce(self, ray_session):
        import __ray_entry__ as entrymod

        s, y, _ = _weekend_xy(SF)
        order = np.argsort(s, kind="mergesort")
        su, idx = np.unique(s[order], return_index=True)
        pos = np.add.reduceat(y[order], idx).astype("float64")
        tot = np.add.reduceat(np.ones_like(y[order]), idx).astype("float64")
        neg = tot - pos
        cp, cn = np.cumsum(pos), np.cumsum(neg)
        P, N = y.sum(), len(y) - y.sum()
        T = float(P + N)
        gp = 1 - (P * P + N * N) / (T * T)
        ll, rr = cp + cn, T - (cp + cn)
        keep = ll < T
        gl = 1 - (cp**2 + cn**2) / ll**2
        gr = 1 - ((P - cp) ** 2 + (N - cn) ** 2) / np.maximum(rr, 1) ** 2
        gain = np.round(gp - ((ll / T) * gl + (rr / T) * gr), 6)[keep]
        su, ll = su[keep], ll[keep]
        best = np.lexsort((su, -gain))[0]
        out = entrymod.stump_weekend_events(SF)
        assert out["gain"][0] == pytest.approx(gain[best], abs=2e-6)
        assert out["threshold"][0] == pytest.approx(su[best], abs=1e-6)
        assert int(out["n_left"][0]) == int(ll[best])
        assert int(out["n_left"][0]) + int(out["n_right"][0]) == len(y)


class TestGainsIsotonicEce:
    def test_isotonic_matches_literal_pav(self, ray_session):
        import __ray_entry__ as entrymod

        s, y, _ = _weekend_xy(SF)
        order = np.argsort(s, kind="mergesort")
        su, idx = np.unique(s[order], return_index=True)
        pos = np.add.reduceat(y[order], idx).astype("float64")
        n = np.add.reduceat(np.ones_like(y[order]), idx).astype("float64")
        # literal PAV (pool while left mean >= right mean)
        blocks = []
        for p_, n_ in zip(pos, n):
            blocks.append([p_, n_, 1])
            while len(blocks) > 1 and (
                blocks[-2][0] / blocks[-2][1] >= blocks[-1][0] / blocks[-1][1]
            ):
                b = blocks.pop()
                blocks[-1][0] += b[0]
                blocks[-1][1] += b[1]
                blocks[-1][2] += b[2]
        rates = np.repeat([b[0] / b[1] for b in blocks], [b[2] for b in blocks])
        out = entrymod.isotonic_weekend_events(SF)
        assert len(out) == len(su)
        assert np.allclose(out["s"].to_numpy(), su)
        assert np.abs(out["iso_p"].to_numpy() - rates).max() < 2e-6
        # fitted function is non-decreasing in s
        assert (np.diff(out["iso_p"].to_numpy()) >= 0).all()
        # pooling preserves the total positive mass
        assert np.sum(out["iso_p"].to_numpy() * n) == pytest.approx(
            y.sum(), rel=1e-5
        )

    def test_gains_curve_invariants(self, ray_session):
        import __ray_entry__ as entrymod

        s, y, _ = _weekend_xy(SF)
        out = entrymod.gains_curve_events(SF)
        assert list(out["decile"]) == list(range(1, 11))
        assert int(out["n"].sum()) == len(y)
        assert int(out["n_pos"].sum()) == int(y.sum())
        assert out["capture"].iloc[-1] == pytest.approx(1.0, abs=1e-6)
        assert (np.diff(out["capture"].to_numpy()) >= 0).all()
        # NTILE front-loads the remainder
        assert (out["n"].to_numpy()[:-1] >= out["n"].to_numpy()[1:]).all()

    def test_ece_consistent_with_bins(self, ray_session):
        import __ray_entry__ as entrymod

        bins = entrymod.calibration_bins_events(SF)
        out = entrymod.ece_weekend_events(SF)
        n = bins["n"].to_numpy(dtype="float64")
        ref = np.sum(
            n * np.abs(bins["mean_pred"].to_numpy() - bins["emp_rate"].to_numpy())
        ) / n.sum()
        assert out["ece"][0] == pytest.approx(ref, abs=1e-6)
        assert int(out["n_bins"][0]) == len(bins)


def test_tukey_hsd_matches_literal(ray_session):
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    df = pd.DataFrame(
        {"g": t["event_type"].to_pandas(), "y": t["value"].to_numpy()}
    )
    g = df.groupby("g")["y"]
    nn, k = len(df), g.ngroups
    ssw = float(sum(((v - v.mean()) ** 2).sum() for _, v in g))
    msw = ssw / (nn - k)
    out = entrymod.tukey_hsd_events(SF)
    assert len(out) == k * (k - 1) // 2
    means, counts = g.mean(), g.size()
    for _, r in out.iterrows():
        na, nb = counts[r["type_a"]], counts[r["type_b"]]
        md = means[r["type_a"]] - means[r["type_b"]]
        q = abs(md) / np.sqrt(msw / 2 * (1 / na + 1 / nb))
        assert r["q_stat"] == pytest.approx(q, abs=1e-4)
        assert r["mean_diff"] == pytest.approx(md, abs=1e-5)


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
