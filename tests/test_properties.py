"""Property-based tests (hypothesis) for the identity-critical layer.

The URL parser decides page identity for the whole engine; fuzz it for
crash-freedom and the invariants that dedup correctness rests on.
"""

import string

from hypothesis import given, settings, strategies as st

from web_graph_ray.functions.extract import extract_html, to_valid_utf8
from web_graph_ray.functions.filters import parse_url
from web_graph_ray.functions.urlnorm import URLError, page_id_from_parts, parse, resolve_path

url_chars = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=-._~% 💡é\x00\x1f",
    max_size=80,
)


class TestParseFuzz:
    @given(url_chars)
    @settings(max_examples=400, deadline=None)
    def test_parse_never_crashes_unexpectedly(self, s):
        """parse() either returns a GoURL or raises URLError — nothing else."""
        try:
            u = parse(s)
        except URLError:
            return
        # accessors are total on any parsed URL
        u.hostname(); u.port(); u.escaped_path(); u.string(); u.is_abs()

    @given(url_chars)
    @settings(max_examples=400, deadline=None)
    def test_string_fixed_point(self, s):
        """u.string() re-parses to the same serialization (idempotence —
        the dequeue-revalidation invariant)."""
        try:
            once = parse(s).string()
        except URLError:
            return
        try:
            twice = parse(once).string()
        except URLError:
            return  # Go has the same property (String() of odd URLs may not reparse)
        assert twice == once

    @given(url_chars)
    @settings(max_examples=300, deadline=None)
    def test_identity_stable_through_roundtrip(self, s):
        """page_id survives string() → parse() — variants never split."""
        u = parse_url("https://h.example/" + s.replace("#", "").replace("?", ""))
        if u is None:
            return
        pid = page_id_from_parts(u.hostname(), u.escaped_path())
        u2 = parse_url(u.string())
        if u2 is None:
            return
        assert page_id_from_parts(u2.hostname(), u2.escaped_path()) == pid


class TestResolvePathProps:
    segs = st.lists(
        st.sampled_from(["a", "b", "..", ".", "", "x%20y", "c.d"]), max_size=8
    )

    @given(segs, segs)
    @settings(max_examples=300, deadline=None)
    def test_resolved_is_clean(self, base, ref):
        """Output starts with '/' and contains no '.'/'..' segments."""
        out = resolve_path("/" + "/".join(base), "/".join(ref))
        assert out == "" or out.startswith("/")
        for seg in out.split("/"):
            assert seg not in (".", "..")


class TestExtractFuzz:
    @given(st.binary(max_size=400))
    @settings(max_examples=300, deadline=None)
    def test_extract_never_crashes(self, data):
        r = extract_html(data)
        # emitted text is always valid UTF-8 (Go ToValidUTF8 contract)
        r.doc_text.encode("utf-8")
        for a in r.anchors:
            a.text.encode("utf-8")

    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_to_valid_utf8_total(self, s):
        to_valid_utf8(s).encode("utf-8")


class TestBucketJoinProperties:
    """bucket_semi_join / bucket_hash_join ≡ pandas merge, including the
    adversarial dtypes that broke a naive implementation: int64 values
    above 2^53 (float64 null-padding corrupts them), negative ints,
    strings, and binary payloads."""

    @staticmethod
    def _mk(rng, n, keyspace):
        import pandas as pd

        return pd.DataFrame(
            {
                "k": rng.integers(0, keyspace, n),
                "big": rng.integers(2**62, 2**63 - 1, n),  # float64-unsafe
                "neg": rng.integers(-(2**62), 0, n),
                "s": [f"s{int(x)}" for x in rng.integers(0, 50, n)],
            }
        )

    def test_hash_join_matches_pandas(self, ray_session):
        import numpy as np
        import ray.data

        from web_graph_ray.stages.relational import bucket_hash_join

        rng = np.random.default_rng(3)
        left = self._mk(rng, 4000, 300)
        right = (
            self._mk(rng, 500, 300)
            .rename(columns={"big": "rbig", "neg": "rneg", "s": "rs"})
            .drop_duplicates("k")
        )
        got = bucket_hash_join(
            ray.data.from_pandas(left).repartition(6),
            ray.data.from_pandas(right).repartition(3),
            ["k"],
        ).to_pandas()
        exp = left.merge(right, on="k", how="inner")
        order = ["k", "big", "neg", "s", "rbig", "rneg", "rs"]
        g = got[order].sort_values(order).reset_index(drop=True)
        x = exp[order].sort_values(order).reset_index(drop=True)
        assert g.astype(str).equals(x.astype(str))
        # the 2^53+ values survived bit-exactly
        assert set(g["big"]) <= set(left["big"])
        assert g["rbig"].dtype == np.int64

    def test_semi_join_matches_pandas(self, ray_session):
        import numpy as np
        import ray.data

        from web_graph_ray.stages.relational import bucket_semi_join

        rng = np.random.default_rng(4)
        left = self._mk(rng, 3000, 200)
        keys = left.sample(40, random_state=1)[["k", "big"]].drop_duplicates()
        got = bucket_semi_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(keys),
            ["k", "big"],
        ).to_pandas()
        exp = left.merge(keys, on=["k", "big"], how="inner")
        order = ["k", "big", "neg", "s"]
        g = got[order].sort_values(order).reset_index(drop=True)
        x = exp[order].sort_values(order).reset_index(drop=True)
        assert g.astype(str).equals(x.astype(str))
        assert len(g) > 0

    def test_bucketed_agg_matches_pandas(self, ray_session):
        import numpy as np
        import ray.data

        from web_graph_ray.stages.relational import bucketed_agg

        rng = np.random.default_rng(5)
        n = 50_000
        df = __import__("pandas").DataFrame(
            {
                "k1": rng.integers(0, 20_000, n),  # many distinct groups
                "k2": rng.integers(0, 3, n),
                "v": rng.integers(2**62, 2**63 - 1, n),
            }
        )
        ds = ray.data.from_pandas(df).repartition(8)
        cnt = bucketed_agg(ds, ["k1", "k2"]).to_pandas()
        exp_cnt = df.groupby(["k1", "k2"], as_index=False).size()
        assert len(cnt) == len(exp_cnt) and cnt["count()"].sum() == n
        mn = bucketed_agg(ds, ["k1"], "v", how="min").to_pandas()
        exp_mn = df.groupby("k1", as_index=False)["v"].min()
        m = mn.sort_values("k1").reset_index(drop=True)
        e = exp_mn.sort_values("k1").reset_index(drop=True)
        assert (m["k1"].values == e["k1"].values).all()
        assert (m["min(v)"].values == e["v"].values).all()  # bit-exact big ints


class TestGroupedTopkAndStrata:
    def test_grouped_topk_matches_pandas(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import grouped_topk

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 40, 5000),
                "id": np.arange(5000, dtype=np.int64),
                "v": rng.integers(0, 100, 5000).astype("float64"),
            }
        )
        got = (
            grouped_topk(
                ray.data.from_pandas(df).repartition(7),
                ["g"], "v", k=3, tie_cols=["id"], num_buckets=8,
            )
            .to_pandas()
            .sort_values(["g", "v", "id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        exp = (
            df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
            .groupby("g", as_index=False, sort=False)
            .head(3)
            .sort_values(["g", "v", "id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["g", "id", "v"]], exp[["g", "id", "v"]])

    def test_stratified_sample_deterministic_and_sized(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import stratified_sample

        rng = np.random.default_rng(13)
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 10, 3000),
                "id": np.arange(3000, dtype=np.int64),
            }
        )

        def run(nparts):
            return (
                stratified_sample(
                    ray.data.from_pandas(df).repartition(nparts),
                    ["g"], ["id"], n=7, num_buckets=8,
                )
                .to_pandas()
                .sort_values(["g", "id"])
                .reset_index(drop=True)
            )

        a, b = run(3), run(11)
        pd.testing.assert_frame_equal(a, b)  # parallelism-invariant
        assert (a.groupby("g").size() == 7).all()
        assert set(a.columns) == {"g", "id"}


class TestExactQuantile:
    def test_quantile_matches_numpy_kth(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import exact_quantile

        rng = np.random.default_rng(17)
        # heavy duplicates + a skewed tail — the adversarial shapes for
        # pivot narrowing
        v = np.concatenate(
            [rng.integers(0, 50, 20000), rng.lognormal(0, 2, 5000) * 1000]
        ).astype("float64")
        ds = ray.data.from_pandas(pd.DataFrame({"x": v})).repartition(9)
        sv = np.sort(v)
        for q in (0.01, 0.5, 0.9, 0.999, 1.0):
            k = min(max(int(np.ceil(q * len(v))), 1), len(v))
            got = exact_quantile(ds, "x", q, max_driver_rows=500)
            assert got == sv[k - 1], (q, got, sv[k - 1])

    def test_quantile_all_equal(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import exact_quantile

        ds = ray.data.from_pandas(pd.DataFrame({"x": [7.0] * 5000})).repartition(4)
        assert exact_quantile(ds, "x", 0.5, max_driver_rows=100) == 7.0


class TestRangeAndHopping:
    def test_range_join_matches_pandas(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import range_join

        rng = np.random.default_rng(23)
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 20, 2000),
                "lid": np.arange(2000, dtype=np.int64),
                "t": rng.integers(0, 10_000, 2000),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 20, 300),
                "rid": np.arange(300, dtype=np.int64),
                "s": rng.integers(0, 10_000, 300),
            }
        )
        right["e"] = right["s"] + rng.integers(1, 500, 300)
        got = (
            range_join(
                ray.data.from_pandas(left).repartition(5),
                ray.data.from_pandas(right).repartition(3),
                on="k", left_ts="t", right_start="s", right_end="e",
                num_buckets=8,
            )
            .to_pandas()
        )
        exp = left.merge(right, on="k")
        exp = exp[(exp["s"] <= exp["t"]) & (exp["t"] < exp["e"])]
        key = ["lid", "rid"]
        assert sorted(map(tuple, got[key].values)) == sorted(map(tuple, exp[key].values))
        assert len(got) > 0

    def test_hopping_covers_tumbling(self, ray_session):
        """slide == window degenerates hopping to tumbling exactly."""
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import (
            hopping_window_agg,
            tumbling_window_agg,
        )

        ts = pd.to_datetime(
            ["2024-01-01 00:05", "2024-01-01 00:55", "2024-01-01 01:10",
             "2024-01-01 02:00", "2024-01-01 02:30"]
        )
        df = pd.DataFrame({"u": [1, 1, 1, 2, 2], "ts": ts, "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
        ds = ray.data.from_pandas(df).repartition(2)
        cols = ["u", "window_start", "value_sum", "n_events"]
        a = tumbling_window_agg(ds, "u", "ts", "v", 3600).to_pandas()[cols]
        b = hopping_window_agg(ds, "u", "ts", "v", 3600, 3600).to_pandas()[cols]
        a = a.sort_values(cols).reset_index(drop=True)
        b = b.sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestRollup:
    def test_matches_pandas_all_levels(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import rollup_agg

        rng = np.random.RandomState(2)
        df = pd.DataFrame(
            {
                "a": rng.choice(list("xyz"), 500),
                "b": rng.choice(list("pq"), 500),
                "v": rng.randint(0, 100, 500),
            }
        )
        got = (
            rollup_agg(ray.data.from_pandas(df).repartition(8), ["a", "b"], "v")
            .to_pandas()
        )
        full = df.groupby(["a", "b"], as_index=False)["v"].sum()
        lvl2 = got[got.level == 2].sort_values(["a", "b"]).reset_index(drop=True)
        assert lvl2[["a", "b"]].values.tolist() == full[["a", "b"]].values.tolist()
        assert lvl2["agg"].tolist() == full["v"].tolist()
        lvl1 = got[got.level == 1].sort_values("a").reset_index(drop=True)
        bya = df.groupby("a", as_index=False)["v"].sum()
        assert lvl1["agg"].tolist() == bya["v"].tolist()
        assert lvl1["b"].isna().all()
        lvl0 = got[got.level == 0]
        assert len(lvl0) == 1 and lvl0["agg"].item() == df["v"].sum()

    def test_min_rollup(self, ray_session):
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import rollup_agg

        df = pd.DataFrame({"a": ["x", "x", "y"], "v": [5, 2, 9]})
        got = rollup_agg(
            ray.data.from_pandas(df), ["a"], "v", how="min"
        ).to_pandas()
        assert got[got.level == 1].set_index("a")["agg"].to_dict() == {"x": 2, "y": 9}
        assert got[got.level == 0]["agg"].item() == 2


class TestFunnel:
    def test_known_sequences(self, ray_session):
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import funnel_steps

        t0 = pd.Timestamp("2024-01-01")
        h = pd.Timedelta(hours=1)
        rows = [
            # u1: full funnel in order
            (1, t0, "view"), (1, t0 + h, "click"), (1, t0 + 2 * h, "purchase"),
            # u2: click BEFORE view → stops at step 1
            (2, t0, "click"), (2, t0 + h, "view"),
            # u3: view then purchase (no click) → stops at step 1
            (3, t0, "view"), (3, t0 + h, "purchase"),
            # u4: full funnel but click outside the window
            (4, t0, "view"), (4, t0 + pd.Timedelta(hours=30), "click"),
            # u5: never views
            (5, t0, "click"), (5, t0 + h, "purchase"),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        out = (
            funnel_steps(
                ray.data.from_pandas(df).repartition(4),
                ["view", "click", "purchase"],
                window_s=24 * 3600,
            )
            .to_pandas()
            .set_index("user_id")["steps_completed"]
            .to_dict()
        )
        assert out == {1: 3, 2: 1, 3: 1, 4: 1}

    def test_min_after_prev_semantics(self, ray_session):
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import funnel_steps

        t0 = pd.Timestamp("2024-01-01")
        h = pd.Timedelta(hours=1)
        # the FIRST click after view is at +2h; purchase at +1h (before
        # it) must not count, purchase at +3h does
        rows = [
            (1, t0, "view"), (1, t0 + 2 * h, "click"),
            (1, t0 + h, "purchase"), (1, t0 + 3 * h, "purchase"),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        out = funnel_steps(
            ray.data.from_pandas(df), ["view", "click", "purchase"]
        ).to_pandas()
        assert out.steps_completed.item() == 3


class TestSkewJoin:
    def test_equals_plain_join_with_hot_keys(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import bucket_hash_join, skew_join

        rng = np.random.RandomState(4)
        # key 7 is pathologically hot on the left
        keys = np.concatenate([rng.randint(0, 40, 600), np.full(400, 7)])
        left = pd.DataFrame({"k": keys, "lv": np.arange(len(keys))})
        right = pd.DataFrame({"k": np.arange(40), "rv": np.arange(40) * 10})

        def canon(d):
            return sorted(map(tuple, d.to_pandas()[["k", "lv", "rv"]].values.tolist()))

        l = ray.data.from_pandas(left).repartition(8)
        r = ray.data.from_pandas(right).repartition(4)
        skew = canon(skew_join(l, r, ["k"], hot_threshold=100))
        plain = canon(bucket_hash_join(l, r, ["k"]))
        assert skew == plain and len(skew) == 1000

    def test_right_side_skew_detected(self, ray_session):
        """ADVICE r3: a key hot only on the RIGHT side must also be
        routed through the hot path (hot detection unions counts from
        both sides), with the result still ≡ the plain bucket join."""
        import numpy as np
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import bucket_hash_join, skew_join

        rng = np.random.RandomState(11)
        left = pd.DataFrame(
            {"k": rng.randint(0, 40, 500), "lv": np.arange(500)}
        )
        # key 7 is pathologically hot on the right only
        rk = np.concatenate([np.arange(40), np.full(400, 7)])
        right = pd.DataFrame({"k": rk, "rv": np.arange(len(rk)) * 10})

        def canon(d):
            return sorted(map(tuple, d.to_pandas()[["k", "lv", "rv"]].values.tolist()))

        l = ray.data.from_pandas(left).repartition(8)
        r = ray.data.from_pandas(right).repartition(4)
        skew = canon(skew_join(l, r, ["k"], hot_threshold=100))
        plain = canon(bucket_hash_join(l, r, ["k"]))
        assert skew == plain and len(skew) > 0

    def test_no_hot_fallback(self, ray_session):
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import skew_join

        left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
        right = pd.DataFrame({"k": [2, 3, 4], "rv": [7, 8, 9]})
        out = skew_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), ["k"],
            hot_threshold=100,
        ).to_pandas()
        assert sorted(out.k.tolist()) == [2, 3]


class TestCubeAndNormalize:
    def test_cube_matches_pandas(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import cube_agg

        rng = np.random.RandomState(6)
        df = pd.DataFrame(
            {"a": rng.choice(list("mn"), 300), "b": rng.choice(list("uv"), 300),
             "v": rng.randint(0, 50, 300)}
        )
        got = cube_agg(
            ray.data.from_pandas(df).repartition(4), ["a", "b"], "v"
        ).to_pandas()
        assert got[got.grouping == 0]["agg"].sum() == df.v.sum()
        m_a = got[got.grouping == 1].set_index("a")["agg"].to_dict()
        assert m_a == df.groupby("a")["v"].sum().to_dict()
        m_b = got[got.grouping == 2].set_index("b")["agg"].to_dict()
        assert m_b == df.groupby("b")["v"].sum().to_dict()
        assert got[got.grouping == 3]["agg"].item() == df.v.sum()

    def test_normalize_edge_cases(self):
        import pyarrow as pa

        from web_graph_ray.stages.text import add_normalized

        batch = pa.Table.from_pydict(
            {"doc_id": pa.array([0, 1, 2], type=pa.int64()),
             "text": pa.array(["  Héllo,   World! 42 ", "", "$$$"])}
        )
        out = add_normalized(batch)["norm_text"].to_pylist()
        assert out == ["hllo world 42", "", ""]


class TestLeftJoin:
    def test_matches_pandas_left_merge(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import bucket_left_join

        rng = np.random.RandomState(8)
        left = pd.DataFrame({"k": np.arange(50), "lv": np.arange(50) * 2})
        right = pd.DataFrame(
            {"k": rng.randint(0, 30, 120), "rv": rng.randint(0, 9, 120)}
        )
        got = (
            bucket_left_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(4),
                ["k"],
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, on="k", how="left")
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
            .astype(got.dtypes.to_dict())
        )
        pd.testing.assert_frame_equal(got, want)
        # keys 30..49 have no right rows but must survive with null rv
        assert got[got.k >= 30].rv.isna().all()
        assert set(got.k) == set(range(50))


class TestFullJoin:
    def test_matches_pandas_outer_merge(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from web_graph_ray.stages.relational import bucket_full_join

        left = pd.DataFrame({"k": [1, 2, 3, 3], "lv": [10, 20, 30, 31]})
        right = pd.DataFrame({"k": [3, 4, 4], "rv": [7, 8, 9]})
        got = (
            bucket_full_join(
                ray.data.from_pandas(left).repartition(3),
                ray.data.from_pandas(right).repartition(2),
                ["k"],
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        want = left.merge(right, on="k", how="outer", indicator="_matched")
        want["_matched"] = want["_matched"].astype(str)
        want = (
            want.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
            .astype(got.dtypes.to_dict())
        )
        pd.testing.assert_frame_equal(got, want)
        assert set(got["_matched"]) == {"both", "left_only", "right_only"}


class TestPartitionedSink:
    def test_write_and_resume_skips_finished(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow.parquet as pq
        import ray

        from web_graph_ray.sources.sinks import finished_partitions, write_partitioned

        df = pd.DataFrame(
            {"day": ["d1"] * 30 + ["d2"] * 20 + ["d3"] * 10,
             "v": list(range(60))}
        )
        out = str(tmp_path / "sink")
        s1 = write_partitioned(
            ray.data.from_pandas(df).repartition(4), out, "day"
        )
        assert s1.skipped.tolist() == [False, False, False]
        assert finished_partitions(out) == {"d1", "d2", "d3"}

        # simulate a failed partition: remove d2's manifest + file
        import os, shutil

        os.remove(os.path.join(out, "_manifests", "d2.json"))
        shutil.rmtree(os.path.join(out, "day=d2"))

        s2 = write_partitioned(
            ray.data.from_pandas(df).repartition(4), out, "day"
        ).set_index("partition")
        assert bool(s2.loc["d1", "skipped"]) and bool(s2.loc["d3", "skipped"])
        assert not bool(s2.loc["d2", "skipped"])

        # every partition readable and complete
        total = 0
        for d in ("d1", "d2", "d3"):
            t = pq.read_table(os.path.join(out, f"day={d}", "part.parquet"))
            total += t.num_rows
        assert total == 60

    def test_incremental_read_exactly_once(self, ray_session, tmp_path):
        """read_incremental delivers each committed partition exactly
        once per cursor commit: new partitions only, crash-before-commit
        re-delivers, drained stream returns None."""
        import pandas as pd
        import ray

        from web_graph_ray.sources.sinks import read_incremental, write_partitioned

        out = str(tmp_path / "sink")
        cur = str(tmp_path / "cursor.json")
        wave1 = pd.DataFrame({"day": ["d1"] * 3 + ["d2"] * 2, "v": range(5)})
        write_partitioned(ray.data.from_pandas(wave1).repartition(2), out, "day")

        ds1, keys1, commit1 = read_incremental(out, "day", cur)
        assert keys1 == ["d1", "d2"] and ds1.count() == 5
        # crash before commit: the same partitions are re-delivered
        ds1b, keys1b, commit1b = read_incremental(out, "day", cur)
        assert keys1b == ["d1", "d2"] and ds1b.count() == 5
        commit1b()

        # wave 2: d3/d4 arrive (d1/d2 skipped by the sink's manifests)
        wave2 = pd.DataFrame(
            {"day": ["d1"] * 3 + ["d3"] * 4 + ["d4"] * 1, "v": range(8)}
        )
        write_partitioned(ray.data.from_pandas(wave2).repartition(2), out, "day")
        ds2, keys2, commit2 = read_incremental(out, "day", cur)
        assert keys2 == ["d3", "d4"] and ds2.count() == 5
        assert set(ds2.to_pandas()["day"]) == {"d3", "d4"}
        commit2()

        ds3, keys3, _ = read_incremental(out, "day", cur)
        assert ds3 is None and keys3 == []


class TestLagRunningScrub:
    def test_keyed_lag_matches_pandas(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import keyed_lag

        rng = np.random.default_rng(31)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 50, 3000),
                "o": rng.permutation(3000).astype(np.int64),
                "v": rng.normal(size=3000),
            }
        )
        got = (
            keyed_lag(
                ray.data.from_pandas(df).repartition(5), "k", ["o"], ["v"],
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        exp = df.sort_values(["k", "o"]).reset_index(drop=True)
        exp["v_prev"] = exp.groupby("k")["v"].shift(1)
        pd.testing.assert_frame_equal(got[["k", "o", "v", "v_prev"]], exp)

    def test_keyed_running_matches_pandas(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import keyed_running

        rng = np.random.default_rng(32)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 40, 2500),
                "o": rng.permutation(2500).astype(np.int64),
                "v": rng.normal(size=2500),
            }
        )
        got = (
            keyed_running(
                ray.data.from_pandas(df).repartition(4), "k", ["o"], "v",
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        exp = df.sort_values(["k", "o"]).reset_index(drop=True)
        exp["running_sum"] = exp.groupby("k")["v"].cumsum()
        exp["rn"] = (exp.groupby("k").cumcount() + 1).astype("int64")
        pd.testing.assert_frame_equal(
            got[["k", "o", "v", "running_sum", "rn"]], exp
        )

    def test_stopword_scrub_edges(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.text import stopword_scrub

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "the cat sat of the mat",
                    "the the the",          # everything removed
                    "a  b the  c",          # double spaces -> empty tokens kept
                    "",                     # one empty token, kept
                ],
            }
        )
        got = (
            stopword_scrub(ray.data.from_pandas(df).repartition(2),
                           ("the", "of", "a"))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["clean_text"].tolist() == ["cat sat mat", "", " b  c", ""]
        assert got["kept_tokens"].tolist() == [3, 0, 4, 1]
        assert got["removed_tokens"].tolist() == [3, 3, 2, 0]

    def test_stopword_scrub_permuted_index(self, ray_session):
        """Batches arriving with a permuted (non-monotonic) index —
        e.g. out of a dedup stage — must not misalign removed_tokens."""
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.text import stopword_scrub

        df = pd.DataFrame(
            {"doc_id": [0, 1, 2], "text": ["the x", "y the the", "z"]},
            index=[2, 0, 1],
        )
        got = (
            stopword_scrub(ray.data.from_pandas(df), ("the",))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["kept_tokens"].tolist() == [1, 1, 1]
        assert got["removed_tokens"].tolist() == [1, 2, 0]


class TestWeightedSample:
    def test_matches_local_and_parallelism_invariant(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.functions.numeric import round_half_away
        from web_graph_ray.stages.relational import weighted_sample
        from web_graph_ray.stages.sketch import fnv1a64

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {"id": np.arange(5000, dtype=np.int64),
             "w": rng.integers(1, 1000, 5000).astype(np.int64)}
        )
        # local reference: same E-S keys, top-10 by (key desc, id asc)
        h = fnv1a64(df["id"].astype(str).to_numpy(dtype=object))
        u = ((h >> np.uint64(11)).astype("float64") + 1.0) / 2.0**53
        key = round_half_away(np.log(u) / df["w"].to_numpy("float64"), 9)
        exp = (
            df.assign(w_key=key)
            .sort_values(["w_key", "id"], ascending=[False, True])
            .head(10)
            .sort_values("id")
            .reset_index(drop=True)
        )
        for parts in (2, 13):
            got = (
                weighted_sample(
                    ray.data.from_pandas(df).repartition(parts),
                    ["id"], "w", 10, num_buckets=8,
                )
                .to_pandas()[["id", "w", "w_key"]]
                .sort_values("id")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, exp[["id", "w", "w_key"]])

    def test_weight_bias(self, ray_session):
        """Heavy rows must be overrepresented: sample-mean weight well
        above the population mean."""
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import weighted_sample

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {"id": np.arange(20000, dtype=np.int64),
             "w": rng.integers(1, 100, 20000).astype(np.int64)}
        )
        got = weighted_sample(
            ray.data.from_pandas(df).repartition(4), ["id"], "w", 500,
        ).to_pandas()
        assert got["w"].mean() > df["w"].mean() * 1.2


class TestOrderedConcat:
    def test_matches_local_across_partitionings(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import ordered_concat

        rng = np.random.default_rng(17)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 30, 2000),
                "o": rng.permutation(2000).astype(np.int64),
                "v": rng.choice(list("abcde"), 2000),
            }
        )
        s = df.sort_values(["k", "o"])
        exp = (
            s.groupby("k")["v"].agg(">".join).reset_index()
            .rename(columns={"v": "path"})
        )
        exp["n_steps"] = s.groupby("k")["v"].size().to_numpy().astype("int64")
        for parts in (1, 7):
            got = (
                ordered_concat(
                    ray.data.from_pandas(df).repartition(parts),
                    "k", ["o"], "v", num_buckets=8,
                )
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, exp.reset_index(drop=True))


class TestRankStats:
    def test_ntile_fill_and_edges(self, ray_session):
        """SQL ntile fill: first n%k tiles get ceil(n/k) rows; n<k keys
        produce one row per tile; single-row keys get pct_rank 0.0."""
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import keyed_rank_stats

        df = pd.DataFrame(
            {
                "k": [1] * 10 + [2] * 3 + [3],
                "o": np.arange(14, dtype=np.int64),
            }
        )
        got = (
            keyed_rank_stats(
                ray.data.from_pandas(df).repartition(3), "k", ["o"],
                ntile_k=4, num_buckets=4,
            )
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        # n=10, k=4 -> sizes 3,3,2,2
        assert got[got["k"] == 1]["tile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
        # n=3 < k=4 -> tiles 1,2,3
        assert got[got["k"] == 2]["tile"].tolist() == [1, 2, 3]
        # single row: tile 1, pct_rank 0, cume_dist 1
        row = got[got["k"] == 3].iloc[0]
        assert row["tile"] == 1 and row["pct_rank"] == 0.0 and row["cume_dist"] == 1.0
        # cume_dist of the last row of every key is 1.0
        last = got.groupby("k").tail(1)
        assert (last["cume_dist"] == 1.0).all()


class TestMixCorpus:
    def test_weights_and_parallelism_invariance(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import mix_corpus

        df = pd.DataFrame(
            {
                "id": np.arange(6000, dtype=np.int64),
                "src": np.repeat(["a", "b", "c"], 2000),
            }
        )
        outs = []
        for parts in (2, 11):
            got = (
                mix_corpus(
                    ray.data.from_pandas(df).repartition(parts),
                    "src", ["id"], {"a": 3.0, "b": 0.25},
                )
                .to_pandas()
                .sort_values(["id", "epoch"])
                .reset_index(drop=True)
            )
            outs.append(got)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        got = outs[0]
        by = got.groupby("src").size()
        assert by["a"] == 6000                      # integer weight: exact 3x
        assert abs(by["b"] / 2000 - 0.25) < 0.05    # coin on frac(0.25)
        assert by["c"] == 2000                      # default weight 1.0
        # epochs are dense 0..n-1 per surviving row
        assert got[got["src"] == "a"].groupby("id")["epoch"].max().eq(2).all()

    def test_non_string_source_column_weights_apply(self, ray_session):
        """ADVICE r3: integer source columns must still hit their
        configured weight (keys are stringified on BOTH sides of the
        lookup), not silently fall to default_weight."""
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import mix_corpus

        df = pd.DataFrame(
            {
                "id": np.arange(300, dtype=np.int64),
                "src": np.repeat(np.array([1, 2, 3], dtype=np.int64), 100),
            }
        )
        got = mix_corpus(
            ray.data.from_pandas(df).repartition(3),
            "src", ["id"], {1: 3.0, 2: 0.0},
        ).to_pandas()
        by = got.groupby("src").size().to_dict()
        assert by.get(1, 0) == 300   # weight 3.0 -> exact 3 copies
        assert by.get(2, 0) == 0     # weight 0.0 -> dropped entirely
        assert by.get(3, 0) == 100   # unlisted -> default weight 1.0


class TestGlobalRank:
    def test_total_order_and_invariance(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import global_rank

        rng = np.random.default_rng(13)
        df = pd.DataFrame(
            {
                "id": np.arange(5000, dtype=np.int64),
                "v": rng.choice([1.0, 2.5, 7.0, 7.0, 9.9], 5000)
                + rng.integers(0, 3, 5000),
            }
        )
        exp = df.sort_values(["v", "id"]).reset_index(drop=True)
        exp["rank"] = np.arange(1, len(exp) + 1, dtype=np.int64)
        for parts in (2, 9):
            got = (
                global_rank(
                    ray.data.from_pandas(df).repartition(parts),
                    "v", ["id"], num_buckets=16,
                )
                .to_pandas()
                .sort_values("rank")
                .reset_index(drop=True)[["id", "v", "rank"]]
            )
            pd.testing.assert_frame_equal(got, exp[["id", "v", "rank"]])

    def test_constant_column(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import global_rank

        df = pd.DataFrame({"id": np.arange(50, dtype=np.int64), "v": 3.0})
        got = (
            global_rank(ray.data.from_pandas(df).repartition(3), "v", ["id"])
            .to_pandas()
            .sort_values("rank")
        )
        assert got["id"].tolist() == list(range(50))
        assert got["rank"].tolist() == list(range(1, 51))


class TestRedactPii:
    def test_patterns_and_counts(self):
        import pyarrow as pa

        from web_graph_ray.stages.text import redact_pii

        batch = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "mail me at jane.doe+spam@example.co.uk today",
                        "server 10.0.255.3 rebooted; backup 192.168.1.1 ok",
                        "call +1 555-123-4567 or 0044 2071234567",
                        "no pii here",
                    ]
                ),
            }
        )
        out = redact_pii(batch)
        red = out["redacted"].to_pylist()
        assert red[0] == "mail me at <EMAIL> today"
        assert red[1] == "server <IP> rebooted; backup <IP> ok"
        assert red[2] == "call <PHONE> or <PHONE>"
        assert red[3] == "no pii here"
        assert out["pii_count"].to_pylist() == [1, 2, 2, 0]

    def test_ip_not_double_counted_as_phone(self):
        import pyarrow as pa

        from web_graph_ray.stages.text import redact_pii

        # an IPv4 is digit-heavy; after the <IP> replacement the phone
        # pattern must not fire on the token (tokens are digit-free)
        out = redact_pii(
            pa.table({"text": pa.array(["ip 123.45.67.89 end"])})
        )
        assert out["redacted"].to_pylist() == ["ip <IP> end"]
        assert out["pii_count"].to_pylist() == [1]


class TestChunkDocuments:
    def test_overlap_and_coverage(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.text import chunk_documents

        docs = pd.DataFrame(
            {
                "doc_id": pd.array([0, 1, 2], dtype="int64"),
                "text": ["x" * 5, "abcdefghij" * 25, ""],  # 5, 250, 0 chars
            }
        )
        out = (
            chunk_documents(
                ray.data.from_pandas(docs).repartition(2), size=120, stride=100
            )
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        # doc 0: single short chunk; doc 1: offsets 0/100/200; doc 2: one empty
        assert out.groupby("doc_id")["chunk_id"].count().tolist() == [1, 3, 1]
        d1 = out[out.doc_id == 1]["chunk"].tolist()
        src = "abcdefghij" * 25
        assert d1 == [src[0:120], src[100:220], src[200:320]]
        # consecutive chunks overlap by size - stride
        assert d1[0][-20:] == d1[1][:20]
        assert out[out.doc_id == 2]["chunk"].tolist() == [""]

    def test_parallelism_invariance(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.text import chunk_documents

        docs = pd.DataFrame(
            {
                "doc_id": pd.array(range(40), dtype="int64"),
                "text": [("w%d " % i) * (7 * i) for i in range(40)],
            }
        )
        ref = None
        for parts in (1, 8):
            got = (
                chunk_documents(
                    ray.data.from_pandas(docs).repartition(parts),
                    size=64, stride=50,
                )
                .to_pandas()
                .sort_values(["doc_id", "chunk_id"])
                .reset_index(drop=True)
            )
            if ref is None:
                ref = got
            else:
                pd.testing.assert_frame_equal(got, ref)

    def test_rejects_bad_stride(self, ray_session):
        import pytest
        import ray.data

        from web_graph_ray.stages.text import chunk_documents

        ds = ray.data.from_items([{"doc_id": 0, "text": "abc"}])
        with pytest.raises(ValueError):
            chunk_documents(ds, size=10, stride=20)


class TestGlobalPrefixSum:
    def test_matches_serial_scan(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import global_prefix_sum

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "k": rng.permutation(300).astype("int64"),
                "v": rng.integers(0, 50, 300).astype("int64"),
            }
        )
        exp = df.sort_values("k").reset_index(drop=True)
        exp["prefix"] = exp["v"].cumsum().shift(1, fill_value=0)
        for parts in (1, 7):
            got = (
                global_prefix_sum(
                    ray.data.from_pandas(df).repartition(parts), "k", "v",
                    num_buckets=16,
                )
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)[["k", "v", "prefix"]]
            )
            pd.testing.assert_frame_equal(got, exp[["k", "v", "prefix"]])


class TestPackExamples:
    def test_layout_arithmetic(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.text import pack_examples

        # token counts: 3, 4, 0, 5  (WORD_RE = [A-Za-z0-9]+ runs)
        docs = pd.DataFrame(
            {
                "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
                "text": ["a b c", "w x y z", "!!! ...", "p q r s t"],
            }
        )
        out = (
            pack_examples(ray.data.from_pandas(docs), ctx=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_tokens"].tolist() == [3, 4, 0, 5]
        assert out["token_offset"].tolist() == [0, 3, 7, 7]
        # ctx=4: doc0 tokens [0,3) -> ex 0; doc1 [3,7) -> ex 0..1;
        # doc2 empty at offset 7 -> ex 1; doc3 [7,12) -> ex 1..2
        assert out["first_example"].tolist() == [0, 0, 1, 1]
        assert out["offset_in_first"].tolist() == [0, 3, 3, 3]
        assert out["last_example"].tolist() == [0, 1, 1, 2]

    def test_rejects_bad_ctx(self, ray_session):
        import pytest
        import ray.data

        from web_graph_ray.stages.text import pack_examples

        ds = ray.data.from_items([{"doc_id": 0, "text": "abc"}])
        with pytest.raises(ValueError):
            pack_examples(ds, ctx=0)


class TestSetOpsAndHashSplit:
    """set_intersect/set_except ≡ pandas set algebra (distinct tuples),
    invariant to input partitioning; hash_split is deterministic,
    parallelism-independent, and leakage-safe (one key → one split)."""

    @staticmethod
    def _mk(rng, n):
        import pandas as pd

        return pd.DataFrame(
            {
                "k": rng.integers(0, 60, n),
                "big": rng.integers(2**62, 2**62 + 40, n),  # float64-unsafe
                "s": [f"s{int(x)}" for x in rng.integers(0, 8, n)],
            }
        )

    def _expected(self, a, b, how):
        da = a.drop_duplicates()
        db = b.drop_duplicates()
        m = da.merge(db, on=list(a.columns), how="left", indicator=True)
        if how == "intersect":
            return m[m["_merge"] == "both"].drop(columns=["_merge"])
        return m[m["_merge"] == "left_only"].drop(columns=["_merge"])

    def test_set_ops_match_pandas_any_partitioning(self, ray_session):
        import numpy as np
        import ray.data

        from web_graph_ray.stages.relational import set_except, set_intersect

        rng = np.random.default_rng(11)
        a = self._mk(rng, 3000)
        b = self._mk(rng, 2500)
        cols = list(a.columns)
        for parts in (1, 7):
            da = ray.data.from_pandas(a).repartition(parts)
            db = ray.data.from_pandas(b).repartition(max(1, parts - 3))
            for how, fn in (("intersect", set_intersect), ("except", set_except)):
                got = fn(da, db).to_pandas()
                exp = self._expected(a, b, how)
                g = got[cols].sort_values(cols).reset_index(drop=True)
                x = exp[cols].sort_values(cols).reset_index(drop=True)
                assert g.astype(str).equals(x.astype(str)), (how, parts)
                assert len(g) > 0
                # distinct output + 2^62 ints bit-exact
                assert not g.duplicated().any()
                assert g["big"].dtype == np.int64

    def test_set_op_empty_and_validation(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data

        from web_graph_ray.stages.relational import set_except, set_op

        a = pd.DataFrame({"k": [1, 2]})
        da = ray.data.from_pandas(a)
        # left ⊆ right → EXCEPT is empty (0 rows, not a crash)
        assert set_except(da, da).count() == 0
        with pytest.raises(ValueError, match="how"):
            set_op(da, da, how="union")
        db = ray.data.from_pandas(pd.DataFrame({"other": [1]}))
        with pytest.raises(ValueError, match="column names"):
            set_op(da, db)

    def test_hash_split_deterministic_and_leakage_safe(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data

        from web_graph_ray.functions.hashing import hash64
        from web_graph_ray.stages.relational import hash_split

        # many rows per key: every row of a key must share its split
        df = pd.DataFrame({"uid": [i % 37 for i in range(1500)],
                           "x": range(1500)})
        outs = []
        for parts in (1, 6):
            ds = ray.data.from_pandas(df).repartition(parts)
            out = hash_split(ds, ["uid"], [80, 90], ["train", "val", "test"])
            outs.append(
                out.to_pandas().sort_values(["uid", "x"]).reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])  # parallelism-invariant
        got = outs[0]
        # one key → exactly one split (grouped/leakage-safe splitting)
        assert (got.groupby("uid")["split"].nunique() == 1).all()
        # matches the scalar FNV reference band-by-band
        for uid, split in got.drop_duplicates("uid")[["uid", "split"]].values:
            h = hash64(str(uid)) % 100
            exp = "train" if h < 80 else ("val" if h < 90 else "test")
            assert split == exp
        with pytest.raises(ValueError, match="boundaries"):
            hash_split(ray.data.from_pandas(df), ["uid"], [90, 80], ["a", "b", "c"])
        with pytest.raises(ValueError, match="names"):
            hash_split(ray.data.from_pandas(df), ["uid"], [50], ["a", "b", "c"])


class TestBigramAndInvertedIndex:
    """bigram_topk / inverted_index ≡ single-process Python reference,
    invariant to input partitioning."""

    DOCS = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a dog and a cat",
        "dog eats dog world",
        "",
        "one-token",
    ]

    def _ds(self, parts):
        import pandas as pd
        import ray.data

        df = pd.DataFrame(
            {"doc_id": range(len(self.DOCS)), "text": self.DOCS}
        )
        return ray.data.from_pandas(df).repartition(parts)

    def test_bigram_topk_matches_reference(self, ray_session):
        from collections import Counter

        from web_graph_ray.functions.text import WORD_RE
        from web_graph_ray.stages.text import bigram_topk

        c = Counter()
        for d in self.DOCS:
            ts = WORD_RE.findall(d.lower())
            c.update(f"{a} {b}" for a, b in zip(ts, ts[1:]))
        exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for parts in (1, 4):
            got = bigram_topk(self._ds(parts), k=5)
            assert list(map(tuple, got[["bigram", "n"]].values)) == exp

    def test_inverted_index_matches_reference(self, ray_session):
        from collections import defaultdict

        from web_graph_ray.functions.text import WORD_RE
        from web_graph_ray.stages.text import inverted_index

        post = defaultdict(set)
        for i, d in enumerate(self.DOCS):
            for tok in set(WORD_RE.findall(d.lower())):
                post[tok].add(i)
        exp = [
            (tok, len(ids), ",".join(map(str, sorted(ids))))
            for tok, ids in sorted(post.items())
            if 2 <= len(ids) <= 3
        ]
        for parts in (1, 4):
            got = inverted_index(self._ds(parts), min_df=2, max_df=3, limit=100)
            assert list(map(tuple, got[["token", "df", "postings"]].values)) == exp
        # limit caps the output
        got = inverted_index(self._ds(2), min_df=1, max_df=99, limit=3)
        assert len(got) == 3


class TestTextFormats:
    """JSONL/CSV sink→source round-trips are exact, sharded (one file
    per block), and idempotent on rewrite."""

    def test_jsonl_roundtrip_adversarial_text(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data

        from web_graph_ray.sources.text_formats import read_jsonl, write_jsonl

        df = pd.DataFrame(
            {
                "doc_id": range(6),
                "text": [
                    "line\nbreak",
                    'quote " and \\ backslash',
                    "tab\tand é and \U0001f600",
                    "",
                    "trailing space ",
                    "null byte free but wide: ☃" * 40,
                ],
            }
        )
        out = str(tmp_path / "jl")
        write_jsonl(ray.data.from_pandas(df).repartition(3), out)
        import os

        shards = [f for f in os.listdir(out) if f.endswith(".json")]
        assert len(shards) >= 2  # sharded, never one giant file
        back = read_jsonl(out).to_pandas().sort_values("doc_id")
        assert back.reset_index(drop=True).equals(df)
        # idempotent rewrite: clean=True removes the previous run
        write_jsonl(ray.data.from_pandas(df.head(2)), out)
        assert read_jsonl(out).count() == 2

    def test_jsonl_gz_roundtrip_and_determinism(self, ray_session, tmp_path):
        """Gzip-JSONL shards round-trip the adversarial text exactly,
        are real gzip members, and shard bytes are deterministic
        (zeroed mtime + content-hash names ⇒ a rewrite of the same data
        produces the same file set)."""
        import gzip
        import os

        import pandas as pd
        import ray.data

        from web_graph_ray.sources.text_formats import read_jsonl_gz, write_jsonl_gz

        df = pd.DataFrame(
            {
                "doc_id": range(6),
                "text": [
                    "line\nbreak",
                    'quote " and \\ backslash',
                    "tab\tand é and \U0001f600",
                    "",
                    "trailing space ",
                    "null byte free but wide: ☃" * 40,
                ],
            }
        )
        out = str(tmp_path / "jlgz")
        write_jsonl_gz(ray.data.from_pandas(df).repartition(3), out)
        shards = sorted(f for f in os.listdir(out) if f.endswith(".jsonl.gz"))
        assert len(shards) >= 2  # sharded, never one giant file
        with open(os.path.join(out, shards[0]), "rb") as f:
            blob = f.read()
        assert blob[:2] == b"\x1f\x8b"  # real gzip member
        assert gzip.decompress(blob).endswith(b"\n") or b"{" in gzip.decompress(blob)
        back = read_jsonl_gz(out).to_pandas().sort_values("doc_id")
        assert back.reset_index(drop=True).equals(df)
        # determinism: rewriting the same blocks yields the same shard set
        write_jsonl_gz(ray.data.from_pandas(df).repartition(3), out)
        assert sorted(f for f in os.listdir(out) if f.endswith(".jsonl.gz")) == shards

    def test_jsonl_gz_empty_block_roundtrip(self, ray_session, tmp_path):
        """A block drained by a filter must not write a zero-byte shard
        (pyarrow's JSON reader rejects an empty stream): the roundtrip
        must survive empty blocks."""
        import pandas as pd
        import ray.data

        from web_graph_ray.sources.text_formats import read_jsonl_gz, write_jsonl_gz

        df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a", "b", "c"]})
        ds = ray.data.from_pandas(df).repartition(3).filter(
            lambda r: r["doc_id"] == 1
        )
        out = str(tmp_path / "jlgz_empty")
        write_jsonl_gz(ds, out)
        back = read_jsonl_gz(out).to_pandas()
        assert back["doc_id"].tolist() == [1]
        assert back["text"].tolist() == ["b"]

    def test_csv_roundtrip_numeric(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data

        from web_graph_ray.sources.text_formats import read_csv, write_csv

        df = pd.DataFrame({"k": [1, 2, 3], "v": [1.25, -2.5, 3.0]})
        out = str(tmp_path / "csv")
        write_csv(ray.data.from_pandas(df), out)
        back = read_csv(out).to_pandas().sort_values("k").reset_index(drop=True)
        assert (back["k"] == df["k"]).all()
        assert (back["v"].astype(float) == df["v"]).all()


class TestKeepBestPerCluster:
    def test_keep_best_policy_and_ties(self, ray_session):
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.dedup import keep_best_per_cluster

        clusters = pd.DataFrame(
            {
                "node": [1, 2, 3, 10, 11, 20],
                "label": [1, 1, 1, 10, 10, 20],
            }
        )
        quality = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 10, 11, 20, 99],
                "n_chars": [5, 9, 9, 4, 4, 7, 1000],  # 99 not clustered
            }
        )
        for parts in (1, 3):
            got = (
                keep_best_per_cluster(
                    ray.data.from_pandas(clusters).repartition(parts),
                    ray.data.from_pandas(quality).repartition(parts),
                    "n_chars",
                )
                .to_pandas()
                .sort_values("label")
                .reset_index(drop=True)
            )
            # cluster 1: score tie 9/9 between docs 2 and 3 → min id wins
            assert got[got["label"] == 1].iloc[0]["kept_doc_id"] == 2
            assert got[got["label"] == 1].iloc[0]["best_n_chars"] == 9
            assert got[got["label"] == 1].iloc[0]["n_members"] == 3
            # cluster 10: tie 4/4 → doc 10
            assert got[got["label"] == 10].iloc[0]["kept_doc_id"] == 10
            # singleton cluster 20 keeps itself; unclustered doc 99 absent
            assert got[got["label"] == 20].iloc[0]["kept_doc_id"] == 20
            assert len(got) == 3


class TestSetOpNullSemantics:
    def test_null_rows_compare_equal(self, ray_session):
        """SQL set operations treat NULLs as equal (DISTINCT grouping
        semantics, unlike join predicates) — the pandas merge path and
        the stable row hash both honor that."""
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import set_except, set_intersect

        a = pd.DataFrame({"k": [1.0, np.nan, 2.0], "s": ["x", None, "y"]})
        b = pd.DataFrame({"k": [np.nan, 3.0], "s": [None, "z"]})
        inter = set_intersect(
            ray.data.from_pandas(a).repartition(2), ray.data.from_pandas(b)
        ).to_pandas()
        assert len(inter) == 1 and pd.isna(inter.iloc[0]["k"])
        exc = set_except(
            ray.data.from_pandas(a), ray.data.from_pandas(b)
        ).to_pandas()
        ks = sorted(exc["k"].tolist())
        assert ks == [1.0, 2.0]


class TestBloomSemiJoin:
    """Bloom pre-filtered semi join: never false-negative, exact after
    the scrub pass, and the prune actually bites (the reason the
    operator exists)."""

    def test_no_false_negatives_and_fp_bounded(self):
        import numpy as np
        import pandas as pd

        from web_graph_ray.stages.relational import (
            _bloom_hashes,
            _bloom_positions,
            bloom_probe_mask,
        )

        m_bits, k = 1 << 16, 4
        keys = pd.DataFrame({"k": np.arange(0, 2000, 2)})  # evens
        bits = np.zeros(m_bits >> 3, dtype=np.uint8)
        h1, h2 = _bloom_hashes(keys, ["k"])
        pos = _bloom_positions(h1, h2, k, m_bits).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

        # every inserted key probes True
        assert bloom_probe_mask(keys, ["k"], bits, m_bits, k).all()
        # non-members (odds) mostly probe False: 1000 keys in 2^16 bits
        # at k=4 → fp ≈ (1 - e^{-4000/65536})^4 ≈ 1.2e-5; allow 1%
        others = pd.DataFrame({"k": np.arange(1, 20001, 2)})
        fp = bloom_probe_mask(others, ["k"], bits, m_bits, k).mean()
        assert fp < 0.01, fp

    def test_equals_exact_semi_join_and_prunes(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray
        import ray.data

        from web_graph_ray.stages.relational import (
            bloom_semi_join,
            bucket_semi_join,
            build_bloom,
            bloom_probe_mask,
        )

        rng = np.random.default_rng(11)
        big = pd.DataFrame(
            {"k": rng.integers(0, 5000, 20000), "v": rng.integers(0, 10, 20000)}
        )
        keys = pd.DataFrame({"k": rng.choice(5000, 120, replace=False)})
        big_ds = ray.data.from_pandas(big).repartition(6)
        keys_ds = ray.data.from_pandas(keys).repartition(2)

        got = (
            bloom_semi_join(big_ds, keys_ds, ["k"], m_bits=1 << 16)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        exp = (
            bucket_semi_join(big_ds, keys_ds, ["k"])
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        assert got.equals(exp)
        # the map-side prune drops the vast majority of probe rows
        bits = build_bloom(keys_ds, ["k"], m_bits=1 << 16)
        kept = bloom_probe_mask(big, ["k"], bits, 1 << 16, 4).mean()
        assert kept < 0.10, kept  # ~120/5000 selectivity + tiny fp


class TestNtileFromRank:
    def test_matches_duckdb_ntile(self):
        import duckdb
        import numpy as np

        from web_graph_ray.stages.relational import ntile_from_rank

        for n, t in [(1, 10), (3, 10), (7, 3), (25, 10), (1500, 10), (101, 7)]:
            sql = (
                duckdb.sql(
                    f"select ntile({t}) over (order by r) from "
                    f"(select unnest(range(1, {n + 1})) r)"
                )
                .df()
                .iloc[:, 0]
                .to_numpy()
            )
            mine = ntile_from_rank(np.arange(1, n + 1), n, t)
            assert (sql == mine).all(), (n, t)


class TestTableFingerprint:
    def test_partitioning_invariant(self, ray_session):
        """The fingerprint is a pure function of row CONTENT — any
        repartitioning / row order must produce identical bucket rows
        (the property that makes it a valid cross-copy audit)."""
        import __ray_entry__ as entrymod

        sf = "/root/testdata/sf0.01"
        a = entrymod.table_fingerprint_events(sf)
        b = entrymod.table_fingerprint_events(sf)  # independent plan
        assert a.equals(b)
        assert a["n_rows"].sum() == 10000
        assert (a["checksum"] >= 0).all()


class TestValueBands:
    def test_matches_local_single_linkage(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import value_bands

        rng = np.random.default_rng(9)
        # three well-separated clusters + duplicates
        v = np.concatenate([
            rng.uniform(0, 10, 400), rng.uniform(100, 120, 300),
            rng.uniform(500, 501, 200), [505.0, 505.0],
        ])
        ds = ray.data.from_pandas(pd.DataFrame({"x": v})).repartition(7)
        got = value_bands(ds, "x", eps=5.0)

        sv = np.sort(v)
        brk = np.flatnonzero(np.diff(sv) > 5.0) + 1
        bands = np.split(sv, brk)
        assert len(got) == len(bands)
        for row, seg in zip(got.itertuples(index=False), bands):
            assert row.n_rows == len(seg)
            assert row.lo == seg[0] and row.hi == seg[-1]

    def test_degenerate_eps_guard(self, ray_session):
        import numpy as np
        import pandas as pd
        import pytest
        import ray.data

        from web_graph_ray.stages.relational import value_bands

        ds = ray.data.from_pandas(
            pd.DataFrame({"x": np.arange(0, 5000, dtype="float64") * 10})
        )
        with pytest.raises(ValueError, match="max_segments"):
            value_bands(ds, "x", eps=1.0, max_segments=100)


class TestBloomDtypeParity:
    def test_int32_keys_probe_int64(self, ray_session):
        """hash_pandas_object hashes raw native-width bytes, so an
        int32-keyed build probed by int64 keys would false-negative
        every match without the cast_to alignment — the silent-drop bug
        class bucket_semi_join already defends against."""
        import numpy as np
        import pandas as pd
        import ray.data

        from web_graph_ray.stages.relational import bloom_semi_join, bucket_semi_join

        big = pd.DataFrame(
            {"k": np.arange(-500, 500, dtype=np.int64), "v": np.arange(1000)}
        )
        keys = pd.DataFrame({"k": np.arange(-500, 500, 7, dtype=np.int32)})
        big_ds = ray.data.from_pandas(big).repartition(4)
        keys_ds = ray.data.from_pandas(keys).repartition(2)
        got = (
            bloom_semi_join(big_ds, keys_ds, ["k"], m_bits=1 << 14)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        exp = (
            bucket_semi_join(big_ds, keys_ds, ["k"])
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert len(exp) == len(keys)  # sanity: the exact path matches all keys
        assert got.equals(exp)
