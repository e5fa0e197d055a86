"""Unit tests for the round-4 additions: byte-exact Levenshtein kernel,
length-banded edit-distance near-dup pairs, and the distributed Pareto
frontier (local-skyline combiner)."""

import random

import numpy as np
import pandas as pd
import pytest

import ray

from web_graph_ray.functions.text import levenshtein_bytes
from web_graph_ray.stages.dedup import edit_distance_pairs
from web_graph_ray.stages.relational import _skyline_mask, pareto_frontier


# ---------------------------------------------------------------------------
# levenshtein_bytes
# ---------------------------------------------------------------------------


def _lev_ref(a: bytes, b: bytes) -> int:
    """Plain full-matrix DP reference."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_bytes_matches_reference_and_band():
    rng = random.Random(11)
    alpha = "abXé日 Z01"
    cases = [
        ("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
        ("café", "cafe"), ("üü", "uu"),
    ]
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 25)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 25)))
        cases.append((a, b))
    for a, b in cases:
        ab, bb = a.encode(), b.encode()
        want = _lev_ref(ab, bb)
        assert levenshtein_bytes(ab, bb) == want
        for cap in (0, 1, 2, 4, 7):
            assert levenshtein_bytes(ab, bb, max_dist=cap) == min(want, cap + 1)


def test_levenshtein_bytes_is_byte_level():
    # DuckDB semantics: 'café'→'cafe' is 2 (é is 2 UTF-8 bytes), not 1
    assert levenshtein_bytes("café".encode(), "cafe".encode()) == 2


# ---------------------------------------------------------------------------
# skyline mask + pareto_frontier
# ---------------------------------------------------------------------------


def _brute_skyline(v: np.ndarray) -> np.ndarray:
    n = len(v)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i != j and (v[j] >= v[i]).all() and (v[j] > v[i]).any():
                keep[i] = False
                break
    return keep


@pytest.mark.parametrize("d", [1, 2, 3])
def test_skyline_mask_matches_brute_force(d):
    rng = np.random.default_rng(5 + d)
    for _ in range(20):
        # small integer grid forces plenty of ties and duplicates
        v = rng.integers(0, 6, size=(rng.integers(1, 60), d)).astype("float64")
        got = _skyline_mask(v)
        want = _brute_skyline(v)
        assert (got == want).all()


def test_pareto_frontier_distributed_matches_brute(ray_session):
    rng = np.random.default_rng(42)
    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "price": rng.integers(0, 500, n).astype("float64"),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="m"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(16)
    out = (
        pareto_frontier(ds, maximize=["price"], minimize=["ts"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    v = np.column_stack(
        [df["price"].to_numpy(), -df["ts"].to_numpy().astype("int64").astype("float64")]
    )
    want = df[_brute_skyline(v)].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)


def test_pareto_frontier_ties_all_survive(ray_session):
    # two identical optimal rows: neither dominates, both stay
    df = pd.DataFrame({"id": [0, 1, 2], "a": [5.0, 5.0, 1.0], "b": [5.0, 5.0, 9.0]})
    ds = ray.data.from_pandas(df).repartition(3)
    out = pareto_frontier(ds, maximize=["a", "b"]).to_pandas()
    assert sorted(out["id"]) == [0, 1, 2]


def test_pareto_frontier_rejects_nan(ray_session):
    df = pd.DataFrame({"a": [1.0, np.nan], "b": [2.0, 3.0]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="NaN"):
        pareto_frontier(ds, maximize=["a", "b"]).to_pandas()


def test_pareto_frontier_candidate_guard(ray_session):
    # perfectly anti-correlated: every row is on the frontier
    n = 200
    df = pd.DataFrame({"a": np.arange(n, dtype="float64"),
                       "b": -np.arange(n, dtype="float64")})
    ds = ray.data.from_pandas(df).repartition(4)
    with pytest.raises(Exception, match="max_candidate_rows"):
        pareto_frontier(ds, maximize=["a", "b"], max_candidate_rows=50).to_pandas()
    # and succeeds when the cap allows it
    out = pareto_frontier(ds, maximize=["a", "b"], max_candidate_rows=500).to_pandas()
    assert len(out) == n


# ---------------------------------------------------------------------------
# edit_distance_pairs
# ---------------------------------------------------------------------------


def _brute_pairs(texts, prefix_len, max_dist):
    want = set()
    items = sorted(texts.items())
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            a, ta = items[i]
            b, tb = items[j]
            d = _lev_ref(ta[:prefix_len].encode(), tb[:prefix_len].encode())
            if d <= max_dist:
                want.add((a, b, d))
    return want


@pytest.mark.parametrize("num_buckets", [1, 7])
def test_edit_distance_pairs_matches_brute_force(ray_session, num_buckets):
    rng = random.Random(3)
    alpha = "abcdé"
    texts = {}
    base = "the quick brown fox jumps over the lazy dog"
    for i in range(120):
        t = list(base[: rng.randrange(5, 40)])
        for _ in range(rng.randrange(0, 7)):
            op = rng.randrange(3)
            pos = rng.randrange(len(t)) if t else 0
            if op == 0 and t:
                t[pos] = rng.choice(alpha)
            elif op == 1:
                t.insert(pos, rng.choice(alpha))
            elif t:
                del t[pos]
        texts[i] = "".join(t)
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ds = ray.data.from_pandas(df).repartition(5)
    out = edit_distance_pairs(
        ds, prefix_len=32, max_dist=4, num_buckets=num_buckets
    ).to_pandas()
    got = set(zip(out["a"], out["b"], out["dist"]))
    assert got == _brute_pairs(texts, 32, 4)
    # every pair exactly once
    assert not out.duplicated(["a", "b"]).any()


def test_edit_distance_pairs_band_guard(ray_session):
    df = pd.DataFrame({"doc_id": range(40), "text": ["xxxxxxxx"] * 40})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="max_band_rows"):
        edit_distance_pairs(ds, max_dist=3, max_band_rows=10).to_pandas()


class TestBlockedSimilarityPairs:
    """prefix_blocked_pairs + the DuckDB-exact JW / Damerau scorers."""

    def test_metrics_match_duckdb_fuzz(self):
        import random

        import duckdb

        from web_graph_ray.functions.text import (
            damerau_levenshtein_bytes,
            jaro_winkler_bytes,
        )

        con = duckdb.connect()
        rng = random.Random(3)
        for _ in range(400):
            s1 = "".join(
                rng.choice("abcdeé💡 xyz") for _ in range(rng.randint(0, 12))
            )
            s2 = "".join(
                rng.choice("abcdeé💡 xyz") for _ in range(rng.randint(0, 12))
            )
            wd, wj = con.execute(
                "select damerau_levenshtein(?, ?),"
                " jaro_winkler_similarity(?, ?)",
                [s1, s2, s1, s2],
            ).fetchone()
            assert damerau_levenshtein_bytes(s1.encode(), s2.encode()) == wd
            assert jaro_winkler_bytes(s1.encode(), s2.encode()) == wj

    def test_textbook_vectors(self):
        import pytest

        from web_graph_ray.functions.text import (
            damerau_levenshtein_bytes as dl,
            jaro_winkler_bytes as jw,
        )

        assert dl(b"CA", b"ABC") == 2  # unrestricted, not OSA's 3
        assert dl(b"ab", b"ba") == 1
        assert jw(b"DWAYNE", b"DUANE") == pytest.approx(0.84)
        assert jw(b"DIXON", b"DICKSONX") == pytest.approx(0.8133333333333332)
        # the C++ integer-truncated transposition count (raw 3 -> 1)
        assert jw(b"cba", b"acbaab") == pytest.approx(0.7222222222222222)
        assert jw(b"", b"") == 0.0 and jw(b"", b"abc") == 0.0

    def test_blocked_pairs_parallelism_invariance(self, ray_session):
        import numpy as np
        import pandas as pd

        import ray.data
        from web_graph_ray.functions.text import jaro_winkler_bytes
        from web_graph_ray.stages.dedup import prefix_blocked_pairs

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(40, dtype="int64"),
                "text": [
                    f"prefix{i % 5} common tail {i}" for i in range(40)
                ],
            }
        )

        def run(parts):
            return (
                prefix_blocked_pairs(
                    ray.data.from_pandas(docs).repartition(parts),
                    score_fn=jaro_winkler_bytes,
                    keep_fn=lambda s: s >= 0.8,
                    prefix_len=24,
                    block_chars=4,
                    score_name="jw",
                )
                .to_pandas()
                .sort_values(["doc_id_a", "doc_id_b"])
                .reset_index(drop=True)
            )

        a, b = run(1), run(8)
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)

    def test_blocked_pairs_drop_null_text(self, ray_session):
        """NULL-text docs must never pair: the SQL twins' substr join
        predicate is NULL-strict, so two null-text docs sharing the ""
        block would diverge from the oracle (ADVICE r4). Null rows are
        dropped before blocking; identical non-null rows still pair."""
        import pandas as pd

        import pyarrow as pa
        import ray.data
        from web_graph_ray.functions.text import jaro_winkler_bytes
        from web_graph_ray.stages.dedup import prefix_blocked_pairs

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(
                    [None, None, "alpha beta gamma", "alpha beta gamma"],
                    type=pa.string(),
                ),
            }
        )
        out = (
            prefix_blocked_pairs(
                ray.data.from_arrow(tbl),
                score_fn=jaro_winkler_bytes,
                keep_fn=lambda s: s >= 0.8,
                score_name="jw",
            )
            .to_pandas()
            .sort_values(["doc_id_a", "doc_id_b"])
            .reset_index(drop=True)
        )
        # only the non-null identical pair survives; no (1,2) null pair
        assert out["doc_id_a"].tolist() == [3]
        assert out["doc_id_b"].tolist() == [4]

    def test_blocked_pairs_hot_block_guard(self, ray_session):
        import numpy as np
        import pandas as pd

        import pytest
        import ray.data
        from web_graph_ray.functions.text import jaro_winkler_bytes
        from web_graph_ray.stages.dedup import prefix_blocked_pairs

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(30, dtype="int64"),
                "text": ["same prefix everywhere"] * 30,
            }
        )
        with pytest.raises(Exception, match="max_block_rows"):
            prefix_blocked_pairs(
                ray.data.from_pandas(docs),
                score_fn=jaro_winkler_bytes,
                keep_fn=lambda s: s >= 0.9,
                max_block_rows=10,
            ).to_pandas()
