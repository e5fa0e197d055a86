"""global_prefix_max scan primitive: exact agreement with a local
exclusive running max, bucket-count invariance, and the neutral
first-row contract."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from web_graph_ray.stages.relational import global_prefix_max


def reference(order, vals, neutral):
    idx = np.argsort(order, kind="mergesort")
    v = np.asarray(vals)[idx]
    excl = np.concatenate(([neutral], np.maximum.accumulate(v)[:-1]))
    out = np.empty_like(excl)
    out[idx] = excl
    return out


@pytest.mark.parametrize("num_buckets", [2, 7, 64])
def test_matches_reference(num_buckets, ray_session):
    rng = np.random.RandomState(11)
    n = 500
    order = rng.permutation(n).astype("int64")
    vals = rng.randint(-(10**12), 10**12, size=n).astype("int64")
    df = pd.DataFrame({"k": order, "v": vals})
    out = (
        global_prefix_max(
            ray.data.from_pandas(df), "k", "v", num_buckets=num_buckets
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = reference(order, vals, -(2**62))
    got = out.sort_values("k")["prefix_max"].to_numpy()
    want = ref[np.argsort(order, kind="mergesort")]
    np.testing.assert_array_equal(got, want)


def test_neutral_and_monotone(ray_session):
    df = pd.DataFrame({"k": [3, 1, 2], "v": [5, 9, 1]})
    out = (
        global_prefix_max(ray.data.from_pandas(df), "k", "v", num_buckets=2)
        .to_pandas()
        .sort_values("k")
    )
    assert out["prefix_max"].tolist() == [-(2**62), 9, 9]


def test_large_us_timestamps_exact(ray_session):
    """2024-epoch µs values exceed float64 exact ints — the scan must
    stay int64-exact end to end."""
    base = 1_720_000_000_000_000
    df = pd.DataFrame(
        {"k": [1, 2, 3, 4], "v": [base + 3, base + 1, base + 7, base + 2]}
    )
    out = (
        global_prefix_max(ray.data.from_pandas(df), "k", "v", num_buckets=3)
        .to_pandas()
        .sort_values("k")
    )
    assert out["prefix_max"].tolist() == [-(2**62), base + 3, base + 3, base + 7]
