"""Union-by-name parquet reading across drifted shard schemas
(sources/evolution.py::read_parquet_evolved)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from web_graph_ray.sources.evolution import read_parquet_evolved


def test_null_fill_and_union(ray_session, tmp_path):
    pq.write_table(
        pa.table({"a": pa.array([1, 2], pa.int64()),
                  "b": pa.array(["x", "y"])}),
        str(tmp_path / "v1.parquet"),
    )
    pq.write_table(
        pa.table({"a": pa.array([3], pa.int64()),
                  "c": pa.array([9.5], pa.float64())}),
        str(tmp_path / "v2.parquet"),
    )
    df = (
        read_parquet_evolved(str(tmp_path))
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert sorted(df.columns) == ["a", "b", "c"]
    assert df["a"].tolist() == [1, 2, 3]
    assert df["b"].tolist()[:2] == ["x", "y"] and df["b"].isna().tolist()[2]
    assert df["c"].isna().tolist()[:2] == [True, True]
    assert df["c"].iloc[2] == 9.5


def test_conflicting_types_raise(ray_session, tmp_path):
    pq.write_table(pa.table({"a": pa.array([1], pa.int64())}),
                   str(tmp_path / "x.parquet"))
    pq.write_table(pa.table({"a": pa.array(["s"])}),
                   str(tmp_path / "y.parquet"))
    with pytest.raises(Exception):
        read_parquet_evolved(str(tmp_path))


def test_empty_dir_raises(ray_session, tmp_path):
    os.makedirs(tmp_path / "nothing", exist_ok=True)
    with pytest.raises(FileNotFoundError):
        read_parquet_evolved(str(tmp_path / "nothing"))
