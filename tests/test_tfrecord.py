"""TFRecord sink/source: CRC-32C vectors, Example wire-format
round-trip, and torn-shard detection (sources/text_formats.py)."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from web_graph_ray.sources.text_formats import (
    crc32c,
    read_tfrecord,
    write_tfrecord,
)


def test_crc32c_known_vectors():
    # RFC 3720 §B.4 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_roundtrip_exact(ray_session, tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([1, -5, 2**40], pa.int64()),
            "text": pa.array(["alpha", "", "emoji \U0001f600 nl\nq\"e"]),
            "score": pa.array([1.5, -2.25, 0.0], pa.float64()),
        }
    )
    out = str(tmp_path / "tf")
    write_tfrecord(ray.data.from_arrow(t), out)
    back = read_tfrecord(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == exp["doc_id"].tolist()
    assert [b.decode() for b in back["text"]] == exp["text"].tolist()
    # FloatList is float32 by format design
    assert back["score"].dtype == "float32"
    assert back["score"].tolist() == pytest.approx(exp["score"].tolist())


def test_corruption_detected(ray_session, tmp_path):
    t = pa.table({"x": pa.array([7, 8, 9], pa.int64())})
    out = str(tmp_path / "tf")
    write_tfrecord(ray.data.from_arrow(t), out)
    shard = glob.glob(os.path.join(out, "*.tfrecord"))[0]
    data = bytearray(open(shard, "rb").read())
    data[-3] ^= 0xFF  # flip a payload byte
    open(shard, "wb").write(bytes(data))
    with pytest.raises(Exception, match="CRC mismatch"):
        read_tfrecord(out).to_pandas()


def test_unsupported_type_raises(ray_session, tmp_path):
    t = pa.table({"ts": pa.array([pd.Timestamp("2024-01-01")])})
    with pytest.raises(Exception, match="unsupported column type"):
        write_tfrecord(ray.data.from_arrow(t), str(tmp_path / "tf"))


def test_null_cells_roundtrip_as_null(ray_session, tmp_path):
    """Nulls encode as present-but-EMPTY typed lists (tf.train.Example
    has no null) and decode back to null — distinguishable from an
    empty string, and the write must not crash on them."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["alpha", None, ""], pa.string()),
            "n": pa.array([10, None, 30], pa.int64()),
            "score": pa.array([1.5, None, 0.0], pa.float64()),
        }
    )
    out = str(tmp_path / "tf")
    write_tfrecord(ray.data.from_arrow(t), out)
    back = read_tfrecord(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["text"].tolist() == [b"alpha", None, b""]
    # pandas surfaces a null int64 as NaN (float64) — check via isna
    assert back["n"].iloc[0] == 10 and back["n"].iloc[2] == 30
    assert pd.isna(back["n"].iloc[1])
    got = back["score"].tolist()
    assert got[0] == pytest.approx(1.5) and got[2] == 0.0
    assert got[1] is None or got[1] != got[1]  # null (pandas may NaN it)


def test_empty_block_writes_no_shard(ray_session, tmp_path):
    """A block drained by a filter must not produce a zero-row shard."""
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(3).filter(lambda r: r["x"] == 2)
    out = str(tmp_path / "tf")
    write_tfrecord(ds, out)
    back = read_tfrecord(out).to_pandas()
    assert back["x"].tolist() == [2]
