"""JSONL / CSV interchange: the corpus exchange formats around Parquet.

LLM training corpora move as newline-delimited JSON (one document per
line) and occasionally CSV; the reference ingests from Postgres only
(pkg/linkstorage/linkstorage.go), so this module is new surface.  Both
directions stay distributed: ``ray.data``'s native readers/writers emit
one file per block (never one giant file), so a 100 TB corpus reads and
writes as parallel shards with the streaming executor's backpressure.

Fidelity notes:
- JSONL round-trips strings exactly (JSON escapes newlines, quotes and
  non-BMP codepoints inside documents) — the safe format for `text`.
- CSV round-trips numerics; timestamps/embedded newlines need quoting
  rules pinned, so prefer JSONL for text-bearing tables.
"""

from __future__ import annotations

import os
import shutil

import ray
import ray.data

__all__ = ["write_jsonl", "read_jsonl", "write_csv", "read_csv"]


def write_jsonl(ds: "ray.data.Dataset", out_dir: str, clean: bool = True) -> str:
    """Write ``ds`` as newline-delimited JSON, one ``.json`` shard per
    block (Ray Data's write_json is JSONL: pandas ``to_json(orient=
    "records", lines=True)`` per block).  ``clean`` removes a previous
    run's directory first so re-runs are idempotent."""
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    ds.write_json(out_dir)
    return out_dir


def read_jsonl(path: str, **kwargs) -> "ray.data.Dataset":
    """Read newline-delimited JSON shards (pyarrow ``read_json`` per
    file — parallel across files, Arrow-native blocks)."""
    return ray.data.read_json(path, **kwargs)


def write_csv(ds: "ray.data.Dataset", out_dir: str, clean: bool = True) -> str:
    """Write ``ds`` as CSV, one shard per block."""
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    ds.write_csv(out_dir)
    return out_dir


def read_csv(path: str, **kwargs) -> "ray.data.Dataset":
    """Read CSV shards (pyarrow CSV reader per file)."""
    return ray.data.read_csv(path, **kwargs)


def write_ipc(ds: "ray.data.Dataset", out_dir: str, clean: bool = True) -> str:
    """Write ``ds`` as Arrow IPC (Feather V2) shards, one ``.arrow``
    file per block — the zero-copy interchange format between Arrow
    runtimes.  Shard names are content hashes (SHA-1 of the serialized
    stream), written tmp+rename, so re-runs are idempotent and a
    partial failure never leaves a torn file."""
    import hashlib

    import pyarrow as pa
    import pyarrow.feather as feather

    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def w(t: "pa.Table") -> "pa.Table":
        sink = pa.BufferOutputStream()
        feather.write_feather(t, sink, compression="uncompressed")
        buf = sink.getvalue()
        name = hashlib.sha1(buf.to_pybytes()).hexdigest()[:24]
        final = os.path.join(out_dir, f"{name}.arrow")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.to_pybytes())
        os.replace(tmp, final)
        return pa.table({"file": pa.array([final]), "rows": pa.array([len(t)])})

    ds.map_batches(w, batch_format="pyarrow").materialize()
    return out_dir


def read_ipc(path: str) -> "ray.data.Dataset":
    """Read Arrow IPC shards back as a Dataset: the shard list fans out
    as items, each task deserializes its files with the Feather reader
    (zero-copy into Arrow blocks)."""
    import pyarrow as pa
    import pyarrow.feather as feather

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".arrow")
    )

    def rd(batch: "pa.Table") -> "pa.Table":
        tables = [feather.read_table(f) for f in batch["item"].to_pylist()]
        return pa.concat_tables(tables)

    return ray.data.from_items(files).map_batches(rd, batch_format="pyarrow")
