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
