"""Checkpoint layout + atomic per-partition writes (north_rule: resumable
from per-partition checkpoints with lineage + metrics).

Work-dir layout (all Parquet unless noted):

    work/
      corpus_idx/bucket=NNNN.parquet      one-time corpus index, host-bucket
                                          partitioned, page_id-sorted (enables
                                          row-group-pruned "fetch" reads)
      corpus_idx/MANIFEST.json
      corpus_idx/robots_parts/bucket=NNNN.parquet
                                          per-bucket robots.txt bodies
                                          (hostname, html) — parsed into
                                          [allow, prefix] rule groups
                                          inside admit tasks, cached per
                                          worker (no driver-side dict)
      rounds/round=RRRRRR/
        frontier/novel/bucket=NNNN.parquet      ← written by round R-1's probe
        frontier/deferred/bucket=NNNN.parquet   ← written by round R-1's admit
        visited_delta/bucket=NNNN.parquet       admitted+denied rows (seen-set delta)
        emissions/*.parquet                     visit+text+link rows (one sink)
        MANIFEST.json                           commit record: counters + lineage

A round is COMMITTED iff its MANIFEST exists; the manifest is written
last, after every sidecar and the emissions sink.  All sidecar writes
go through ``atomic_write_parquet`` (tmp + rename) and are
deterministic functions of committed inputs, so re-running a crashed
round simply overwrites identical files — resume = "find last round
with a manifest, run round+1".

The reference's counterpart is much weaker: its LevelDB queue survives
restarts but the seen-cache does not (``pkg/linkcache/linkcache.go:21-26``),
so a restarted reference crawler refetches; this engine resumes exactly
(tested: resumed run ≡ uninterrupted run).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "round_dir",
    "frontier_dirs",
    "atomic_write_parquet",
    "atomic_write_json",
    "read_json",
    "last_committed_round",
    "list_bucket_files",
]


def round_dir(work: str, rnd: int) -> str:
    return os.path.join(work, "rounds", f"round={rnd:06d}")


def frontier_dirs(work: str, rnd: int) -> tuple[str, str]:
    rd = round_dir(work, rnd)
    return os.path.join(rd, "frontier", "novel"), os.path.join(rd, "frontier", "deferred")


def atomic_write_parquet(
    table: pa.Table,
    path: str,
    sort_by=None,
    row_group_size: int | None = None,
) -> None:
    """Write a parquet file atomically (tmp + rename). Idempotent for
    deterministic content — safe under Ray task retries.  ``sort_by``
    is a column name or a list of columns; small ``row_group_size``
    makes point reads with ``filters=`` prune within the file."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if sort_by is not None and table.num_rows > 1:
        table = table.sort_by(sort_by)
    tmp = path + f".tmp.{os.getpid()}"
    if row_group_size is not None:
        pq.write_table(table, tmp, row_group_size=row_group_size)
    else:
        pq.write_table(table, tmp)
    os.replace(tmp, path)


def atomic_write_json(obj, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_json(path: str):
    with open(path) as f:
        return json.load(f)


def last_committed_round(work: str) -> int | None:
    """Highest round with a MANIFEST.json, or None."""
    rounds_root = os.path.join(work, "rounds")
    if not os.path.isdir(rounds_root):
        return None
    best = None
    for name in os.listdir(rounds_root):
        if not name.startswith("round="):
            continue
        if os.path.exists(os.path.join(rounds_root, name, "MANIFEST.json")):
            r = int(name.split("=")[1])
            best = r if best is None or r > best else best
    return best


def list_bucket_files(root: str) -> list[str]:
    """All bucket=*.parquet files under a sidecar dir (sorted)."""
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.startswith("bucket=") and f.endswith(".parquet")
    )


def bucket_file(root: str, bucket: int) -> str:
    return os.path.join(root, f"bucket={bucket:04d}.parquet")
