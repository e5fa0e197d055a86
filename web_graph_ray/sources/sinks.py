"""Resumable partitioned Parquet sink.

The crawl engine writes its state as hive-partitioned, manifest-committed
Parquet (pipelines/crawl.py); this module exposes the same idiom as a
GENERIC sink any pipeline can use: output lands as one directory per
partition key value, each committed atomically (tmp file + rename) and
recorded in a manifest, so a re-run after a failure skips finished
partitions instead of rewriting the world (the brief's "resumable
output" requirement, generalized).

Scale shape: the one exchange is the partition-key bucketing (the same
``bucketed_group_map`` co-partition every wide operator here uses); each
bucket task writes only its own partitions' files.  The manifest is one
small JSON per partition — no driver-held state, no global commit lock.
"""

from __future__ import annotations

import json
import os

import pandas as pd

import ray
import ray.data

__all__ = [
    "write_partitioned",
    "finished_partitions",
    "committed_snapshot",
    "read_partitions",
    "read_incremental",
]


def finished_partitions(out_dir: str) -> set[str]:
    """Partition values already committed under ``out_dir`` (manifest
    present = data file fully written and renamed)."""
    mdir = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(mdir):
        return set()
    return {f[:-5] for f in os.listdir(mdir) if f.endswith(".json")}


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    partition_col: str,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Write ``ds`` as ``out_dir/<partition_col>=<value>/part.parquet``,
    one atomic commit per partition value; already-committed partitions
    (from a previous, possibly failed run) are SKIPPED — re-running
    after a crash finishes only the remainder.  Returns a summary frame
    (partition, rows, skipped).

    Precondition: a partition value's rows must be wholly inside one
    run's input (the usual shard/day/key-range layout) — the unit of
    idempotence is the partition, as in the crawl's round manifests."""
    from ..stages.relational import bucketed_group_map

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    done = finished_partitions(out_dir)

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for val, sub in df.groupby(partition_col, sort=True):
            key = str(val)
            mpath = os.path.join(out_dir, "_manifests", f"{key}.json")
            if key in done or os.path.exists(mpath):
                rows.append({"partition": key, "rows": 0, "skipped": True})
                continue
            pdir = os.path.join(out_dir, f"{partition_col}={key}")
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, ".part.parquet.tmp")
            sub.to_parquet(tmp, index=False)
            os.replace(tmp, os.path.join(pdir, "part.parquet"))
            with open(mpath + ".tmp", "w") as f:
                json.dump({"partition": key, "rows": int(len(sub))}, f)
            os.replace(mpath + ".tmp", mpath)
            rows.append({"partition": key, "rows": int(len(sub)), "skipped": False})
        return pd.DataFrame(rows, columns=["partition", "rows", "skipped"])

    out = bucketed_group_map(
        ds, [partition_col], write_bucket, num_buckets=num_buckets
    ).to_pandas()
    return out.sort_values("partition").reset_index(drop=True)


def committed_snapshot(out_dir: str) -> list[str]:
    """The sink's committed partition keys, sorted — a consistent
    snapshot: a manifest exists iff its data file was fully renamed, so
    a reader never sees a torn partition regardless of concurrent
    writers."""
    return sorted(finished_partitions(out_dir))


def read_partitions(
    out_dir: str, partition_col: str, keys
) -> "ray.data.Dataset | None":
    """Dataset over exactly the given committed partition values —
    planning lists only those files, so nothing else is opened (the
    read-side mirror of the sink's partition pruning).  None when
    ``keys`` is empty."""
    files = [
        os.path.join(out_dir, f"{partition_col}={k}", "part.parquet")
        for k in sorted(set(map(str, keys)))
    ]
    if not files:
        return None
    return ray.data.read_parquet(files)


def read_incremental(out_dir: str, partition_col: str, cursor_path: str):
    """Exactly-once incremental consumption of the partitioned sink
    (the changelog-consumer idiom: Iceberg-style snapshot reads over
    the manifest list, with a consumer-side cursor).

    Returns ``(ds, new_keys, commit)``: ``ds`` covers the partitions
    committed since the cursor (None if nothing new), and ``commit()``
    atomically advances the cursor file to include them.  A consumer
    that crashes BEFORE commit re-reads the same partitions next time
    (at-least-once per attempt); committing only after its own output
    is durable makes consumption exactly-once per partition.  The
    cursor is one small JSON (O(#partitions) keys) — no scan of data
    files, no driver-held state."""
    done: set[str] = set()
    if os.path.exists(cursor_path):
        with open(cursor_path) as f:
            done = set(json.load(f)["processed"])
    new = [k for k in committed_snapshot(out_dir) if k not in done]
    ds = read_partitions(out_dir, partition_col, new)

    def commit() -> None:
        merged = sorted(done | set(new))
        d = os.path.dirname(cursor_path)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = cursor_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"processed": merged}, f)
        os.replace(tmp, cursor_path)

    return ds, new, commit
