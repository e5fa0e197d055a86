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

__all__ = ["write_partitioned", "finished_partitions"]


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
