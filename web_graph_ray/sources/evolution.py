"""Schema-evolution parquet reading: union-by-name over shards whose
schemas drifted (columns added/dropped between pipeline versions).

A long-lived 100 TB corpus is never written by one code version:
early shards lack columns later ones carry.  `ray.data.read_parquet`
assumes one schema; this source unifies shard schemas from FOOTERS
ONLY (O(files) metadata reads, no data IO) and pads each shard's
missing columns with typed nulls — DuckDB's ``union_by_name``
semantics, kept distributed (the shard list fans out as items, each
task reads only its files).

Scale note: the unified schema is computed once on the driver and
captured by the task closure (bytes, not data); at 10^6 shards the
footer scan itself can be parallelized — not done here because footer
reads are ~1 ms each and read planning already touches every footer.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

__all__ = ["read_parquet_evolved"]


def read_parquet_evolved(path: str) -> "ray.data.Dataset":
    """Read every ``*.parquet`` under ``path`` (recursively) as ONE
    Dataset with the union-by-name schema; columns a shard lacks are
    null of the unified type.  Conflicting physical types for the same
    column raise (pa.unify_schemas) rather than silently coercing."""
    files = sorted(
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"read_parquet_evolved: no shards under {path}")
    unified = pa.unify_schemas([pq.read_schema(f) for f in files])

    def rd(batch: "pa.Table") -> "pa.Table":
        out = []
        for fp in batch["item"].to_pylist():
            t = pq.read_table(fp)
            arrays = []
            for field in unified:
                if field.name in t.column_names:
                    arrays.append(
                        t[field.name].combine_chunks().cast(field.type)
                    )
                else:
                    arrays.append(pa.nulls(t.num_rows, field.type))
            out.append(pa.Table.from_arrays(arrays, schema=unified))
        return pa.concat_tables(out)

    return ray.data.from_items(files).map_batches(rd, batch_format="pyarrow")
