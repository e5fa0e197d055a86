"""Relational / stream-shaped operators (joins, windows, sessions).

The reference has NO joins, sorts or windows (SURVEY.md §2.5) — its API
does point lookups only.  These are the generic operator forms the new
engine adds, each with a DuckDB-SQL twin in ``__ray_entry__``:

- broadcast (map-side) join: small side via ``ray.put`` → per-batch
  merge — no shuffle (the frontier⋈blocklist / dimension-table shape)
- partitioned hash join: ``Dataset.join`` (both sides large)
- semi / anti join: broadcast key set + vectorized is_in mask
- first-wins dedup: groupby key → min order-key row (D2/D3 generalized)
- tumbling-window aggregate + session windows: groupby(key) →
  per-group pandas over ts-sorted rows (Ray Data has no event-time
  windowing; the partition+sort-within-group formulation is the
  documented pattern, ordering assumption stated per function)
- as-of join: per-key merge_asof inside map_groups
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

__all__ = [
    "bucket_semi_join",
    "bucket_anti_join",
    "bucket_hash_join",
    "broadcast_join",
    "semi_join",
    "anti_join",
    "first_wins_dedup",
    "grouped_topk",
    "stratified_sample",
    "weighted_sample",
    "ordered_concat",
    "keyed_rank_stats",
    "mix_corpus",
    "global_rank",
    "global_prefix_sum",
    "exact_quantile",
    "grouped_quantile",
    "hopping_window_agg",
    "range_join",
    "tumbling_window_agg",
    "sessionize",
    "asof_join",
    "asof_join_partitioned",
    "rollup_agg",
    "funnel_steps",
    "skew_join",
    "cube_agg",
    "bucket_left_join",
    "bucket_full_join",
    "set_op",
    "set_intersect",
    "set_except",
    "hash_split",
    "pareto_frontier",
]


def bucketed_group_map(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    per_bucket_fn,
    num_buckets: int = 32,
    batch_partial=None,
) -> "ray.data.Dataset":
    """Grouped map over MANY small key groups without per-group UDF
    overhead: hash keys into ``num_buckets`` coarse buckets (stable
    cross-process via pd.util.hash_pandas_object), run one vectorized
    pandas function per bucket.  ``batch_partial`` optionally shrinks
    each batch before the shuffle (combiner pattern).

    Ray Data's groupby().map_groups() calls the UDF once per distinct
    key — fine for hundreds of groups, pathological for 10^5+ (e.g.
    first-wins dedup keyed by page_id).  This keeps identical semantics
    whenever ``per_bucket_fn`` is key-local (it sees every row of each
    key, since a key maps to exactly one bucket)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if batch_partial is not None:
            df = batch_partial(df)
        out = df.copy()
        for c in key_cols:
            if out[c].dtype.kind == "f":
                # -0.0 == +0.0 as a group key (pandas and SQL both
                # merge them), but hash_pandas_object hashes the BIT
                # PATTERN, so the two spellings would land in different
                # buckets and silently split the key; +0.0 normalizes
                out[c] = out[c] + 0.0
        h = pd.util.hash_pandas_object(out[key_cols], index=False).values
        out["_bucket"] = (h % num_buckets).astype("int64")
        return out

    def run_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return per_bucket_fn(df.drop(columns=["_bucket"]))

    # Coalesce to num_buckets blocks BEFORE the sort-based groupby: Ray
    # 2.49's Sort pays a large per-block fixed cost (measured 5 s for
    # 71k rows across 128 ragged map-output blocks; chained bucketed
    # ops produce exactly that shape), and the groupby already gathers
    # each bucket into ONE map_groups task, so capping the exchange at
    # num_buckets blocks changes no scale assumption — callers size
    # num_buckets so a bucket fits a task either way.  End-to-end this
    # took the 3-exchange Q3 chain from 24.7 s to 13.8 s at sf0.1.
    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(run_bucket, batch_format="pandas")
    )


def bucketed_agg(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    value_col: str | None = None,
    how: str = "count",
    out_col: str | None = None,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Aggregate over MANY distinct keys (10^5+): per-batch partial
    combiner + bucketed final.  Ray Data's native sort-based
    ``groupby().count()/min()`` degrades to ~10^5 rows/s past ~10^5
    groups (measured on 2.49) and can stall a fused plan; this keeps
    every step a vectorized pandas groupby.  ``how`` ∈ {count, sum,
    min, max}; out_col defaults to the Ray-Data-style name so swaps
    are drop-in ("count()" / "min(value_col)" / ...)."""
    if how == "count":
        out = out_col or "count()"

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(key_cols, as_index=False).size()
            return g.rename(columns={"size": out})

        def final(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(key_cols, as_index=False)[out].sum()

    else:
        assert value_col is not None, "value_col required for sum/min/max"
        out = out_col or f"{how}({value_col})"
        fn = {"sum": "sum", "min": "min", "max": "max"}[how]

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(key_cols, as_index=False)[value_col].agg(fn)
            return g.rename(columns={value_col: out})

        def final(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(key_cols, as_index=False)[out].agg(fn)

    return bucketed_group_map(
        ds, key_cols, final, num_buckets=num_buckets, batch_partial=partial
    )


def _pad_array(n: int, typ: "pa.DataType") -> "pa.Array":
    """Padding for the side that lacks a column.  Numeric types use a
    SENTINEL 0, not nulls: nulls force the arrow→pandas bucket frame to
    float64, which silently corrupts int64 payloads above 2^53 (e.g.
    64-bit shingle hashes).  The padded cells are never read — each
    side's rows are filtered out before use."""
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        return pa.repeat(pa.scalar(0, type=typ), n)
    return pa.nulls(n, typ)


def _as_arrow(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Normalize blocks to Arrow so Dataset.schema() yields pyarrow
    types (pandas-block datasets report numpy dtypes, which breaks
    typed null padding)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def bucket_semi_join(
    ds: "ray.data.Dataset",
    keys: "ray.data.Dataset",
    on: list[str],
    num_buckets: int = 32,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Partitioned semi join: left rows whose key tuple appears in
    ``keys`` (a Dataset holding exactly the key columns).  Both sides
    are co-partitioned by key hash through ONE union + bucketed group
    map — no broadcast, no driver state, and none of Ray 2.49's
    JoinOperator composition hazards (its aggregator-owned output
    blocks can be lost when fused with map/sort operators)."""
    ds = _as_arrow(ds)
    keys = _as_arrow(keys)
    schema = ds.schema()
    fields = {n: t for n, t in zip(schema.names, schema.types)}
    extra = [n for n in schema.names if n not in on]

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column("_side", pa.array([0] * t.num_rows, type=pa.int8()))

    def pad_right(t: pa.Table) -> pa.Table:
        arrays = [t[c].combine_chunks().cast(fields[c]) for c in on]
        arrays += [_pad_array(t.num_rows, fields[c]) for c in extra]
        arrays.append(pa.array([1] * t.num_rows, type=pa.int8()))
        return pa.Table.from_arrays(arrays, names=on + extra + ["_side"])

    left = ds.map_batches(tag_left, batch_format="pyarrow").select_columns(
        on + extra + ["_side"]
    )
    right = keys.map_batches(pad_right, batch_format="pyarrow")

    l_dtypes = {n: fields[n].to_pandas_dtype() for n in extra}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["_side"] == 1][on].drop_duplicates()
        l = df[df["_side"] == 0].drop(columns=["_side"])
        for c, dt in l_dtypes.items():
            # null padding from the other side upcasts ints to float in
            # the bucket frame; side-0 rows have no nulls — restore
            l[c] = l[c].astype(dt, copy=False)
        if anti:
            m = l.merge(r, on=on, how="left", indicator=True)
            return m[m["_merge"] == "left_only"].drop(columns=["_merge"])
        return l.merge(r, on=on, how="inner")

    return bucketed_group_map(
        left.union(right), on, per_bucket, num_buckets=num_buckets
    )


def bucket_anti_join(
    ds: "ray.data.Dataset",
    keys: "ray.data.Dataset",
    on: list[str],
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Partitioned anti join: left rows whose key tuple does NOT appear
    in ``keys`` — same co-partitioned union + bucketed group map as
    bucket_semi_join (the scale path when the exclusion key set is too
    large to broadcast, e.g. decontamination's contaminated-id set)."""
    return bucket_semi_join(ds, keys, on, num_buckets=num_buckets, anti=True)


def bucket_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Partitioned inner hash join via union + bucketed group map (same
    rationale as bucket_semi_join).  Output columns = left's, then
    right's non-key columns; right-side dtypes are restored after the
    per-bucket pandas merge (arrow→pandas null padding upcasts ints)."""
    left = _as_arrow(left)
    right = _as_arrow(right)
    l_names, lf = _names_types(left)
    r_names, rf = _names_types(right)
    if not l_names and not r_names:
        return left  # both sides all-empty: the join is empty
    l_extra = [n for n in l_names if n not in on]
    r_extra = [n for n in r_names if n not in on]
    overlap = set(l_extra) & set(r_extra)
    if overlap:
        raise ValueError(
            "bucket_hash_join: non-key columns must be disjoint "
            f"(shared: {sorted(overlap)}) — rename one side first"
        )
    all_cols = on + l_extra + r_extra

    def pad(side: int, have: dict):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                # an all-empty side can emit schema-less empty blocks
                # (no columns) — emit the typed empty target instead of
                # indexing columns that are not there
                return pa.Table.from_arrays(
                    [pa.array([], type=lf.get(c, rf.get(c))) for c in all_cols]
                    + [pa.array([], type=pa.int8())],
                    names=all_cols + ["_side"],
                )
            arrays = []
            for c in all_cols:
                typ = lf.get(c, rf.get(c))
                if c in have or c in on:
                    arrays.append(t[c].combine_chunks().cast(typ))
                else:
                    arrays.append(_pad_array(t.num_rows, typ))
            arrays.append(pa.array([side] * t.num_rows, type=pa.int8()))
            return pa.Table.from_arrays(arrays, names=all_cols + ["_side"])

        return f

    lds = left.map_batches(pad(0, set(l_extra)), batch_format="pyarrow")
    rds = right.map_batches(pad(1, set(r_extra)), batch_format="pyarrow")

    r_dtypes = {n: rf[n].to_pandas_dtype() for n in r_extra}
    l_dtypes = {n: lf[n].to_pandas_dtype() for n in l_extra}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0][on + l_extra].copy()
        r = df[df["_side"] == 1][on + r_extra].copy()
        # null padding from the opposite side upcasts ints to float in
        # the unified bucket frame; each side's own rows have no nulls —
        # restore the arrow dtypes before merging
        for c, dt in l_dtypes.items():
            l[c] = l[c].astype(dt, copy=False)
        for c, dt in r_dtypes.items():
            r[c] = r[c].astype(dt, copy=False)
        return l.merge(r, on=on, how="inner")

    return bucketed_group_map(
        lds.union(rds), on, per_bucket, num_buckets=num_buckets
    )


def broadcast_join(
    ds: "ray.data.Dataset",
    small_df: pd.DataFrame,
    on: str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Map-side join: the small side is put in the object store ONCE and
    merged into every batch — zero shuffle, the correct shape whenever
    one side fits in memory (dimension tables, seed lists, vocab)."""
    # a filtered-to-nothing to_pandas() loses its columns (Ray drops
    # block schema on all-empty datasets) — ship a None marker and
    # rebuild the key per batch with the PROBE side's dtype, so the
    # merge stays total: inner → empty, left → all-left
    ref = ray.put(
        None if (small_df.empty and on not in small_df.columns) else small_df
    )

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(ref)
        if sm is None:
            sm = pd.DataFrame({on: pd.Series([], dtype=df[on].dtype)})
        return df.merge(sm, on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas")


def _key_set_ref(keys) -> "ray.ObjectRef":
    return ray.put(pa.array(sorted(set(keys))))


def semi_join(ds: "ray.data.Dataset", on: str, keys) -> "ray.data.Dataset":
    """Keep rows whose key ∈ keys (broadcast Bloom-filter shape)."""
    ref = _key_set_ref(keys)

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[on], value_set=ray.get(ref)))

    return ds.map_batches(f, batch_format="pyarrow")


def anti_join(ds: "ray.data.Dataset", on: str, keys) -> "ray.data.Dataset":
    ref = _key_set_ref(keys)

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[on], value_set=ray.get(ref))))

    return ds.map_batches(f, batch_format="pyarrow")


def first_wins_dedup(
    ds: "ray.data.Dataset", key_cols: list[str], order_cols: str | list[str]
) -> "ray.data.Dataset":
    """One row per key: the minimum order_cols row.  Pass enough order
    columns to make the winner unique — ties would otherwise be decided
    by arrival order, which is nondeterministic under parallelism.
    This is D2/D3 (`ON CONFLICT DO NOTHING` with deterministic arrival
    order) as a generic operator.  Runs as per-batch combiner +
    bucketed final, so the shuffle carries ≤1 row per key per batch."""
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_cols, kind="mergesort").drop_duplicates(
            key_cols, keep="first"
        )

    return bucketed_group_map(ds, key_cols, first, batch_partial=first)


def tumbling_window_agg(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
) -> "ray.data.Dataset":
    """Per-key tumbling-window sum/count/mean.  Window = floor(epoch /
    window_sec); pre-aggregated per batch (partial) then a small
    groupby — the shuffle carries one row per (key, window) per batch."""

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(t[ts_col], pa.int64()), 1_000_000)
        win = pc.multiply(
            pc.floor(pc.divide(pc.cast(epoch, pa.float64()), window_sec)),
            float(window_sec),
        )
        tbl = pa.table(
            {
                key_col: t[key_col],
                "window_start": pc.cast(win, pa.int64()),
                "_v": t[value_col],
            }
        )
        g = pa.TableGroupBy(tbl, [key_col, "window_start"]).aggregate(
            [("_v", "sum"), ("_v", "count")]
        )
        return g.rename_columns([key_col, "window_start", "_sum", "_n"])

    def finalize(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "value_mean", pc.divide(t["value_sum"], pc.cast(t["n_events"], pa.float64()))
        )
        return t

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Sum("_sum", alias_name="value_sum"), Sum("_n", alias_name="n_events"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def sessionize(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    gap_sec: int,
) -> "ray.data.Dataset":
    """Session windows per key: events sorted by ts; a gap > gap_sec
    starts a new session.  Emits (key, session_start, session_end,
    n_events).  Ordering assumption: all events of one key fit one
    group (partition by key — the streaming-shaped pattern)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over a whole hash bucket of keys: sort by
        # (key, ts); a session break is a key change OR a gap > gap_sec
        df = df.sort_values([key_col, ts_col], kind="mergesort")
        ts = df[ts_col].astype("int64") // 1_000_000
        key_change = (df[key_col] != df[key_col].shift(1)).fillna(True)
        gap = (ts - ts.shift(1)).fillna(gap_sec + 1) > gap_sec
        sid = (key_change | gap).cumsum()
        out = df.assign(_sid=sid, _ts=ts).groupby("_sid").agg(
            **{
                key_col: (key_col, "first"),
                "session_start": ("_ts", "min"),
                "session_end": ("_ts", "max"),
                "n_events": ("_ts", "size"),
            }
        )
        return out.reset_index(drop=True)

    # bucketed_group_map, NOT groupby().map_groups: map_groups is one UDF
    # call per distinct key — pathological at 10^5+ users.  The bucket
    # kernel is key-local (each key hashes to one bucket) so semantics
    # are identical; the batch_partial projection prunes the shuffle to
    # the two needed columns.
    return bucketed_group_map(
        ds,
        [key_col],
        per_bucket,
        batch_partial=lambda df: df[[key_col, ts_col]],
    )


def keyed_lag(
    ds: "ray.data.Dataset",
    key_col: str,
    order_cols: list[str],
    lag_cols: list[str],
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-key LAG(1) navigation window: for every row, the PREVIOUS
    row's values of ``lag_cols`` under (key, order_cols) ordering —
    SQL's ``lag(c) over (partition by key order by ...)``.  Appends one
    ``{c}_prev`` column per lag col (null on each key's first row).

    Scale shape: one key-hash-bucketed exchange (bucketed_group_map —
    NOT one UDF call per key), then a single mergesort + groupby.shift
    per bucket, all vectorized.  Partitioning assumption: every row of
    a key lands in one bucket, so the per-bucket shift is exact."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, *order_cols], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        for c in lag_cols:
            df[c + "_prev"] = g[c].shift(1)
        return df

    return bucketed_group_map(ds, [key_col], per_bucket, num_buckets=num_buckets)


def keyed_running(
    ds: "ray.data.Dataset",
    key_col: str,
    order_cols: list[str],
    value_col: str,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-key running aggregate: cumulative sum of ``value_col`` and
    row number under (key, order_cols) ordering — SQL's
    ``sum(v) over (partition by key order by ... rows unbounded
    preceding)`` + ``row_number()``.  Appends ``running_sum`` / ``rn``.

    Accumulation is sequential left-to-right within each key (pandas
    groupby.cumsum), the same order as the SQL running frame, so
    float drift vs an oracle stays at rounding-noise level.  Same
    one-exchange bucket shape as keyed_lag."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, *order_cols], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        df["running_sum"] = g[value_col].cumsum()
        df["rn"] = (g.cumcount() + 1).astype("int64")
        return df

    return bucketed_group_map(ds, [key_col], per_bucket, num_buckets=num_buckets)


def keyed_ewma(
    ds: "ray.data.Dataset",
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-key exponentially-weighted moving average under (key,
    order_cols) ordering — the smoothing recursion ``s_t = α·v_t +
    (1−α)·s_{t−1}`` seeded ``s_0 = v_0`` (pandas ``ewm(adjust=False)``
    semantics).  Appends ``out_col``.

    Same one-exchange bucket shape as :func:`keyed_running`; the
    recursion itself runs in pandas' Cython ewm kernel per key.  The
    kernel computes ``(1−α)·s + α·v`` with ``1−α`` derived exactly as
    an oracle writing ``(1 - α)`` does, so a SQL recursive-CTE twin
    using the literal expression ``α·v + (1 - α)·s`` agrees bit-for-bit
    (IEEE addition is commutative).

    The recursion is inherently sequential per key; rows of one key
    must therefore fit one bucket task — the same partitioning
    assumption every keyed_* window here documents."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, *order_cols], kind="mergesort")
        # groupby.ewm runs the whole bucket in one Cython kernel — a
        # transform(lambda ...) would dispatch Python once per key,
        # the 10^5+-key pathology this module's other keyed_* ops avoid
        ew = (
            df.groupby(key_col, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False)
            .mean()
        )
        df[out_col] = ew.droplevel(0).to_numpy()
        return df

    return bucketed_group_map(ds, [key_col], per_bucket, num_buckets=num_buckets)


# right sides below this estimated size ride one ray.put broadcast (zero
# shuffle); above it the co-partitioned union path runs.  Module-level so
# scale-guard tests can force the partitioned path (same pattern as
# stages/dedup.py BROADCAST_BYTES).
ASOF_BROADCAST_BYTES = 64 << 20


def asof_join(
    left: "ray.data.Dataset",
    right,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_order: list[str] | None = None,
    num_buckets: int = 32,
    direction: str = "backward",
) -> "ray.data.Dataset":
    """As-of join: for each left row, the latest right row of
    the same key with right_ts <= left_ts (``direction="backward"``,
    the default), or the EARLIEST right row with right_ts >= left_ts
    (``direction="forward"``).  Ties on right_ts are broken by
    ``right_order`` (backward: last wins; forward: FIRST wins — the
    sort-adjacent row on either side; pass it whenever ties are
    possible, or the winner depends on arrival order).

    ``right`` may be a pandas DataFrame (always broadcast) or a Dataset:
    small Datasets (estimated < ASOF_BROADCAST_BYTES) are collected and
    broadcast once via ``ray.put`` — zero shuffle, the dimension-table
    shape; large ones take the co-partitioned path
    (``asof_join_partitioned``) — pad both schemas to a union schema,
    tag a side column, union → one key-hash-bucketed shuffle →
    vectorized ``pd.merge_asof`` per bucket.  Partitioning assumption:
    all rows of a key hash to one bucket, so per-bucket merge_asof is
    exact."""
    if not isinstance(right, pd.DataFrame):
        n_right = right.count()
        est = n_right * 16 * (len(right_cols) + 2)
        if est > ASOF_BROADCAST_BYTES:
            return asof_join_partitioned(
                left, right, key_col, left_ts, right_ts, right_cols,
                right_order=right_order, num_buckets=num_buckets,
                direction=direction,
            )
        right = right.to_pandas()
    # keep right_order columns through the sort even when they are not in
    # right_cols (the partitioned path's r_keep semantics), then project
    # the merge output back to left columns + right_cols so both paths
    # return the same layout regardless of the broadcast-size gate
    sel = list(dict.fromkeys([key_col, right_ts] + right_cols + (right_order or [])))
    r = right[sel].sort_values([right_ts] + (right_order or []), kind="mergesort")
    ref = ray.put(r)

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        rr = ray.get(ref).rename(columns={right_ts: left_ts})
        out = pd.merge_asof(
            df.sort_values(left_ts, kind="mergesort"),
            rr,
            on=left_ts,
            by=key_col,
            direction=direction,
            suffixes=("", "_r"),
        )
        return out[list(df.columns) + list(right_cols)]

    return left.map_batches(per_batch, batch_format="pandas")


def asof_join_partitioned(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_order: list[str] | None = None,
    num_buckets: int = 32,
    direction: str = "backward",
) -> "ray.data.Dataset":
    """Both-sides-large as-of join: same union + bucketed-group-map
    kernel shape as ``bucket_hash_join``, with ``pd.merge_asof`` as the
    per-bucket kernel.  One shuffle, no broadcast, no driver state.
    Output columns = left's, then ``right_cols`` (broadcast-path
    layout)."""
    left = _as_arrow(left)
    right = _as_arrow(right)
    ls, rs = left.schema(), right.schema()
    lf = dict(zip(ls.names, ls.types))
    rf = dict(zip(rs.names, rs.types))
    ts_type = lf[left_ts]
    l_cols = list(ls.names)
    l_extra = [c for c in l_cols if c not in (key_col, left_ts)]
    r_keep = list(dict.fromkeys(list(right_cols) + list(right_order or [])))
    overlap = set(l_extra) & set(r_keep)
    if overlap:
        raise ValueError(
            "asof_join_partitioned: non-key right columns must not collide "
            f"with left columns (shared: {sorted(overlap)}) — rename first"
        )
    all_cols = [key_col, left_ts] + l_extra + r_keep

    def pad_left(t: pa.Table) -> pa.Table:
        arrays = [t[key_col].combine_chunks(), t[left_ts].combine_chunks()]
        arrays += [t[c].combine_chunks() for c in l_extra]
        arrays += [_pad_array(t.num_rows, rf[c]) for c in r_keep]
        arrays.append(pa.array([0] * t.num_rows, type=pa.int8()))
        return pa.Table.from_arrays(arrays, names=all_cols + ["_side"])

    def pad_right(t: pa.Table) -> pa.Table:
        arrays = [
            t[key_col].combine_chunks().cast(lf[key_col]),
            t[right_ts].combine_chunks().cast(ts_type),
        ]
        arrays += [_pad_array(t.num_rows, lf[c]) for c in l_extra]
        arrays += [t[c].combine_chunks() for c in r_keep]
        arrays.append(pa.array([1] * t.num_rows, type=pa.int8()))
        return pa.Table.from_arrays(arrays, names=all_cols + ["_side"])

    lds = left.map_batches(pad_left, batch_format="pyarrow")
    rds = right.map_batches(pad_right, batch_format="pyarrow")

    l_dtypes = {c: lf[c].to_pandas_dtype() for c in l_extra}
    r_dtypes = {c: rf[c].to_pandas_dtype() for c in r_keep}
    out_cols = l_cols + list(right_cols)
    order_tail = list(right_order or [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0][[key_col, left_ts] + l_extra].copy()
        r = df[df["_side"] == 1][[key_col, left_ts] + r_keep].copy()
        # null padding from the opposite side upcasts ints to float in
        # the unified bucket frame; each side's own rows have no nulls
        for c, dt in l_dtypes.items():
            l[c] = l[c].astype(dt, copy=False)
        for c, dt in r_dtypes.items():
            r[c] = r[c].astype(dt, copy=False)
        out = pd.merge_asof(
            l.sort_values(left_ts, kind="mergesort"),
            r.sort_values([left_ts] + order_tail, kind="mergesort"),
            on=left_ts,
            by=key_col,
            direction=direction,
            suffixes=("", "_r"),
        )
        return out[out_cols]

    return bucketed_group_map(
        lds.union(rds), [key_col], per_bucket, num_buckets=num_buckets
    )


def grouped_topk(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: list[str] | None = None,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Top-k rows PER GROUP by ``order_col`` (deterministic tie-break on
    ``tie_cols``, ascending).  Per-batch partial top-k (combiner: a
    batch can only contribute k rows per group it contains) → bucketed
    final — the shuffle carries ≤ k·groups·blocks rows, never the
    input.  The per-key analogue of the global topk/sort-limit path."""
    tie_cols = tie_cols or []
    by = [order_col] + tie_cols
    asc = [not descending] + [True] * len(tie_cols)

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=asc, kind="mergesort")
        return df.groupby(group_cols, as_index=False, sort=False).head(k)

    return bucketed_group_map(
        ds, group_cols, head_k, num_buckets=num_buckets, batch_partial=head_k
    )


def stratified_sample(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    key_cols: list[str],
    n: int,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Deterministic stratified sample: the ``n`` rows per group with
    the smallest (fnv1a64(key), key) — parallelism-invariant (pure
    function of row content, like hash_sample) and exactly reproducible
    in SQL (order by hash per partition, row_number ≤ n).  Key columns
    are concatenated with '|' before hashing; rows per group ≤ n pass
    through unchanged."""
    from .sketch import fnv1a64

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        key = df[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            key = key + "|" + df[c].astype(str)
        out = df.copy()
        out["_h"] = fnv1a64(key.to_numpy(dtype=object))
        return out

    def head_n(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h"] + key_cols, kind="mergesort")
        return df.groupby(group_cols, as_index=False, sort=False).head(n)

    out = bucketed_group_map(
        ds.map_batches(add_hash, batch_format="pandas"),
        group_cols,
        head_n,
        num_buckets=num_buckets,
        batch_partial=head_n,
    )
    return out.map_batches(lambda df: df.drop(columns=["_h"]), batch_format="pandas")


def global_rank(
    ds: "ray.data.Dataset",
    val_col: str,
    tie_cols: list[str],
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """TeraSort-shape GLOBAL ranking: every row gets its row_number
    under the total order (val_col asc, tie_cols asc) — the
    distributed global sort primitive Ray Data's ``sort`` alone cannot
    attach (no zip-with-index).

    Three passes: (1) min/max aggregate; (2) value-range bucketing
    (equal values always co-bucket, so ties never span buckets) with
    per-bucket counts → driver prefix offsets, O(num_buckets) driver
    state; (3) per-bucket local sort + offset, one key-range exchange.
    Rows in bucket i all precede bucket i+1 in the total order, so
    local rank + prefix offset IS the global rank."""
    stats = ds.aggregate(
        ray.data.aggregate.Min(val_col), ray.data.aggregate.Max(val_col)
    )
    lo = float(stats[f"min({val_col})"])
    hi = float(stats[f"max({val_col})"])
    width = (hi - lo) / num_buckets if hi > lo else 1.0

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(
            np.floor((v - lo) / width).astype(np.int64), 0, num_buckets - 1
        )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_b"] = bucket_of(out[val_col].to_numpy(dtype="float64"))
        return out

    with_b = ds.map_batches(add_bucket, batch_format="pandas")

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_b", as_index=False).size()
        return g.rename(columns={"size": "n"})

    counts = (
        with_b.map_batches(count_partial, batch_format="pandas")
        .to_pandas()
        .groupby("_b")["n"]
        .sum()
    )
    full = np.zeros(num_buckets, dtype=np.int64)
    full[counts.index.to_numpy()] = counts.to_numpy()
    offsets = np.concatenate(([0], np.cumsum(full)[:-1]))
    off_ref = ray.put(offsets)

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values([val_col, *tie_cols], kind="mergesort")
        b = int(df["_b"].iloc[0])
        df = df.drop(columns=["_b"])
        df["rank"] = off[b] + np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    # coalesce before the sort-based groupby (same per-block fixed-cost
    # rationale as bucketed_group_map; each bucket is one task anyway)
    return (
        with_b.repartition(num_buckets)
        .groupby("_b")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def global_prefix_sum(
    ds: "ray.data.Dataset",
    order_col: str,
    val_col: str,
    out_col: str = "prefix",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """EXCLUSIVE prefix sum of ``val_col`` under the global total order
    by ``order_col`` — the distributed scan primitive behind
    concat-and-split sequence packing, global offsets, and file-layout
    planning.  Same TeraSort shape as :func:`global_rank`: (1) min/max
    of the order column; (2) range-bucketing (equal order values always
    co-bucket) with per-bucket VALUE sums → driver exclusive offsets,
    O(num_buckets) driver state; (3) per-bucket local sort + local
    exclusive cumsum + bucket offset, one key-range exchange total.

    ``order_col`` must be unique per row (a key); ties would make the
    within-bucket order — and therefore the prefix — ambiguous."""
    stats = ds.aggregate(
        ray.data.aggregate.Min(order_col), ray.data.aggregate.Max(order_col)
    )
    if stats is None or stats.get(f"min({order_col})") is None:
        return ds  # empty input: the scan of nothing is nothing
    lo = float(stats[f"min({order_col})"])
    hi = float(stats[f"max({order_col})"])
    width = (hi - lo) / num_buckets if hi > lo else 1.0

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_b"] = np.clip(
            np.floor(
                (out[order_col].to_numpy(dtype="float64") - lo) / width
            ).astype(np.int64),
            0,
            num_buckets - 1,
        )
        return out

    with_b = ds.map_batches(add_bucket, batch_format="pandas")

    def sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_b", as_index=False)[val_col].sum()
        return g.rename(columns={val_col: "s"})

    sums = (
        with_b.map_batches(sum_partial, batch_format="pandas")
        .to_pandas()
        .groupby("_b")["s"]
        .sum()
    )
    full = np.zeros(num_buckets, dtype=np.int64)
    full[sums.index.to_numpy()] = sums.to_numpy()
    offsets = np.concatenate(([0], np.cumsum(full)[:-1]))
    off_ref = ray.put(offsets)

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values(order_col, kind="mergesort")
        b = int(df["_b"].iloc[0])
        df = df.drop(columns=["_b"])
        v = df[val_col].to_numpy(dtype="int64")
        df[out_col] = off[b] + np.concatenate(([0], np.cumsum(v)[:-1]))
        return df

    # coalesce before the sort-based groupby (same per-block fixed-cost
    # rationale as bucketed_group_map; each bucket is one task anyway)
    return (
        with_b.repartition(num_buckets)
        .groupby("_b")
        .map_groups(scan_bucket, batch_format="pandas")
    )


def global_prefix_max(
    ds: "ray.data.Dataset",
    order_col: str,
    val_col: str,
    out_col: str = "prefix_max",
    neutral: int = -(2**62),
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """EXCLUSIVE running maximum of ``val_col`` under the global total
    order by ``order_col`` — the watermark / high-water-mark scan of
    streaming semantics (each row sees the max of everything strictly
    BEFORE it in arrival order).  Same TeraSort shape as
    :func:`global_prefix_sum`: (1) min/max of the order column; (2)
    range-bucketing with per-bucket value MAXes → driver exclusive
    running max, O(num_buckets) state; (3) per-bucket local sort +
    exclusive cummax combined with the bucket offset.  The first row
    globally gets ``neutral`` (default −2⁶², safely below any int64-µs
    timestamp).  ``order_col`` must be unique per row."""
    stats = ds.aggregate(
        ray.data.aggregate.Min(order_col), ray.data.aggregate.Max(order_col)
    )
    if stats is None or stats.get(f"min({order_col})") is None:
        return ds  # empty input: the scan of nothing is nothing
    lo = float(stats[f"min({order_col})"])
    hi = float(stats[f"max({order_col})"])
    width = (hi - lo) / num_buckets if hi > lo else 1.0

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_b"] = np.clip(
            np.floor(
                (out[order_col].to_numpy(dtype="float64") - lo) / width
            ).astype(np.int64),
            0,
            num_buckets - 1,
        )
        return out

    with_b = ds.map_batches(add_bucket, batch_format="pandas")

    def max_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_b", as_index=False)[val_col].max()
        return g.rename(columns={val_col: "m"})

    maxes = (
        with_b.map_batches(max_partial, batch_format="pandas")
        .to_pandas()
        .groupby("_b")["m"]
        .max()
    )
    full = np.full(num_buckets, neutral, dtype=np.int64)
    full[maxes.index.to_numpy()] = maxes.to_numpy()
    offsets = np.concatenate(
        ([neutral], np.maximum.accumulate(full)[:-1])
    )
    off_ref = ray.put(offsets)

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values(order_col, kind="mergesort")
        b = int(df["_b"].iloc[0])
        df = df.drop(columns=["_b"])
        v = df[val_col].to_numpy(dtype="int64")
        excl = np.concatenate(
            ([neutral], np.maximum.accumulate(v)[:-1])
        )
        df[out_col] = np.maximum(off[b], excl)
        return df

    return (
        with_b.repartition(num_buckets)
        .groupby("_b")
        .map_groups(scan_bucket, batch_format="pandas")
    )


def mix_corpus(
    ds: "ray.data.Dataset",
    source_col: str,
    key_cols: list[str],
    weights: dict,
    default_weight: float = 1.0,
    mod: int = 1_000_000,
) -> "ray.data.Dataset":
    """Training-corpus mixing: replicate/subsample rows per source with
    FRACTIONAL epoch weights (the Pile/LLaMA data-recipe step).  A row
    with weight w is emitted floor(w) times plus one more iff its
    hash-uniform u < frac(w); output gains an ``epoch`` column
    (0-based copy index).  u = (fnv1a64(key) % mod)/mod is exact in
    float64 and a pure function of row content, so the mix is
    parallelism-invariant, resumable, and SQL-rederivable (the same
    'deterministic coin' pattern as hash_sample).

    Embarrassingly parallel: a pure batch map, zero shuffles; the
    weights dict is a tiny task-closure broadcast.  Replication is
    np.repeat on batch indices — no per-row Python."""
    from .sketch import fnv1a64

    wmap = {str(k): float(v) for k, v in weights.items()}
    dw = float(default_weight)

    def mix(df: pd.DataFrame) -> pd.DataFrame:
        key = df[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            key = key + "|" + df[c].astype(str)
        u = (fnv1a64(key.to_numpy(dtype=object)) % np.uint64(mod)).astype(
            "float64"
        ) / float(mod)
        # weights keys are stringified above, so the lookup column must be
        # stringified too — a non-string source column would otherwise
        # silently fall to default_weight for every row
        w = df[source_col].astype(str).map(wmap).fillna(dw).to_numpy(dtype="float64")
        base = np.floor(w)
        n = (base + (u < (w - base))).astype("int64")
        idx = np.repeat(np.arange(len(df)), n)
        out = df.iloc[idx].reset_index(drop=True)
        out["epoch"] = (
            np.arange(int(n.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(n) - n, n)
        ).astype("int64")
        return out

    return ds.map_batches(mix, batch_format="pandas")


def keyed_rank_stats(
    ds: "ray.data.Dataset",
    key_col: str,
    order_cols: list[str],
    ntile_k: int = 4,
    round_to: int = 9,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-key ranking window functions in one pass — SQL's
    ``ntile(k)``, ``percent_rank()`` and ``cume_dist()`` over
    (partition by key order by ...).  Appends ``tile`` (SQL ntile
    fill: the first n%k tiles get ceil(n/k) rows), ``pct_rank`` =
    (rn-1)/(n-1) (0.0 for single-row keys, SQL convention) and
    ``cume_dist`` = rn/n, both rounded half-away for oracle parity.
    Ordering must be total per key (pass tie-breaking order cols) or
    rank assignments are implementation-defined.

    One key-hash-bucketed exchange; per bucket a single mergesort +
    vectorized groupby-transform (no per-key Python)."""
    from ..functions.numeric import round_half_away

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, *order_cols], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        rn0 = g.cumcount().to_numpy()
        n = g[order_cols[0]].transform("size").to_numpy()
        big = n % ntile_k          # tiles 1..big get size_big rows
        size_big = n // ntile_k + 1
        size_small = np.maximum(n // ntile_k, 1)
        cut = big * size_big
        in_big = rn0 < cut
        tile = np.where(
            in_big,
            rn0 // size_big,
            big + (rn0 - cut) // size_small,
        ) + 1
        df["tile"] = tile.astype("int64")
        pr = np.where(n > 1, rn0 / np.maximum(n - 1, 1), 0.0)
        df["pct_rank"] = round_half_away(pr, round_to)
        df["cume_dist"] = round_half_away((rn0 + 1) / n, round_to)
        return df

    return bucketed_group_map(ds, [key_col], per_bucket, num_buckets=num_buckets)


def ordered_concat(
    ds: "ray.data.Dataset",
    key_col: str,
    order_cols: list[str],
    value_col: str,
    sep: str = ">",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Ordered per-key string aggregation — SQL's
    ``string_agg(value, sep ORDER BY ...)`` — the session-path /
    clickstream primitive.  Emits (key, path, n_steps).

    One key-hash-bucketed exchange; the shuffle carries only
    (key, order, value) rows (no batch_partial: ordered concat cannot
    pre-combine without a per-batch order guarantee).  Per bucket: one
    mergesort + vectorized groupby; the join itself is C-speed
    str.join per key.  Partitioning assumption: all rows of a key in
    one bucket, so each per-bucket concat is total."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, *order_cols], kind="mergesort")
        g = df.groupby(key_col, sort=False)[value_col]
        out = g.agg(sep.join).reset_index().rename(columns={value_col: "path"})
        out["n_steps"] = g.size().to_numpy().astype("int64")
        return out

    return bucketed_group_map(
        ds,
        [key_col],
        per_bucket,
        num_buckets=num_buckets,
        batch_partial=lambda df: df[[key_col, *order_cols, value_col]],
    )


def weighted_sample(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    weight_col: str,
    k: int,
    round_to: int = 9,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Deterministic weighted sample WITHOUT replacement (Efraimidis–
    Spirakis A-ES, Inf. Process. Lett. 97(5), 2006): every row gets
    sort key ln(u)/w — u a hash-derived uniform in (0, 1], w =
    ``weight_col`` (> 0) — and the k rows with the LARGEST keys win,
    which draws rows with probability proportional to weight, the
    training-data-mixing primitive.  u = ((fnv1a64(key)>>11)+1)/2^53
    is a pure function of row content, so the sample is
    parallelism-invariant and SQL-rederivable; u is EXACT in float64
    ((h>>11)+1 ≤ 2^53, power-of-two divisor).  Keys are rounded
    (SQL half-away semantics, ties → key_cols asc) so an oracle
    rounding identically agrees; the ln() libm 1-ulp divergence is
    ~1e-16 relative and absorbed by the 9-dp round.

    Scale shape: per-batch key computation + partial top-k combiner
    (grouped_topk under a constant group) — the final exchange carries
    ≤ k rows per block, never the dataset."""
    from ..functions.numeric import round_half_away
    from .sketch import fnv1a64

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        key = df[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            key = key + "|" + df[c].astype(str)
        h = fnv1a64(key.to_numpy(dtype=object))
        u = ((h >> np.uint64(11)).astype("float64") + 1.0) / 9007199254740992.0
        w = df[weight_col].to_numpy(dtype="float64")
        out = df.copy()
        out["w_key"] = round_half_away(np.log(u) / w, round_to)
        out["_g"] = np.int64(0)
        return out

    out = grouped_topk(
        ds.map_batches(add_key, batch_format="pandas"),
        ["_g"],
        "w_key",
        k,
        descending=True,
        tie_cols=key_cols,
        num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda df: df.drop(columns=["_g"]), batch_format="pandas"
    )


def exact_quantile(
    ds: "ray.data.Dataset",
    col: str,
    q: float,
    samples_per_block: int = 128,
    max_driver_rows: int = 100_000,
    k: int | None = None,
    also_next: bool = False,
):
    """EXACT q-quantile (percentile_disc semantics: the k-th smallest
    with k = ceil(q·n) — the smallest value whose cumulative
    distribution ≥ q; pass ``k`` explicitly for an arbitrary
    order-statistic select; ``also_next=True`` returns the pair
    (k-th, (k+1)-th or None) from the SAME bracket search — the
    interpolation path needs adjacent order statistics and must not
    pay two full searches), computed distributedly:

    iterate { sample pivots per block → one vectorized count-≤ pass →
    narrow to the (lo, hi] bracket containing the k-th } until the
    bracket holds ≤ ``max_driver_rows`` rows, then select locally.
    Each iteration shrinks the bracket ~samples_per_block·blocks-fold,
    so 10^12 rows need 2-3 count passes; driver state is O(pivots) +
    the final bracket — never the column.  The generic form of the
    crawl engine's distributed cap boundary (pipelines/crawl.py
    ``_cap_boundary``), for any numeric column."""
    vals = _as_arrow(ds.select_columns([col]))
    n = vals.count()
    if n == 0:
        return (None, None) if also_next else None
    if k is None:
        k = int(np.ceil(q * n))
    k = min(max(k, 1), n)

    lo = None  # bracket is (lo, hi]; None = unbounded
    hi = None
    k_rem = k
    count_in = n

    def bracket_filter(t: "pa.Table") -> "pa.Table":
        c = t[col]
        mask = None
        if lo is not None:
            mask = pc.greater(c, lo)
        if hi is not None:
            m2 = pc.less_equal(c, hi)
            mask = m2 if mask is None else pc.and_(mask, m2)
        return t if mask is None else t.filter(mask)

    while count_in > max_driver_rows:
        def sample_block(t: "pa.Table") -> "pa.Table":
            t = bracket_filter(t)
            if t.num_rows == 0:
                return pa.table({col: pa.array([], t[col].type)})
            v = np.sort(t[col].to_numpy(zero_copy_only=False))
            step = max(1, len(v) // samples_per_block)
            picks = np.unique(np.append(v[::step], v[-1]))  # block max always in
            return pa.table({col: pa.array(picks)})

        pivots = np.unique(
            vals.map_batches(sample_block, batch_format="pyarrow")
            .to_pandas()[col]
            .to_numpy()
        )

        def count_le(t: "pa.Table") -> "pa.Table":
            v = np.sort(bracket_filter(t)[col].to_numpy(zero_copy_only=False))
            return pa.table({"c": pa.array(np.searchsorted(v, pivots, side="right"))})

        cum = (
            vals.map_batches(count_le, batch_format="pyarrow")
            .to_pandas()["c"]
            .to_numpy()
            .reshape(-1, len(pivots))
            .sum(axis=0)
        )
        j = int(np.searchsorted(cum, k_rem, side="left"))
        new_lo = pivots[j - 1] if j > 0 else lo
        if j > 0:
            k_rem -= int(cum[j - 1])
        prev_count = count_in
        count_in = int(cum[j]) - (int(cum[j - 1]) if j > 0 else 0)
        lo, hi = new_lo, pivots[j]
        if count_in == prev_count:
            # pivots could not split the bracket ⇒ every remaining value
            # equals hi (block samples always include smaller values
            # when they exist) — hi IS the answer
            v = hi.item() if hasattr(hi, "item") else hi
            if also_next:
                # the (k+1)-th lies in this all-equal bracket too unless
                # the k-th is its last element
                return (v, v if k_rem < count_in else None)
            return v
    final = (
        vals.map_batches(bracket_filter, batch_format="pyarrow")
        .to_pandas()[col]
        .to_numpy()
    )
    final.sort(kind="mergesort")
    if also_next:
        nxt = final[k_rem].item() if k_rem < len(final) else None
        return (final[k_rem - 1].item(), nxt)
    return final[k_rem - 1].item()


def interp_quantile(
    ds: "ray.data.Dataset",
    col: str,
    q: float,
    samples_per_block: int = 128,
    max_driver_rows: int = 100_000,
) -> float | None:
    """EXACT interpolated q-quantile (SQL percentile_cont / DuckDB
    quantile_cont semantics): with h = (n−1)·q (0-based), the answer is
    v⌊h⌋ + (h−⌊h⌋)·(v⌈h⌉ − v⌊h⌋) over the sorted column.  Two
    :func:`exact_quantile` order-statistic selects (each O(pivots)
    driver state, 2-3 count passes at any scale) + one lerp — never a
    global sort, never the column on the driver."""
    vals = _as_arrow(ds.select_columns([col]))
    n = vals.count()
    if n == 0:
        return None
    h = (n - 1) * q
    lo_k = int(np.floor(h)) + 1  # 1-based order statistic
    frac = h - np.floor(h)
    if frac == 0.0:
        return float(
            exact_quantile(
                ds, col, q, samples_per_block=samples_per_block,
                max_driver_rows=max_driver_rows, k=lo_k,
            )
        )
    # one bracket search yields BOTH adjacent order statistics; only
    # when the k-th is the bracket's last element (rare) does the
    # (k+1)-th need its own search
    v_lo, v_hi = exact_quantile(
        ds, col, q, samples_per_block=samples_per_block,
        max_driver_rows=max_driver_rows, k=lo_k, also_next=True,
    )
    if v_hi is None:
        v_hi = exact_quantile(
            ds, col, q, samples_per_block=samples_per_block,
            max_driver_rows=max_driver_rows, k=lo_k + 1,
        )
    return float(v_lo) + float(frac) * (float(v_hi) - float(v_lo))


def grouped_quantile(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    value_col: str,
    q: float,
    out_col: str = "quantile",
    num_buckets: int = 32,
    interpolate: bool = False,
) -> "ray.data.Dataset":
    """Exact per-group q-quantile — percentile_disc semantics (k-th
    smallest, k = ceil(q·n_group)) by default, percentile_cont /
    quantile_cont linear interpolation with ``interpolate=True``.  One
    bucketed exchange; quantiles don't admit a combiner, so the
    shuffle carries the group rows — fine whenever single groups fit a
    bucket task (the same assumption as sessionize / map_groups; use
    ``exact_quantile`` / ``interp_quantile`` per key subset for
    pathological mega-groups)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        def kth(s: pd.Series):
            v = np.sort(s.to_numpy())
            if interpolate:
                h = (len(v) - 1) * q
                lo = int(np.floor(h))
                frac = h - lo
                if frac == 0.0:
                    return float(v[lo])
                return float(v[lo]) + frac * (float(v[lo + 1]) - float(v[lo]))
            k = min(max(int(np.ceil(q * len(v))), 1), len(v))
            return v[k - 1]

        g = df.groupby(group_cols, as_index=False)[value_col].agg(kth)
        return g.rename(columns={value_col: out_col})

    return bucketed_group_map(
        ds.select_columns(group_cols + [value_col]),
        group_cols,
        per_bucket,
        num_buckets=num_buckets,
    )


def hopping_window_agg(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int,
    slide_sec: int,
) -> "ray.data.Dataset":
    """Per-key HOPPING (sliding) window sum/count/mean: windows of
    ``window_sec`` starting every ``slide_sec`` (window_sec must be a
    multiple of slide_sec).  Each row lands in window_sec/slide_sec
    overlapping windows — replicated vectorized (one shifted pass per
    overlap factor, not per row), then the same partial/combine path as
    tumbling_window_agg: the shuffle carries one row per (key, window)
    per batch regardless of the replication factor."""
    assert window_sec % slide_sec == 0, "window_sec must be a multiple of slide_sec"
    k = window_sec // slide_sec

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(t[ts_col], pa.int64()), 1_000_000)
        # latest window start containing ts: floor(ts/slide)*slide
        base = pc.multiply(
            pc.floor(pc.divide(pc.cast(epoch, pa.float64()), slide_sec)),
            float(slide_sec),
        )
        parts = []
        for j in range(k):
            start = pc.subtract(pc.cast(base, pa.int64()), j * slide_sec)
            parts.append(
                pa.table(
                    {
                        key_col: t[key_col],
                        "window_start": start,
                        "_v": t[value_col],
                    }
                )
            )
        tbl = pa.concat_tables(parts)
        g = pa.TableGroupBy(tbl, [key_col, "window_start"]).aggregate(
            [("_v", "sum"), ("_v", "count")]
        )
        return g.rename_columns([key_col, "window_start", "_sum", "_n"])

    def finalize(t: pa.Table) -> pa.Table:
        return t.append_column(
            "value_mean", pc.divide(t["value_sum"], pc.cast(t["n_events"], pa.float64()))
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Sum("_sum", alias_name="value_sum"), Sum("_n", alias_name="n_events"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Keyed interval (range) join: left rows matched to every right row
    of the same key with ``right_start <= left_ts < right_end``.

    Both sides co-partition by key hash through the bucket machinery
    (no broadcast); inside a bucket the match is one pandas merge on
    the key plus a vectorized interval mask.  Per-key match cardinality
    is the output size — the partitioning assumption is the usual keyed
    one (a single key's rows fit a bucket task); keyless/giant-interval
    workloads need an IEJoin-class operator instead, which this engine
    does not claim."""
    # reuse bucket_hash_join's padding by renaming: simplest correct path
    # is a dedicated union+group like bucket_hash_join but with the
    # interval mask applied after the merge
    left = _as_arrow(left)
    right = _as_arrow(right)
    l_names, lf = _names_types(left)
    r_names, rf = _names_types(right)
    if not l_names and not r_names:
        return left  # both sides all-empty: the join is empty
    l_extra = [n for n in l_names if n != on]
    r_extra = [n for n in r_names if n != on]
    overlap = set(l_extra) & set(r_extra)
    if overlap:
        raise ValueError(
            f"range_join: non-key columns must be disjoint (shared: {sorted(overlap)})"
        )
    all_cols = [on] + l_extra + r_extra

    def pad(side: int, have: set):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                # an all-empty side can emit schema-less empty blocks
                # (no columns) — emit the typed empty target instead of
                # indexing columns that are not there
                return pa.Table.from_arrays(
                    [pa.array([], type=lf.get(c, rf.get(c))) for c in all_cols]
                    + [pa.array([], type=pa.int8())],
                    names=all_cols + ["_side"],
                )
            arrays = []
            for c in all_cols:
                typ = lf.get(c, rf.get(c))
                if c in have or c == on:
                    arrays.append(t[c].combine_chunks().cast(typ))
                else:
                    arrays.append(_pad_array(t.num_rows, typ))
            arrays.append(pa.array([side] * t.num_rows, type=pa.int8()))
            return pa.Table.from_arrays(arrays, names=all_cols + ["_side"])

        return f

    lds = left.map_batches(pad(0, set(l_extra)), batch_format="pyarrow")
    rds = right.map_batches(pad(1, set(r_extra)), batch_format="pyarrow")
    l_dtypes = {n: lf[n].to_pandas_dtype() for n in l_extra}
    r_dtypes = {n: rf[n].to_pandas_dtype() for n in r_extra}

    def match(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0][[on] + l_extra].copy()
        r = df[df["_side"] == 1][[on] + r_extra].copy()
        for c, dt in l_dtypes.items():
            l[c] = l[c].astype(dt, copy=False)
        for c, dt in r_dtypes.items():
            r[c] = r[c].astype(dt, copy=False)
        m = l.merge(r, on=on, how="inner")
        keep = (m[right_start] <= m[left_ts]) & (m[left_ts] < m[right_end])
        return m[keep]

    return bucketed_group_map(
        lds.union(rds), [on], match, num_buckets=num_buckets
    )


def rollup_agg(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    value_col: str,
    how: str = "sum",
    out_col: str = "agg",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """SQL ``GROUP BY ROLLUP`` semantics: one aggregate row per key
    prefix level — full keys, each coarser prefix, and the grand total
    — with rolled-up key columns set to null and a ``level`` column
    (count of concrete keys).  ``how`` ∈ {count, sum, min, max}.

    Scale shape: the INPUT is scanned once (the full-key bucketed
    aggregate); every coarser level re-aggregates the previous level's
    already-small result — sum-of-sums / min-of-mins are exact — so
    subtotal cost is proportional to the number of GROUPS, not rows.
    The grand total is a native Dataset aggregate (O(1) driver state).
    Precondition: key columns must be nullable-friendly dtypes
    (strings / objects) since rolled-up keys become null."""
    up = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}[how]
    levels = []
    cur = bucketed_agg(
        ds, key_cols, value_col, how=how, out_col=out_col, num_buckets=num_buckets
    ).materialize()

    def pad(level_keys: list[str], lvl: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: df[c] if c in level_keys else None
                                for c in key_cols})
            out[out_col] = df[out_col]
            out["level"] = np.int64(lvl)
            return out

        return f

    levels.append(cur.map_batches(pad(key_cols, len(key_cols)),
                                  batch_format="pandas"))
    for k in range(len(key_cols) - 1, 0, -1):
        cur = bucketed_agg(
            cur, key_cols[:k], out_col, how=up, out_col=out_col,
            num_buckets=num_buckets,
        ).materialize()
        levels.append(cur.map_batches(pad(key_cols[:k], k),
                                      batch_format="pandas"))

    grand = getattr(cur, up)(out_col)  # native Dataset aggregate
    total_row = pd.DataFrame({c: [None] for c in key_cols})
    total_row[out_col] = [grand]
    total_row["level"] = np.int64(0)
    levels.append(ray.data.from_pandas(total_row))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def grouping_sets_agg(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sets: list[list[str]],
    value_col: str,
    how: str = "sum",
    out_col: str = "agg",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """SQL ``GROUP BY GROUPING SETS``: one aggregate row per group per
    requested set, absent key columns nulled, plus a ``level`` column
    (count of concrete keys in that set).  Generalizes rollup_agg /
    cube_agg to arbitrary set lists.

    Scale shape (same as rollup_agg): the INPUT is scanned once into
    the full-key bucketed aggregate; every requested set re-aggregates
    that already-small result — sum-of-sums / min-of-mins / max-of-
    maxes are exact, and count re-aggregates as sum — so the cost of
    extra sets is proportional to the number of GROUPS, not rows.
    Every set must be a subset of ``key_cols`` (the grand total is the
    empty set)."""
    up = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}[how]
    for s in sets:
        missing = set(s) - set(key_cols)
        if missing:
            raise ValueError(f"grouping_sets_agg: {sorted(missing)} not in key_cols")

    full = bucketed_agg(
        ds, key_cols, value_col, how=how, out_col=out_col, num_buckets=num_buckets
    ).materialize()

    def pad(level_keys: list[str]):
        lvl = len(level_keys)

        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {c: df[c] if c in level_keys else None for c in key_cols}
            )
            out[out_col] = df[out_col]
            out["level"] = np.int64(lvl)
            return out

        return f

    parts = []
    for s in sets:
        if sorted(s) == sorted(key_cols):
            cur = full
        elif s:
            cur = bucketed_agg(
                full, list(s), out_col, how=up, out_col=out_col,
                num_buckets=num_buckets,
            )
        else:
            grand = getattr(full, up)(out_col)  # native Dataset aggregate
            row = pd.DataFrame({c: [None] for c in key_cols})
            row[out_col] = [grand]
            row["level"] = np.int64(0)
            parts.append(ray.data.from_pandas(row))
            continue
        parts.append(cur.map_batches(pad(list(s)), batch_format="pandas"))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def funnel_steps(
    ds: "ray.data.Dataset",
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_s: float | None = None,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Ordered-funnel analysis: for each user, how many of ``steps``
    completed in order — step k counts only at the MINIMUM timestamp
    strictly after the user's step-(k-1) time (and within ``window_s``
    of it, when given).  Returns (user_col, steps_completed) for every
    user who completed step 1; aggregate downstream for the funnel.

    Scale shape: one user-hash bucketed exchange; each bucket holds all
    of its users' events, and every step is one vectorized
    filter+merge+groupby-min inside the bucket — no per-user Python, no
    driver state.  The standard sessionization-family partitioning
    (same key as sessionize)."""
    w = pd.Timedelta(seconds=window_s) if window_s is not None else None

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        prev = None
        reached = None
        for k, s in enumerate(steps, start=1):
            sub = df[df[type_col] == s]
            if prev is None:
                cur = sub.groupby(user_col)[ts_col].min()
            else:
                m = sub.merge(
                    prev.rename("_prev").rename_axis(user_col).reset_index(),
                    on=user_col,
                )
                ok = m[ts_col] > m["_prev"]
                if w is not None:
                    ok &= m[ts_col] <= m["_prev"] + w
                cur = m[ok].groupby(user_col)[ts_col].min()
            if k == 1:
                reached = pd.Series(np.int64(1), index=cur.index)
            else:
                reached.loc[reached.index.isin(cur.index)] = np.int64(k)
            if len(cur) == 0:
                break
            prev = cur
        if reached is None or len(reached) == 0:
            return pd.DataFrame(
                {user_col: pd.Series([], dtype=df[user_col].dtype),
                 "steps_completed": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {user_col: reached.index.to_numpy(),
             "steps_completed": reached.to_numpy().astype("int64")}
        )

    return bucketed_group_map(
        ds, [user_col], per_bucket, num_buckets=num_buckets
    )


def skew_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    hot_threshold: int = 100_000,
    max_hot_keys: int = 1024,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Skew-aware inner hash join — result ≡ ``bucket_hash_join`` but a
    handful of HOT keys can no longer capsize one bucket.  The classic
    two-path plan (Spark AQE's skew mitigation, Beam's hot-key fanout):

    1. one bucketed count of keys PER SIDE finds keys with
       ≥ hot_threshold rows on either side (a key skewed only on the
       right would otherwise still capsize one cold bucket); the hot-key
       LIST (bounded by ``max_hot_keys``, ids only — never rows) is the
       only driver state;
    2. cold rows take the normal co-partitioned bucket join;
    3. hot LEFT rows stay in place (no shuffle at all) and join against
       a broadcast of the right side's hot-key rows (small by the join's
       own assumption: a key hot on the left has few right rows in a
       star-schema join — assert-guarded via the broadcast gate; a key
       hot on the RIGHT trips that gate loudly → salt upstream).

    Falls back to plain bucket_hash_join when nothing is hot."""
    from .dedup import BROADCAST_BYTES

    def keys_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[on]

    counts = bucketed_agg(
        left.map_batches(keys_only, batch_format="pandas"),
        on,
        out_col="_n",
        num_buckets=num_buckets,
    ).union(
        bucketed_agg(
            right.map_batches(keys_only, batch_format="pandas"),
            on,
            out_col="_n",
            num_buckets=num_buckets,
        )
    )
    hot = (
        counts.map_batches(
            lambda df: df[df["_n"] >= hot_threshold][on], batch_format="pandas"
        )
        .to_pandas()
        .drop_duplicates(on)
    )
    if len(hot) == 0:
        return bucket_hash_join(left, right, on, num_buckets=num_buckets)
    if len(hot) > max_hot_keys:
        raise ValueError(
            f"skew_join: {len(hot)} hot keys exceed max_hot_keys={max_hot_keys}"
        )

    hot_idx = pd.MultiIndex.from_frame(hot[on])

    def is_hot(df: pd.DataFrame) -> np.ndarray:
        # vectorized membership — no per-row Python tuples on the hot loop
        if len(on) == 1:
            return df[on[0]].isin(hot_idx.get_level_values(0)).to_numpy()
        return pd.MultiIndex.from_frame(df[on]).isin(hot_idx)

    cold = bucket_hash_join(
        left.map_batches(lambda df: df[~is_hot(df)], batch_format="pandas"),
        right.map_batches(lambda df: df[~is_hot(df)], batch_format="pandas"),
        on,
        num_buckets=num_buckets,
    )

    right_hot = right.map_batches(
        lambda df: df[is_hot(df)], batch_format="pandas"
    ).to_pandas()
    if right_hot.memory_usage(deep=True).sum() > BROADCAST_BYTES:
        raise ValueError(
            "skew_join: right side's hot-key rows exceed the broadcast gate — "
            "salt the key upstream instead"
        )
    ref = ray.put(right_hot)

    def join_hot(df: pd.DataFrame) -> pd.DataFrame:
        l = df[is_hot(df)]
        if not len(l):
            return l.merge(ray.get(ref), on=on)
        return l.merge(ray.get(ref), on=on, how="inner")

    return cold.union(left.map_batches(join_hot, batch_format="pandas"))


def cube_agg(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    value_col: str,
    how: str = "sum",
    out_col: str = "agg",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """SQL ``GROUP BY CUBE`` semantics for TWO keys: aggregates at
    (a,b), (a), (b) and () with rolled-up keys null and a ``grouping``
    bitmask column (bit set = key rolled up, SQL GROUPING() order).
    Like rollup_agg, every marginal re-aggregates the base (a,b)
    result — the input is scanned once; sum-of-sums / min-of-mins are
    exact."""
    assert len(key_cols) == 2, "cube_agg: exactly two key columns"
    a, b = key_cols
    up = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}[how]
    base = bucketed_agg(
        ds, key_cols, value_col, how=how, out_col=out_col, num_buckets=num_buckets
    ).materialize()

    def pad(keep: list[str], mask: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: df[c] if c in keep else None for c in key_cols})
            out[out_col] = df[out_col]
            out["grouping"] = np.int64(mask)
            return out

        return f

    m_a = bucketed_agg(base, [a], out_col, how=up, out_col=out_col,
                       num_buckets=num_buckets)
    m_b = bucketed_agg(base, [b], out_col, how=up, out_col=out_col,
                       num_buckets=num_buckets)
    grand = getattr(base, up)(out_col)
    total = pd.DataFrame({a: [None], b: [None]})
    total[out_col] = [grand]
    total["grouping"] = np.int64(3)

    return (
        base.map_batches(pad(key_cols, 0), batch_format="pandas")
        .union(m_a.map_batches(pad([a], 1), batch_format="pandas"))
        .union(m_b.map_batches(pad([b], 2), batch_format="pandas"))
        .union(ray.data.from_pandas(total))
    )


def _names_types(ds: "ray.data.Dataset") -> tuple[list, dict]:
    """(names, {name: type}) of a Dataset, tolerating the all-empty
    schema-loss case: Ray 2.49 drops pandas-block schema when every
    block of a dataset is empty (``schema()`` → None / no names).  An
    empty join side is semantically "no rows, and no knowable extra
    columns" — callers treat ([], {}) as that, keeping outer joins and
    set ops total instead of crashing on ``.names``."""
    s = ds.schema()
    if s is None or not s.names:
        return [], {}
    return list(s.names), dict(zip(s.names, s.types))


def bucket_left_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Partitioned LEFT OUTER hash join — the bucket_hash_join plan
    with how='left': every left row survives; unmatched right-side
    columns come back null (pandas upcasts their ints to float64 — the
    standard outer-join dtype reality; aggregate or fillna downstream
    when an integer type is required)."""
    left = _as_arrow(left)
    right = _as_arrow(right)
    l_names, lf = _names_types(left)
    r_names, rf = _names_types(right)
    if not l_names and not r_names:
        return left  # both sides all-empty: the join is empty
    l_extra = [n for n in l_names if n not in on]
    r_extra = [n for n in r_names if n not in on]
    overlap = set(l_extra) & set(r_extra)
    if overlap:
        raise ValueError(
            "bucket_left_join: non-key columns must be disjoint "
            f"(shared: {sorted(overlap)}) — rename one side first"
        )
    all_cols = on + l_extra + r_extra

    def pad(side: int, have: set):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                # an all-empty side can emit schema-less empty blocks
                # (no columns) — emit the typed empty target instead of
                # indexing columns that are not there
                return pa.Table.from_arrays(
                    [pa.array([], type=lf.get(c, rf.get(c))) for c in all_cols]
                    + [pa.array([], type=pa.int8())],
                    names=all_cols + ["_side"],
                )
            arrays = []
            for c in all_cols:
                typ = lf.get(c, rf.get(c))
                if c in have or c in on:
                    arrays.append(t[c].combine_chunks().cast(typ))
                else:
                    arrays.append(_pad_array(t.num_rows, typ))
            arrays.append(pa.array([side] * t.num_rows, type=pa.int8()))
            return pa.Table.from_arrays(arrays, names=all_cols + ["_side"])

        return f

    lds = left.map_batches(pad(0, set(l_extra)), batch_format="pyarrow")
    rds = right.map_batches(pad(1, set(r_extra)), batch_format="pyarrow")
    l_dtypes = {n: lf[n].to_pandas_dtype() for n in l_extra}
    r_dtypes = {n: rf[n].to_pandas_dtype() for n in r_extra}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0][on + l_extra].copy()
        r = df[df["_side"] == 1][on + r_extra].copy()
        for c, dt in l_dtypes.items():
            l[c] = l[c].astype(dt, copy=False)
        for c, dt in r_dtypes.items():
            r[c] = r[c].astype(dt, copy=False)
        return l.merge(r, on=on, how="left")

    return bucketed_group_map(
        lds.union(rds), on, per_bucket, num_buckets=num_buckets
    )


def bucket_full_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Partitioned FULL OUTER hash join — the bucket plan with
    how='outer'.  Rows unmatched on either side survive with the other
    side's columns null (ints upcast to float64, the pandas outer-join
    dtype reality).  Key-hash co-partitioning makes the per-bucket
    outer merge exhaustive for its keys, so the union of buckets IS the
    full outer join."""
    left = _as_arrow(left)
    right = _as_arrow(right)
    l_names, lf = _names_types(left)
    r_names, rf = _names_types(right)
    if not l_names and not r_names:
        return left  # both sides all-empty: the join is empty
    l_extra = [n for n in l_names if n not in on]
    r_extra = [n for n in r_names if n not in on]
    overlap = set(l_extra) & set(r_extra)
    if overlap:
        raise ValueError(
            "bucket_full_join: non-key columns must be disjoint "
            f"(shared: {sorted(overlap)}) — rename one side first"
        )
    all_cols = on + l_extra + r_extra

    def pad(side: int, have: set):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                # an all-empty side can emit schema-less empty blocks
                # (no columns) — emit the typed empty target instead of
                # indexing columns that are not there
                return pa.Table.from_arrays(
                    [pa.array([], type=lf.get(c, rf.get(c))) for c in all_cols]
                    + [pa.array([], type=pa.int8())],
                    names=all_cols + ["_side"],
                )
            arrays = []
            for c in all_cols:
                typ = lf.get(c, rf.get(c))
                if c in have or c in on:
                    arrays.append(t[c].combine_chunks().cast(typ))
                else:
                    arrays.append(_pad_array(t.num_rows, typ))
            arrays.append(pa.array([side] * t.num_rows, type=pa.int8()))
            return pa.Table.from_arrays(arrays, names=all_cols + ["_side"])

        return f

    lds = left.map_batches(pad(0, set(l_extra)), batch_format="pyarrow")
    rds = right.map_batches(pad(1, set(r_extra)), batch_format="pyarrow")
    l_dtypes = {n: lf[n].to_pandas_dtype() for n in l_extra}
    r_dtypes = {n: rf[n].to_pandas_dtype() for n in r_extra}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0][on + l_extra].copy()
        r = df[df["_side"] == 1][on + r_extra].copy()
        for c, dt in l_dtypes.items():
            l[c] = l[c].astype(dt, copy=False)
        for c, dt in r_dtypes.items():
            r[c] = r[c].astype(dt, copy=False)
        return l.merge(r, on=on, how="outer", indicator="_matched")

    out = bucketed_group_map(
        lds.union(rds), on, per_bucket, num_buckets=num_buckets
    )
    return out.map_batches(
        lambda df: (
            df.assign(_matched=df["_matched"].astype(str))
            if "_matched" in df.columns
            else df  # schema-less empty block from an all-empty input
        ),
        batch_format="pandas",
    )


def set_op(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    how: str = "intersect",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distinct set operations — SQL ``INTERSECT`` / ``EXCEPT`` — between
    two datasets with identical column names.

    The reference has no set operators (its API is point lookups,
    SURVEY.md §2.5); this is the generic form used e.g. to diff two
    crawl snapshots' page-id sets.  Shape: per-batch distinct combiner
    on both sides (shrinks the exchange to one row per distinct tuple
    per block), side tag, ONE union + hash-bucketed exchange on the
    full row tuple, per-bucket distinct + membership test.  No
    broadcast, no driver state — a key tuple lands in exactly one
    bucket, so bucket-local membership is globally exact.
    """
    if how not in ("intersect", "except"):
        raise ValueError(f"set_op: how must be intersect|except, got {how!r}")
    left = _as_arrow(left)
    right = _as_arrow(right)
    l_names, lf_ = _names_types(left)
    r_names, rf_ = _names_types(right)
    if not l_names and not r_names:
        return left  # both sides all-empty: intersect/except is empty
    # an all-empty side contributes no rows; take the column contract
    # from whichever side still carries a schema
    if l_names and r_names and l_names != r_names:
        raise ValueError(
            f"set_op: column names must match ({l_names} vs {r_names})"
        )
    cols = l_names or r_names
    lf = lf_ if l_names else rf_

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.Table.from_arrays(
                    [pa.array([], type=lf[c]) for c in cols]
                    + [pa.array([], type=pa.int8())],
                    names=cols + ["_side"],
                )
            arrays = [t[c].combine_chunks().cast(lf[c]) for c in cols]
            arrays.append(pa.repeat(pa.scalar(side, type=pa.int8()), t.num_rows))
            return pa.Table.from_arrays(arrays, names=cols + ["_side"])

        return f

    u = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0][cols].drop_duplicates()
        r = df[df["_side"] == 1][cols].drop_duplicates()
        if how == "intersect":
            return l.merge(r, on=cols, how="inner")
        m = l.merge(r, on=cols, how="left", indicator=True)
        return m[m["_merge"] == "left_only"].drop(columns=["_merge"])

    return bucketed_group_map(
        u, cols, per_bucket, num_buckets=num_buckets, batch_partial=partial
    )


def set_intersect(left, right, num_buckets: int = 32) -> "ray.data.Dataset":
    """SQL ``INTERSECT`` (distinct rows present on both sides)."""
    return set_op(left, right, how="intersect", num_buckets=num_buckets)


def set_except(left, right, num_buckets: int = 32) -> "ray.data.Dataset":
    """SQL ``EXCEPT`` (distinct left rows absent from right)."""
    return set_op(left, right, how="except", num_buckets=num_buckets)


def hash_split(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    boundaries: list[int],
    names: list[str],
    mod: int = 100,
    out_col: str = "split",
) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment (the standard LLM-corpus
    split): ``split = names[i]`` where ``FNV-1a64('k1|k2|…') % mod``
    falls in the half-open band ``[boundaries[i-1], boundaries[i])``
    (``boundaries`` are cumulative upper bounds; the last band is
    implicit up to ``mod``).

    Reproducible at ANY parallelism and across runs (seed-free content
    hash, the same FNV kernel as hash_sample / the seen-set bucketing),
    and leakage-safe when keyed on a grouping column (all rows of one
    user/host/url share a hash, hence a split).  Pure map stage: zero
    shuffles, zero driver state — the 100 TB shape.
    """
    from web_graph_ray.stages.sketch import fnv1a64

    if len(names) != len(boundaries) + 1:
        raise ValueError("hash_split: need len(names) == len(boundaries) + 1")
    signed = np.asarray(boundaries, dtype=np.int64)
    if not (np.all(np.diff(signed) > 0) and (len(signed) == 0 or signed[-1] < mod)):
        raise ValueError("hash_split: boundaries must be increasing and < mod")
    bounds = signed.astype(np.uint64)
    labels = np.asarray(names, dtype=object)

    def assign(t: pa.Table) -> pa.Table:
        if len(key_cols) == 1:
            keys = pc.cast(t[key_cols[0]], pa.string())
        else:
            keys = pc.binary_join_element_wise(
                *[pc.cast(t[c], pa.string()) for c in key_cols], "|"
            )
        band = fnv1a64(keys) % np.uint64(mod)
        idx = np.searchsorted(bounds, band, side="right")
        return t.append_column(out_col, pa.array(labels[idx], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Pareto frontier (skyline)
# ---------------------------------------------------------------------------


def _skyline_mask(v: np.ndarray) -> np.ndarray:
    """Boolean mask of Pareto-optimal rows of an oriented (larger =
    better) float64 matrix.  A row is dominated iff another row is ≥ on
    every column and > on at least one; duplicates dominate nothing, so
    tied optima all survive (NOT-EXISTS SQL semantics).  d=2 is a fully
    vectorized sort+sweep (O(n log n)); d>2 falls back to a
    lexicographic incremental sweep, O(n·F) with F the running frontier
    size."""
    n, d = v.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    if d == 1:
        return v[:, 0] == v[:, 0].max()
    if d == 2:
        a, b = v[:, 0], v[:, 1]
        order = np.lexsort((-b, -a))
        as_, bs = a[order], b[order]
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = as_[1:] < as_[:-1]
        gid = np.cumsum(new_grp) - 1
        grp_max_b = bs[np.flatnonzero(new_grp)]  # b sorted desc within group
        prev_max = np.full(len(grp_max_b), -np.inf)
        if len(grp_max_b) > 1:
            np.maximum.accumulate(grp_max_b[:-1], out=prev_max[1:])
        # dominated by a strictly-better-a row (its b ≥ mine), or by a
        # same-a row with strictly better b
        dominated = (bs <= prev_max[gid]) | (bs < grp_max_b[gid])
        mask = np.zeros(n, dtype=bool)
        mask[order[~dominated]] = True
        return mask
    order = np.lexsort(tuple(-v[:, k] for k in range(d - 1, -1, -1)))
    front = np.empty((0, d), dtype=np.float64)
    keep: list[int] = []
    for idx in order:
        row = v[idx]
        if front.size and bool(
            ((front >= row).all(axis=1) & (front > row).any(axis=1)).any()
        ):
            continue
        keep.append(int(idx))
        front = np.vstack([front, row[None, :]])
    mask = np.zeros(n, dtype=bool)
    mask[np.asarray(keep, dtype=np.int64)] = True
    return mask


def pareto_frontier(
    ds: "ray.data.Dataset",
    maximize: list[str],
    minimize: list[str] | tuple = (),
    max_candidate_rows: int = 1_000_000,
) -> "ray.data.Dataset":
    """Distributed Pareto-optimal set (skyline) over numeric /
    timestamp criteria: rows for which no other row is ≥ on every
    criterion and strictly better on at least one (minimize columns
    compared inverted).  Equal-on-all-criteria ties all survive —
    byte-for-byte the SQL ``WHERE NOT EXISTS (dominator)`` semantics.

    Classic partial-frontier combiner: dominance is transitive, so the
    local skyline of every block provably contains all global optima;
    each block reduces to its local frontier in one vectorized pass,
    then ONE task merges the concatenated local frontiers.  Only O(F)
    rows ever move (F = frontier size, expected O(log^{d-1} n) on
    independent criteria) — the dataset itself never shuffles.

    NaNs/NULLs in criterion columns are rejected (dominance would be
    ill-defined).  ``max_candidate_rows`` guards the merge task: on
    strongly anti-correlated criteria local frontiers stop shrinking
    and a skyline is the wrong query — fail loudly instead of OOMing
    the merge."""
    crit = list(maximize) + list(minimize)
    n_max = len(maximize)

    def orient(df: pd.DataFrame) -> np.ndarray:
        cols = []
        for i, c in enumerate(crit):
            s = df[c]
            if pd.api.types.is_datetime64_any_dtype(s):
                x = s.to_numpy().astype("datetime64[us]").view("int64").astype("float64")
            else:
                x = s.to_numpy(dtype="float64")
            if np.isnan(x).any():
                raise ValueError(
                    f"pareto_frontier: criterion column {c!r} contains "
                    "NaN/NULL; dominance is ill-defined — filter first."
                )
            cols.append(x if i < n_max else -x)
        return np.column_stack(cols)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return df[_skyline_mask(orient(df))]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > max_candidate_rows:
            raise ValueError(
                f"pareto_frontier: {len(df)} local-frontier candidate rows "
                f"(> max_candidate_rows={max_candidate_rows}); criteria are "
                "too anti-correlated for a skyline to be small — rethink "
                "the query or raise the cap deliberately."
            )
        return local(df)

    partial = ds.map_batches(local, batch_format="pandas")
    return partial.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


def _bloom_positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """Double-hashing bit positions (Kirsch–Mitzenmacher): pos_i =
    (h1 + i·h2) mod m — k independent-enough probes from two 64-bit
    hashes, all vectorized.  Shape (len, k)."""
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix) —
    full-avalanche on uint64, wrapping arithmetic."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bloom_hashes(df: pd.DataFrame, on: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams over the key tuple columns.
    h1 is pd.util.hash_pandas_object (the same stable cross-process
    hasher bucketed_group_map relies on); h2 is a splitmix64 remix of
    h1 — NOT a second hash_pandas_object call with a different
    hash_key, because hash_key only perturbs object/string hashing and
    leaves numeric columns identical (correlated probes collapse the
    filter to k≈1 and the false-positive rate by three orders)."""
    h1 = pd.util.hash_pandas_object(df[on], index=False).values.astype(np.uint64)
    # h2 must be odd so (h1 + i·h2) cycles through all residues mod 2^b
    return h1, (_splitmix64(h1) | np.uint64(1))


def build_bloom(keys: "ray.data.Dataset", on: list[str], m_bits: int = 1 << 23,
                k: int = 4, cast_to: dict | None = None) -> np.ndarray:
    """Distributed Bloom-filter build: each block maps to an m/8-byte
    partial bitmap (vectorized np.bitwise_or.at), the driver OR-folds
    the partials — O(blocks · m/8) driver bytes, never the keys
    themselves.  m_bits=2^23 (1 MiB) holds ~1.4 M keys at k=4 under 5%
    false positives; callers size m to the expected key count.

    ``cast_to`` (col → pandas dtype) aligns the key dtypes with the
    PROBE side before hashing: hash_pandas_object hashes raw
    native-width bytes, so int32 −1 and int64 −1 hash differently —
    an unaligned build would silently false-negative matching rows."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits >> 3, dtype=np.uint8)
        if len(df):
            if cast_to:
                df = df.astype(cast_to, copy=False)
            h1, h2 = _bloom_hashes(df, on)
            pos = _bloom_positions(h1, h2, k, m_bits).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    folded = np.zeros(m_bits >> 3, dtype=np.uint8)
    for b in keys.map_batches(partial, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        for raw in b["bits"]:
            folded |= np.frombuffer(raw, dtype=np.uint8)
    return folded


def bloom_probe_mask(df: pd.DataFrame, on: list[str], bits: np.ndarray,
                     m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership test: True where ALL k probed bits are set
    (possible member — Bloom filters never false-negative)."""
    if not len(df):
        return np.zeros(0, dtype=bool)
    h1, h2 = _bloom_hashes(df, on)
    pos = _bloom_positions(h1, h2, k, m_bits)
    probe = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probe.all(axis=1)


def bloom_semi_join(
    ds: "ray.data.Dataset",
    keys: "ray.data.Dataset",
    on: list[str],
    m_bits: int = 1 << 23,
    k: int = 4,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Semi join with a broadcast Bloom pre-filter: (1) build an m-bit
    Bloom filter over ``keys`` distributed, ray.put it ONCE; (2) prune
    ``ds`` map-side (no shuffle — typically drops the vast majority of
    rows when the key set is selective); (3) exact
    :func:`bucket_semi_join` on the survivors only, which removes the
    Bloom false positives.  Result ≡ bucket_semi_join(ds, keys, on),
    but the all-to-all exchange carries only the pruned survivor rows
    — the classic big-probe/small-build semi-join shape at 100 TB
    (e.g. "orders of flagged customers") where even the key SET is too
    big to broadcast exactly but an m-bit filter is not.

    The key set is materialized (it is small by the operator's own
    premise) so its lineage is not re-executed by the scrub pass, and
    its key dtypes are cast to the probe side's before hashing (raw
    native-width bytes: int32 keys vs int64 probes would otherwise
    silently drop every match)."""
    keys = _as_arrow(keys).materialize()
    ds = _as_arrow(ds)
    k_names, _ = _names_types(keys)
    if not k_names:  # all-empty (schema-less) key set: semi join is empty
        return ds.limit(0)
    schema = ds.schema()
    probe_dtypes = {
        n: t.to_pandas_dtype() for n, t in zip(schema.names, schema.types) if n in on
    }
    bits_ref = ray.put(build_bloom(keys, on, m_bits=m_bits, k=k, cast_to=probe_dtypes))

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df[bloom_probe_mask(df, on, ray.get(bits_ref), m_bits, k)]

    pruned = ds.map_batches(prune, batch_format="pandas")
    return bucket_semi_join(pruned, keys, on, num_buckets=num_buckets)


def ntile_from_rank(rank: np.ndarray, n: int, tiles: int) -> np.ndarray:
    """Exact SQL NTILE(tiles) bucket (1-based) from a 1-based global
    rank over n rows: the first n % tiles buckets get ceil(n/tiles)
    rows, the rest floor(n/tiles) — NOT the floor((r-1)·t/n)
    approximation, which interleaves the remainder instead of
    front-loading it and disagrees with every SQL engine."""
    r0 = np.asarray(rank, dtype=np.int64) - 1
    q, rem = divmod(n, tiles)
    if q == 0:
        return (r0 + 1).astype(np.int64)
    cut = rem * (q + 1)
    big = r0 // (q + 1)
    small = rem + (r0 - cut) // q
    return np.where(r0 < cut, big, small).astype(np.int64) + 1


def melt(
    ds: "ray.data.Dataset",
    id_cols: list[str],
    value_cols: list[str],
    var_col: str = "metric",
    val_col: str = "value",
) -> "ray.data.Dataset":
    """UNPIVOT (long-form melt): one output row per (input row, value
    column) — the inverse of pivot.  A pure per-batch streaming
    transform (vertical concat of one slice per value column, metric
    name attached as a constant), no shuffle, no driver state; output
    is |value_cols|× the input rows but streams block-by-block.
    Mirrors `UNPIVOT` / `UNION ALL` of per-column projections in SQL
    (reference has no unpivot; complements rollup/cube/pivot)."""

    def unpivot(df: pd.DataFrame) -> pd.DataFrame:
        # pandas' own melt picks the COMMON dtype of the value columns
        # (all-int64 stays int64 — no silent precision loss above 2^53;
        # mixed int/float upcasts to float64; strings melt as object)
        # instead of force-casting everything to float64
        return df.melt(
            id_vars=id_cols,
            value_vars=value_cols,
            var_name=var_col,
            value_name=val_col,
        )

    return ds.map_batches(unpivot, batch_format="pandas")


def value_bands(
    ds: "ray.data.Dataset",
    col: str,
    eps: float,
    num_buckets: int = 64,
    max_segments: int = 200_000,
) -> pd.DataFrame:
    """1-D single-linkage clustering over a GLOBAL value order ("value
    bands"): split the sorted column wherever the gap to the previous
    value exceeds ``eps``; a band is a maximal run of values with all
    adjacent gaps ≤ eps.  Returns per-band stats (band_id in value
    order, n_rows, lo, hi) — the gaps-and-islands pattern WITHOUT a
    partition key, which needs cross-partition stitching:

    (1) range-bucket rows by value (equal values co-bucket, like
    global_rank); (2) per bucket: sort, find internal breaks, emit one
    row PER SEGMENT (n, lo, hi) — never the rows; (3) the driver sorts
    the O(segments) summary and merges adjacent segments across bucket
    boundaries when the inter-bucket gap is ≤ eps.  Driver state is
    O(segments), guarded by ``max_segments`` (a column where every gap
    exceeds eps degenerates to one band per row — that's a sort, not a
    banding, and the guard fails loudly instead of OOMing)."""
    stats = ds.aggregate(
        ray.data.aggregate.Min(col), ray.data.aggregate.Max(col)
    )
    lo_v = float(stats[f"min({col})"])
    hi_v = float(stats[f"max({col})"])
    width = (hi_v - lo_v) / num_buckets if hi_v > lo_v else 1.0

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[col]].copy()
        v = out[col].to_numpy(dtype="float64")
        if np.isnan(v).any():
            raise ValueError(
                f"value_bands: column {col!r} contains NaN/NULL; gap "
                "comparisons are ill-defined — filter first."
            )
        out["_b"] = np.clip(
            np.floor((v - lo_v) / width).astype(np.int64), 0, num_buckets - 1
        )
        return out

    def segments(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["_b"].iloc[0])
        v = np.sort(df[col].to_numpy(dtype="float64"))
        brk = np.flatnonzero(np.diff(v) > eps) + 1
        starts = np.concatenate(([0], brk))
        ends = np.concatenate((brk, [len(v)]))
        return pd.DataFrame(
            {
                "_b": b,
                "seg": np.arange(len(starts), dtype=np.int64),
                "n": (ends - starts).astype(np.int64),
                "lo": v[starts],
                "hi": v[ends - 1],
            }
        )

    segs_ds = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .repartition(num_buckets)
        .groupby("_b")
        .map_groups(segments, batch_format="pandas")
        .materialize()
    )
    # guard BEFORE collecting: an every-gap-exceeds-eps column emits one
    # segment per row, and pulling that to the driver IS the OOM the
    # guard exists to prevent
    n_segs = segs_ds.count()
    if n_segs > max_segments:
        raise ValueError(
            f"value_bands: {n_segs} segments (> max_segments="
            f"{max_segments}); eps={eps} is too small for a banding — "
            "raise eps or the cap deliberately."
        )
    segs = segs_ds.to_pandas()
    segs = segs.sort_values(["_b", "seg"], kind="mergesort").reset_index(drop=True)
    lo_a = segs["lo"].to_numpy()
    hi_a = segs["hi"].to_numpy()
    # a new band starts where the gap to the previous segment's hi > eps
    new_band = np.concatenate(([True], lo_a[1:] - hi_a[:-1] > eps))
    band = np.cumsum(new_band)
    out = pd.DataFrame(
        {"band_id": band, "n_rows": segs["n"], "lo": lo_a, "hi": hi_a}
    ).groupby("band_id", as_index=False).agg(
        n_rows=("n_rows", "sum"), lo=("lo", "min"), hi=("hi", "max")
    )
    out["band_id"] = out["band_id"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values("band_id").reset_index(drop=True)
