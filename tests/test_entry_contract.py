"""Mirror of the driver's correctness gate: run every queries() entry
at sf0.01 and compare against its oracle_sql() twin via DuckDB
(row-count + column names + order-insensitive values), exactly as the
driver does.  Rows-only queries get smoke checks."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SQL_CHECKED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(SQL_CHECKED))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or str(df[c].dtype) == "Int64":
            df[c] = df[c].astype("float64")  # unify int flavors & allow NaN
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked(name, con, ray_session):
    ray_df = canon(to_df(entrymod.queries()[name](SF_DIR)))
    sql_df = canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, atol=0, rtol=0)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(name, ray_session):
    res = to_df(entrymod.queries()[name](SF_DIR))
    assert len(res) > 0, f"{name}: empty result"


def test_entry(ray_session):
    res = entrymod.entry()
    assert to_df(res).shape[0] > 0


def test_no_duplicate_registry_keys():
    """A repeated dict key in queries()/oracle_sql() silently shadows
    the earlier entry (this bit once in round 4: ledger said 300
    entries, live dict had 298).  Parse the AST and assert every dict
    literal inside the two registry functions has unique string keys."""
    import ast
    import inspect

    src = inspect.getsource(entrymod)
    tree = ast.parse(src)
    for fn in ast.walk(tree):
        if not (isinstance(fn, ast.FunctionDef) and fn.name in ("queries", "oracle_sql")):
            continue
        for node in ast.walk(fn):
            if not isinstance(node, ast.Dict):
                continue
            keys = [
                k.value for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, f"duplicate keys in {fn.name}(): {sorted(dupes)}"


def test_queries_and_oracle_keys_consistent():
    """Every oracle_sql key must name a queries() entry (a twin with no
    pipeline is dead SQL the driver never checks)."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"oracle-only keys: {sorted(o - q)}"


def test_graded_window_invariants():
    """The driver grades the first 50 queries() entries.  Round-5 rule
    (SURVEY §2.8b / VERDICT r4): every graded slot must be SQL-twinned
    (rows-only entries can never produce a hash row) and — while the
    never-driver-checked backlog exists — never a re-check of an entry
    that already has a driver correctness row."""
    import glob
    import json as _json

    keys = list(entrymod.queries())
    window = keys[:50]
    twins = set(entrymod.oracle_sql())
    missing = [k for k in window if k not in twins]
    assert not missing, f"rows-only entries inside the graded window: {missing}"

    checked: set = set()
    for path in sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..",
                               "CORRECTNESS_r0*.json"))
    ):
        with open(path) as f:
            graded = set(_json.load(f))
        if graded == set(window):
            continue  # the round that graded THIS window is not a re-check
        checked |= graded
    backlog = [k for k in keys if k not in checked and k in twins]
    if len(backlog) > 50:
        rechecks = [k for k in window if k in checked]
        assert not rechecks, (
            f"graded slots wasted on already-checked entries while "
            f"{len(backlog)} never-checked entries wait: {rechecks}"
        )
