"""Driver-contract correctness: run every registry query at sf0.01 and
compare against its DuckDB oracle the same way the driver does — row count,
column names, and order-insensitive value comparison."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        rows = result.take_all()
        return pd.DataFrame(rows)
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return pd.DataFrame(result)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _compare(name, ray_df, sql_df):
    assert len(ray_df) == len(sql_df), (
        f"{name}: row count {len(ray_df)} != oracle {len(sql_df)}")
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}")
    a, b = _normalize(ray_df), _normalize(sql_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            for i, (x, y) in enumerate(zip(av, bv)):
                ok = (pd.isna(x) and pd.isna(y)) or (
                    not pd.isna(x) and not pd.isna(y)
                    and math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9))
                assert ok, f"{name}.{c}[{i}]: {x} != {y}"
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), (
                f"{name}.{c}: value mismatch\n{av.head()}\nvs\n{bv.head()}")


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(ray_session, con, name):
    ray_df = _to_pandas(QUERIES[name](SF_DIR))
    sql_df = con.sql(ORACLES[name]).df()
    _compare(name, ray_df, sql_df)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(ray_session, name):
    if name.startswith("tokens_") and name != "tokens_validation_summary":
        pytest.skip("covered by tokens pipeline tests (slow)")
    df = _to_pandas(QUERIES[name](SF_DIR))
    assert df is not None and len(df.columns) > 0


def test_entry_smoke(ray_session):
    ds = entry_mod.entry()
    rows = ds.take_all() if hasattr(ds, "take_all") else ds
    assert len(rows) >= 0
