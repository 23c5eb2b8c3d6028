"""Driver-style comparison of every queries() entry vs its DuckDB oracle:
row count, column names, order-insensitive values (floats rounded)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(4)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype).startswith(("uint", "int", "Int")):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == bool:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _oracle_pairs():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o[name]) for name in o]


def _rows_only():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name]) for name in q if name not in o]


@pytest.mark.parametrize("name,fn,sql", _oracle_pairs())
def test_query_matches_oracle(ray_session, con, name, fn, sql):
    ours = _canon(_to_pandas(fn(SF_DIR)))
    theirs = _canon(con.execute(sql).df())
    assert list(ours.columns) == list(theirs.columns), (
        f"{name}: columns {list(ours.columns)} vs {list(theirs.columns)}"
    )
    assert len(ours) == len(theirs), f"{name}: {len(ours)} vs {len(theirs)} rows"
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False, atol=1e-3)


@pytest.mark.parametrize("name,fn", _rows_only())
def test_rows_only_queries_run(ray_session, name, fn):
    df = _to_pandas(fn(SF_DIR))
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert set(["url", "cluster_id", "is_canonical"]) <= set(df.columns)


def test_cluster_membership_sf01(ray_session):
    """Membership parity at sf0.1 TOO — the scale with a near-threshold
    pair (one pair at exact J = 0.75 vs the 0.72 verify threshold; see
    q_dedup_cluster_membership's VALIDITY DOMAIN note). The sf0.01
    parametrized check can't see threshold-noise disagreements because
    that corpus has no pair anywhere near 0.72."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.1"
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ours = _canon(_to_pandas(e.queries()["dedup_cluster_membership"](sf)))
    theirs = _canon(c.execute(e.oracle_sql()["dedup_cluster_membership"]).df())
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)
