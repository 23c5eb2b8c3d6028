"""Driver-replica preflight: run EVERY queries() entry the way the
grading driver does — fresh process, ray.init BEFORE importing
__ray_entry__, cwd somewhere sick_ray is NOT importable — and compare
each oracled query against its DuckDB oracle at sf0.01 (rows, sorted
column names, order-insensitive values).

This is the sweep the verify skill mandates before a round ends: it
catches function-local-import/cloudpickle regressions that pytest
(repo-cwd Ray workers) cannot see.

Usage:
    python scripts/preflight.py [sf_dir]     # default /root/testdata/sf0.01

Prints one line per query and a final JSON summary; exit 1 on any
failure.
"""

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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


def _canon(df):
    import numpy as np

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


def main():
    # foreign cwd FIRST: imports below must resolve via sys.path, and
    # worker-side function-local imports must fail here if they would
    # fail under the driver
    os.chdir("/tmp")

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, REPO)

    import duckdb
    import pandas as pd

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    q, o = e.queries(), e.oracle_sql()
    report, n_fail = {}, 0
    for name, fn in q.items():
        t0 = time.time()
        row = {"oracled": name in o}
        try:
            ours = _canon(_to_pandas(fn(SF_DIR)))
            row["rows"] = int(len(ours))
            if name in o:
                theirs = _canon(con.execute(o[name]).df())
                row["oracle_rows"] = int(len(theirs))
                assert list(ours.columns) == list(theirs.columns), (
                    f"columns {list(ours.columns)} vs {list(theirs.columns)}")
                assert len(ours) == len(theirs), (
                    f"{len(ours)} vs {len(theirs)} rows")
                pd.testing.assert_frame_equal(
                    ours, theirs, check_dtype=False, atol=1e-3)
            row["ok"] = True
        except Exception as ex:
            row["ok"] = False
            row["err"] = f"{type(ex).__name__}: {ex}"[:400]
            traceback.print_exc()
            n_fail += 1
        row["sec"] = round(time.time() - t0, 2)
        report[name] = row
        print(f"{'PASS' if row['ok'] else 'FAIL'} "
              f"{'[oracle]' if row['oracled'] else '[rows  ]'} "
              f"{name:40s} {row['sec']:7.2f}s", flush=True)

    # entry() smoke under driver conditions
    try:
        df = _to_pandas(e.entry())
        assert len(df) > 0
        print(f"PASS [entry ] entry() -> {len(df)} rows", flush=True)
    except Exception as ex:
        n_fail += 1
        print(f"FAIL [entry ] {type(ex).__name__}: {ex}", flush=True)

    summary = {
        "sf_dir": SF_DIR,
        "n_queries": len(q),
        "n_oracled": len(o),
        "n_fail": n_fail,
    }
    print(json.dumps(summary))
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
