"""Driver-style parity harness: run queries() vs oracle_sql() via DuckDB.

Used by tests/test_queries_oracle.py and runnable standalone:
    PYTHONPATH=/root/repo python tests/parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(result, rd.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and np.isnan(v)) else v)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    return con.execute(sql).df()


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"schema: got {sorted(got.columns)} want {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows: got {len(got)} want {len(want)}")
    g, w = canonicalize(got), canonicalize(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c], w[c]
            if pd.api.types.is_float_dtype(gv):
                eq = np.array_equal(gv.to_numpy(), wv.to_numpy(), equal_nan=True)
            else:
                eq = gv.equals(wv)
            if not eq:
                neq = (gv != wv) & ~(gv.isna() & wv.isna())
                idx = neq[neq].index[:3].tolist()
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs, e.g. idx {idx} got "
                    f"{gv.loc[idx].tolist()} want {wv.loc[idx].tolist()}"
                )
    return problems


def make_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_parity(sf_dir: str, only=None, verbose=True):
    import time

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    con = make_con(sf_dir)
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_start = time.perf_counter()
        if verbose:
            print(f"[parity] {name} ...", flush=True)
        if name not in sqls:
            # rows-only check
            try:
                df = to_pandas(fn(sf_dir))
                results[name] = ["OK(rows-only, %d rows)" % len(df)] if len(df) >= 0 else ["empty"]
            except Exception as e:  # noqa: BLE001
                results[name] = [f"ERROR {type(e).__name__}: {e}"]
            continue
        try:
            got = to_pandas(fn(sf_dir))
            want = run_oracle(con, sqls[name])
            problems = compare(name, got, want)
            results[name] = problems if problems else ["OK(%d rows)" % len(got)]
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            results[name] = [f"ERROR {type(e).__name__}: {e}"]
        if verbose:
            print(f"[parity] {name} -> {results[name][0][:120]} "
                  f"({time.perf_counter() - t_start:.1f}s)", flush=True)
    return results


if __name__ == "__main__":
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) or None
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    res = run_parity(sf, only)
    width = max(len(k) for k in res)
    n_bad = 0
    for k in sorted(res):
        status = res[k]
        ok = status[0].startswith("OK")
        n_bad += 0 if ok else 1
        print(f"{k:<{width}}  {'PASS' if ok else 'FAIL'}  {'; '.join(str(s) for s in status)}")
    print(f"\n{len(res) - n_bad}/{len(res)} passing")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)
