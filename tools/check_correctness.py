"""Driver-style correctness sweep: rows, schema, and a strict value-hash
(columns sorted by name, rows sorted, canonicalized values) for every
oracled query in __ray_entry__.queries() vs its oracle_sql() DuckDB twin.

Usage:
    python tools/check_correctness.py [query_name ...]
    SF_DIR=/root/testdata/sf0.001 python tools/check_correctness.py

Mirrors the per-round driver gate (CORRECTNESS_r{N}.json) locally so a
canonicalization drift is caught before the round ends, at the driver's
sf0.01 scale rather than the pytest suite's sf0.001."""

import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 6)
        return repr(r + 0.0 if r == 0 else r)  # -0.0 canonicalizes as 0.0
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return repr(v)


def value_hash(df):
    df = df[sorted(df.columns)]
    rows = sorted(
        ",".join(canon_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{os.path.join(SF_DIR, t)}.parquet'"
        )
    qs = m.queries()
    oracles = m.oracle_sql()
    only = sys.argv[1:]
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(SF_DIR))
        except Exception as e:
            print(f"{name}: RAY ERROR {e!r}")
            fails.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: no_oracle rows={len(ray_df)} ({dt:.1f}s)")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: SQL ERROR {e!r}")
            fails.append(name)
            continue
        rows_ok = len(ray_df) == len(sql_df)
        schema_ok = sorted(ray_df.columns) == sorted(sql_df.columns)
        hash_ok = rows_ok and schema_ok and value_hash(ray_df) == value_hash(sql_df)
        status = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(
            f"{name}: {status} rows={len(ray_df)}/{len(sql_df)} "
            f"schema={schema_ok} hash={hash_ok} ({dt:.1f}s)"
        )
        if status == "FAIL" and schema_ok and rows_ok:
            # show first differing canonical row for debugging
            a = sorted(
                ",".join(canon_cell(v) for v in row)
                for row in ray_df[sorted(ray_df.columns)].itertuples(index=False)
            )
            b = sorted(
                ",".join(canon_cell(v) for v in row)
                for row in sql_df[sorted(sql_df.columns)].itertuples(index=False)
            )
            for x, y in zip(a, b):
                if x != y:
                    print(f"   ray: {x[:200]}\n   sql: {y[:200]}")
                    break
    print("FAILS:", fails or "none")
    ray.shutdown()


if __name__ == "__main__":
    main()
