#!/usr/bin/env python3
"""Local twin of the driver's correctness gate.

Runs after `graft.Verify` has dumped query results + oracle_sql.json:
for each query, executes the oracle SQL in DuckDB over the same sf
tables and compares values (columns sorted by name, rows sorted).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _hashable(v):
    """sort_values chokes on list/ndarray cells — map them to tuples."""
    if isinstance(v, (list, tuple)):
        return tuple(_hashable(x) for x in v)
    if hasattr(v, "tolist") and getattr(v, "ndim", 0) >= 1:  # ndarray
        return tuple(_hashable(x) for x in v.tolist())
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    return v


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_hashable)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values(df):
    out = []
    for row in df.itertuples(index=False):
        r = []
        for v in row:
            if isinstance(v, float):
                r.append(f"{v!r}")
            else:
                r.append(str(v))
        out.append(tuple(r))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracles = json.load(fh)
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        got_c, want_c = canon(got), canon(want)
        if list(got_c.columns) != list(want_c.columns):
            print(f"FAIL {name}: columns {list(got_c.columns)} != "
                  f"{list(want_c.columns)}")
            n_bad += 1
            continue
        if len(got_c) != len(want_c):
            print(f"FAIL {name}: rows {len(got_c)} != {len(want_c)}")
            n_bad += 1
            continue
        gv, wv = values(got_c), values(want_c)
        mismatch = [i for i, (a, b) in enumerate(zip(gv, wv)) if a != b]
        if mismatch:
            i = mismatch[0]
            print(f"FAIL {name}: {len(mismatch)} rows differ; first @{i}:")
            print(f"  spark : {gv[i]}")
            print(f"  duckdb: {wv[i]}")
            n_bad += 1
            continue
        # also flag dtype mismatches (schema check) as warnings
        dt_g = [str(t) for t in got_c.dtypes]
        dt_w = [str(t) for t in want_c.dtypes]
        warn = "" if dt_g == dt_w else f"  [dtype warn: {dt_g} vs {dt_w}]"
        print(f"OK   {name} ({len(got_c)} rows){warn}")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
