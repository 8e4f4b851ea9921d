#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify / QuickVerify),
registers the parquet tables from <sfDir> as DuckDB views, runs each oracle
SQL, and compares against the Spark result parquet at <outDir>/<name>/.

Compare semantics mirror the driver: columns sorted by NAME, rows sorted by
all columns, values hashed after normalization (floats rounded to 9 sig
figs, NaN/None canonicalized). Prints one line per query + a summary.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NAN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    rows.sort()
    return [cols[i] for i in order], rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            o_cols, o_rows = canon(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        try:
            s_cols, s_rows = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark read error {e}")
            n_bad += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL {name}: schema spark={s_cols} oracle={o_cols}")
            n_bad += 1
        elif len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_bad += 1
        elif s_rows != o_rows:
            diff = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows))
                        if a != b)
            print(f"FAIL {name}: hash mismatch first diff row {diff}:\n"
                  f"  spark : {s_rows[diff]}\n  oracle: {o_rows[diff]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
