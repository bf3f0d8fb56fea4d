#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: check_oracle.py <sfdir> <verify_outdir> [query ...]

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf-dir tables, sorts
columns by name (like the driver), and diffs values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Integer width is invisible to the driver's hasher (int32 rank vs int64
    # rank hash-passed in r1), so widen all ints to int64 before the dtype
    # check. What DID hash-fail was DuckDB HUGEINT, which pandas materializes
    # as float64/object — that family difference survives this widening.
    for c in df.columns:
        if str(df[c].dtype) in ("int8", "int16", "int32", "uint8", "uint16", "uint32", "uint64"):
            df[c] = df[c].astype("int64")
    return df.reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_glob = os.path.join(outdir, name, "*.parquet")
        if not glob.glob(res_glob):
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(f"SELECT * FROM '{res_glob}'").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:300]}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        # dtype parity first: the driver hashes typed values, so a DuckDB
        # HUGEINT vs Spark int64 divergence fails there even when == passes.
        dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
              if str(got[c].dtype) != str(want[c].dtype)]
        if dt:
            c, a, b = dt[0]
            print(f"FAIL {name}: dtype col {c}: spark={a} oracle={b} ({len(dt)} cols)")
            n_fail += 1
            continue
        # exact compare (NaN==NaN); dtype-insensitive via object cast
        mism = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = neq.idxmax()
                mism.append((c, i, a[i], b[i], int(neq.sum())))
        if mism:
            c, i, av, bv, n = mism[0]
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r} ({n} diffs; {len(mism)} cols)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
