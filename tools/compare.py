#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB with the sfDir parquet files
registered as views, sorts columns by name, and compares values.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp units etc.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = norm(pq.read_table(files[0]).to_pandas())
        try:
            exp = norm(con.execute(sql).fetch_df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        if got.shape[0] == 0:
            print(f"WARN {name}: zero rows (vacuous pass)")
        eq = True
        for c in got.columns:
            a, b = got[c], exp[c]
            col_eq = (a.isna() & b.isna()) | (a == b)
            try:
                bad = int((~col_eq).sum())
            except TypeError:
                bad = sum(1 for x, y in zip(a, b)
                          if not (x == y or (pd.isna(x) and pd.isna(y))))
            if bad:
                eq = False
                idx = [i for i in range(len(a)) if not (
                    (pd.isna(a.iloc[i]) and pd.isna(b.iloc[i])) or
                    (a.iloc[i] == b.iloc[i]).all() if hasattr(a.iloc[i] == b.iloc[i], 'all')
                    else (a.iloc[i] == b.iloc[i]))][:3]
                print(f"FAIL {name}: col {c} {bad} mismatches, e.g. rows {idx}:")
                for i in idx:
                    print(f"    got={a.iloc[i]!r} exp={b.iloc[i]!r}")
        if eq:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
