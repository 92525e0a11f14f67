#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read each query result
parquet written by graft.Verify, run its oracle SQL in DuckDB over the same
test tables, and compare row count, column names, and a hash of values with
columns sorted by name (like the driver does)."""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def norm(df: pd.DataFrame) -> pd.DataFrame:
    # normalize dtypes the way a value-hash would see them
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind in "iu":
            s = s.astype("int64")
        elif s.dtype.kind == "f":
            s = s.astype("float64")
        out[c] = s
    return pd.DataFrame(out)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(oracle):
        pq = os.path.join(out_dir, name)
        files = glob.glob(f"{pq}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); failures += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failures += 1; continue
        g, e_ = canon(got), canon(exp)
        if list(g.columns) != list(e_.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e_.columns)}"); failures += 1; continue
        if len(g) != len(e_):
            print(f"FAIL {name}: rows {len(g)} vs {len(e_)}"); failures += 1; continue
        gn, en = norm(g), norm(e_)
        try:
            pd.testing.assert_frame_equal(gn, en, check_dtype=True, check_exact=True)
            print(f"OK   {name}: {len(g)} rows")
        except AssertionError as ex:
            print(f"FAIL {name}: values differ\n{str(ex)[:500]}")
            failures += 1
    return failures

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    sys.exit(1 if main(sf, out) else 0)
