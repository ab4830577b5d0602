#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Verify parquet dump
(row count, column names, sorted-row value hash). Usage:
  python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> iso strings, floats -> repr
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: repr(float(v)) if pd.notna(v) else "NULL")
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None else "NULL")
        else:
            out[c] = s.astype(str)
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns), kind="mergesort").reset_index(drop=True)

fails = 0
# spark-only outputs (no oracle SQL): the driver applies a weaker
# rows-only check — mirror that here
for d in sorted(os.listdir(out_dir)):
    pdir = os.path.join(out_dir, d)
    if not os.path.isdir(pdir) or d in oracle or (only and d not in only):
        continue
    try:
        n = pq.read_table(pdir).num_rows
        print(f"{'ok  ' if n > 0 else 'FAIL'} {d}: rows-only, {n} rows")
        fails += 0 if n > 0 else 1
    except Exception as e:
        print(f"FAIL {d}: rows-only read error: {e}"); fails += 1

for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pdir = f"{out_dir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = pq.read_table(pdir).to_pandas()
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fails += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}"); fails += 1; continue
    g, e = canon(got), canon(exp)
    if g.equals(e):
        print(f"ok   {name}: {len(got)} rows")
    else:
        diff = (g != e).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"FAIL {name}: value mismatch in {int(diff.sum())}/{len(g)} rows")
        for i in idx:
            for c in g.columns:
                if g.at[i, c] != e.at[i, c]:
                    print(f"     row {i} col {c}: spark={g.at[i,c]!r} oracle={e.at[i,c]!r}")
        fails += 1
print("PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
