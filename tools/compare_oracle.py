#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate: run each
oracle_sql.json entry against the same parquet tables, normalize (columns
sorted by name, rows sorted), and diff against the Spark output parquet."""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name in sorted(oracle):
    try:
        spark_df = duckdb.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        oracle_df = con.execute(oracle[name]).df()
        a, b = normalize(spark_df), normalize(oracle_df)
        status = []
        if list(a.columns) != list(b.columns):
            status.append(f"COLS spark={list(a.columns)} oracle={list(b.columns)}")
        elif len(a) != len(b):
            status.append(f"ROWS spark={len(a)} oracle={len(b)}")
        else:
            for c in a.columns:
                av, bv = a[c], b[c]
                if str(av.dtype) != str(bv.dtype):
                    status.append(f"DTYPE {c}: {av.dtype} vs {bv.dtype}")
                try:
                    if av.dtype.kind == "f":
                        import numpy as np
                        if not np.allclose(av.fillna(-1e308), bv.fillna(-1e308), rtol=0, atol=0):
                            status.append(f"VALUES {c}")
                    else:
                        if not av.fillna("<NA>").astype(str).equals(bv.fillna("<NA>").astype(str)):
                            status.append(f"VALUES {c}")
                except Exception as e:
                    status.append(f"CMPERR {c}: {e}")
        if status:
            fails.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
            if "ROWS" in status[0]:
                print("  spark head:", a.head(3).to_dict("records"))
                print("  oracle head:", b.head(3).to_dict("records"))
        else:
            print(f"OK   {name} ({len(a)} rows)")
    except Exception as e:
        fails.append(name)
        print(f"ERR  {name}: {e}")

no_oracle = [d.split("/")[-1] for d in glob.glob(f"{out_dir}/q_*") if d.split("/")[-1] not in oracle]
print("\nrows-only (no oracle):", no_oracle)
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-checked queries match")
sys.exit(1 if fails else 0)
