#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, exact value
match after the query's own rounding; tiny float tolerance reported
separately so rounding-boundary risk is visible)."""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
RUN_VERIFY = "--no-run" not in sys.argv
ONLY = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]

if RUN_VERIFY:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "8"})
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                               if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print("VERIFY FAILED"); print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.loads((OUT / "oracle_sql.json").read_text())

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

ok = fail = 0
for name in sorted(oracle):
    pdir = OUT / name
    if not pdir.exists():
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        spark_df = norm(pq.read_table(str(pdir)).to_pandas())
        duck_df = norm(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fail += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        fail += 1; continue
    mismatch = None
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        try:
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                aa = a.astype(float).to_numpy(); bb = b.astype(float).to_numpy()
                bad = ~((aa == bb) | (abs(aa - bb) <= 1e-9 + 1e-9 * abs(bb))
                        | (pd.isna(aa) & pd.isna(bb)))
                exact_bad = (~((aa == bb) | (pd.isna(aa) & pd.isna(bb)))).sum()
                if bad.any():
                    i = bad.argmax()
                    mismatch = f"col {c} row {i}: {aa[i]} vs {bb[i]}"
                    break
                if exact_bad:
                    print(f"  warn {name}.{c}: {exact_bad} rows differ in low float bits")
            else:
                aa = a.astype(str); bb = b.astype(str)
                bad = ~(aa == bb).to_numpy()
                if bad.any():
                    i = bad.argmax()
                    mismatch = f"col {c} row {i}: {aa.iloc[i]!r} vs {bb.iloc[i]!r}"
                    break
        except Exception as e:
            mismatch = f"col {c}: compare error {e}"; break
    if mismatch:
        print(f"FAIL {name}: {mismatch}"); fail += 1
    else:
        print(f"ok   {name} ({len(spark_df)} rows)"); ok += 1

# rows-only queries
names_out = {p.name for p in OUT.iterdir() if p.is_dir()}
for name in sorted(names_out - set(oracle)):
    n = pq.read_table(str(OUT / name)).num_rows
    print(f"rows {name}: {n} rows {'ok' if n > 0 else 'EMPTY!'}")

print(f"\n{ok} ok, {fail} fail, {len(names_out - set(oracle))} rows-only")
sys.exit(1 if fail else 0)
