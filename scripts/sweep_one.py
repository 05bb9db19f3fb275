"""Compare ONE query's dumped parquet against its DuckDB oracle. Args: name sfDir outDir"""
import json, sys
from pathlib import Path
import duckdb, pandas as pd, pyarrow.parquet as pq
name, SF_DIR, OUT = sys.argv[1], sys.argv[2], Path(sys.argv[3])
oracle = json.loads((OUT / "oracle_sql.json").read_text())
con = duckdb.connect()
con.execute("SET temp_directory='/tmp/duck_tmp'")
con.execute("SET max_temp_directory_size='20GB'")
con.execute("SET memory_limit='24GB'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)
odf = con.execute(oracle[name]).df()
sdf = pq.read_table(str(OUT / name)).to_pandas()
a, b = norm(sdf), norm(odf)
rows = len(a) == len(b); cols = list(a.columns) == list(b.columns)
vals = rows and cols and a.astype(str).equals(b.astype(str))
if not vals and rows and cols:
    import numpy as np
    vals = True
    for c in a.columns:
        if a[c].dtype.kind == 'f' or b[c].dtype.kind == 'f':
            if not np.allclose(a[c].astype(float), b[c].astype(float), rtol=0, atol=1e-9, equal_nan=True):
                vals = False; break
        elif not a[c].astype(str).equals(b[c].astype(str)):
            vals = False; break
print(("ok  " if vals else "FAIL") + f" {name} ({len(a)} rows vs {len(b)})")
sys.exit(0 if vals else 1)
