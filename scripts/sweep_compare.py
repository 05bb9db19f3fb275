import json, signal, sys, time
from pathlib import Path
import duckdb, pandas as pd, pyarrow.parquet as pq

SF_DIR = "/tmp/sf1x"
OUT = Path("/tmp/vsf1")
ORDER = ["d3_dedup_minhash_lsh","d11_fuzzy_clusters","d15_dedup_fuzzy_incremental",
         "s6_embedding_clusters","s2_knn_lsh","g15_scc","g16_sssp",
         "g6_connected_components","g10_reduce_pipeline","g13_assembly_stats",
         "g21_label_propagation","g5_unitigs","g0_overlap","d1_dedup_exact",
         "d4_dedup_simhash","d5b_dedup_embedding_lsh","d6_dedup_clusters",
         "d7_dedup_incremental","d8_dedup_normalized","d12_dedup_funnel",
         "d14_substring_profile","d17_paragraph_dedup",
         "d13_dedup_editdist","d10_containment","d2_dedup_ngram_jaccard"]
PER_QUERY_TIMEOUT = int(sys.argv[1]) if len(sys.argv) > 1 else 600

oracle = json.loads((OUT / "oracle_sql.json").read_text())

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)

class TO(Exception): pass
def handler(sig, frame): raise TO()
signal.signal(signal.SIGALRM, handler)

for name in ORDER:
    if name not in oracle: print(f"skip {name} (no oracle)", flush=True); continue
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    t0 = time.time()
    signal.alarm(PER_QUERY_TIMEOUT)
    try:
        odf = con.execute(oracle[name]).df()
        signal.alarm(0)
        sdf = pq.read_table(str(OUT / name)).to_pandas()
        a, b = norm(sdf), norm(odf)
        rows = len(a) == len(b)
        cols = list(a.columns) == list(b.columns)
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
        status = "ok  " if vals else "FAIL"
        print(f"{status} {name} ({len(a)} rows vs {len(b)}) [{time.time()-t0:.0f}s]", flush=True)
    except TO:
        print(f"TIMEOUT {name} after {PER_QUERY_TIMEOUT}s", flush=True)
    except Exception as e:
        signal.alarm(0)
        print(f"ERR  {name}: {str(e)[:200]}", flush=True)
    con.close()
print("SWEEP_DONE", flush=True)
