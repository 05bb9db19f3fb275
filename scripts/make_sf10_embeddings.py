#!/usr/bin/env python3
"""Build /tmp/sf10e: the 10x embeddings corpus (round-7 ANN-tier
sweep: s10/s11/d19 at 20,000 vectors).

10 copies of sf0.1 embeddings, vec_id offset per copy, components
ROTATED by k so cross-copy vectors are NOT near-duplicates (the r5
convention — dedup shape comes from make_sf10_docs.py, not here).
"""
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10e"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
os.makedirs(DST, exist_ok=True)

t = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
stride = int(t.vec_id.max()) + 1
copies = []
for k in range(K):
    c = t.copy()
    c["vec_id"] = c.vec_id + k * stride
    if k:
        c["embedding"] = c.embedding.map(
            lambda v, k=k: np.roll(np.asarray(v, dtype=np.float32), k).tolist())
    copies.append(c)
out = pd.concat(copies, ignore_index=True)
schema = pq.ParquetFile(f"{SRC}/embeddings.parquet").schema_arrow
pq.write_table(pa.Table.from_pandas(out, preserve_index=False).cast(schema),
               f"{DST}/embeddings.parquet")
print(f"vectors: {len(out)}")

for x in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents"]:
    p = f"{DST}/{x}.parquet"
    os.path.exists(p) or os.symlink(f"{SRC}/{x}.parquet", p)
print("done")
