#!/usr/bin/env python3
"""Build /tmp/sf10d: the 10x NEAR-DUPLICATE-heavy documents corpus
(round-7 text/multimodal + d18 sweeps).

10 copies of sf0.1 documents; copy k>0 suffixed ' #c<k>' so copies are
near-duplicates — the adversarial clone-heavy shape for anything hash-
or dedup-shaped (the r5 sweep's convention). Other tables symlink.
"""
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10d"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
# optional 3rd arg: number of CLONE CLASSES. When set, EVERY copy k
# (including k=0) gets suffix ' #c<k % classes>', so each base doc
# yields exactly `classes` distinct texts with K/classes exact clones
# each — 100x VOLUME at bounded clone density (the r5 convention held
# clone classes at 10; a 100-way near-dup clique makes any
# exact-verify LSH quadratic, on any engine).
NCLASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 0
os.makedirs(DST, exist_ok=True)

d = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
stride = int(d.doc_id.max()) + 1
copies = []
for k in range(K):
    c = d.copy()
    c["doc_id"] = c.doc_id + k * stride
    if NCLASSES:
        c["text"] = c.text + f" #c{k % NCLASSES}"
    elif k:
        c["text"] = c.text + f" #c{k}"
    c["n_chars"] = c.text.str.len()
    copies.append(c)
out = pd.concat(copies, ignore_index=True)
pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
               f"{DST}/documents.parquet")
print(f"docs: {len(out)}, chars: {out.n_chars.sum()}")

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "embeddings"]:
    p = f"{DST}/{t}.parquet"
    os.path.exists(p) or os.symlink(f"{SRC}/{t}.parquet", p)
print("done")
