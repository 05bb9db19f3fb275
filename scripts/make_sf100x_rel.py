#!/usr/bin/env python3
"""Build /tmp/sf100x for the RELATIONAL + CORPUS-PREP 100x sweep (round 7).

100 shifted copies of sf0.1 orders+lineitem (60M lineitem / 15M orders
— both offset by the SAME per-copy orderkey stride so the
orders<->lineitem join stays consistent; custkey/suppkey/partkey are
left in range, so every dimension row now serves 100x the fact rows,
which is exactly the fan-out shape a 100-TB TPC-H-like corpus has) and
100 doc_id-shifted copies of documents (500k docs) for the corpus-prep
family. Dims + events + embeddings symlink to sf0.1.

Written row-group-at-a-time through ParquetWriter so peak memory stays
at one sf0.1 copy regardless of the multiplier.
"""
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100x"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
os.makedirs(DST, exist_ok=True)

li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
od = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
stride = int(max(li.l_orderkey.max(), od.o_orderkey.max())) + 1

w = pq.ParquetWriter(f"{DST}/lineitem.parquet",
                     pa.Table.from_pandas(li, preserve_index=False).schema)
for k in range(K):
    c = li.copy()
    c["l_orderkey"] = c.l_orderkey + k * stride
    w.write_table(pa.Table.from_pandas(c, preserve_index=False))
w.close()
print(f"lineitem: {len(li) * K} rows ({K} copies, orderkey stride {stride})")

w = pq.ParquetWriter(f"{DST}/orders.parquet",
                     pa.Table.from_pandas(od, preserve_index=False).schema)
for k in range(K):
    c = od.copy()
    c["o_orderkey"] = c.o_orderkey + k * stride
    w.write_table(pa.Table.from_pandas(c, preserve_index=False))
w.close()
print(f"orders: {len(od) * K} rows")

dc = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
dstride = int(dc.doc_id.max()) + 1
w = pq.ParquetWriter(f"{DST}/documents.parquet",
                     pa.Table.from_pandas(dc, preserve_index=False).schema)
for k in range(K):
    c = dc.copy()
    c["doc_id"] = c.doc_id + k * dstride
    w.write_table(pa.Table.from_pandas(c, preserve_index=False))
w.close()
print(f"documents: {len(dc) * K} rows (doc_id stride {dstride})")

for t in ["region", "nation", "customer", "supplier", "part",
          "events", "embeddings"]:
    dst = f"{DST}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print("done")
