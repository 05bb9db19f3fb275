#!/usr/bin/env python3
"""Build /tmp/sf100ev: the 100x events corpus (round-7 events-family
sweep: 10,000,000 events / 150,000 users).

make_sf1x_events.py's shifted-copy shape at 100 copies, written
row-group-at-a-time so peak memory stays at one sf0.1 copy.
"""
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100ev"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
os.makedirs(DST, exist_ok=True)

base = pq.read_table(f"{SRC}/events.parquet")
schema = base.schema
b = base.to_pandas()
n_ev = b.event_id.max() + 1
n_us = b.user_id.max() + 1
w = pq.ParquetWriter(f"{DST}/events.parquet", schema)
for k in range(K):
    c = b.copy()
    c["event_id"] = c.event_id + k * n_ev
    c["user_id"] = c.user_id + k * n_us
    c["ts"] = c.ts + pd.to_timedelta(k, unit="s")
    w.write_table(pa.Table.from_pandas(c, preserve_index=False).cast(schema))
w.close()
print(f"events: {len(b) * K}, users: {n_us * K}")

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "documents", "embeddings"]:
    p = f"{DST}/{t}.parquet"
    os.path.exists(p) or os.symlink(f"{SRC}/{t}.parquet", p)
print("done")
