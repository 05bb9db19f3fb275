#!/usr/bin/env python3
"""Build /tmp/sf1x for the EVENTS-family 10x sweep (round 6).

10 shifted copies of sf0.1 events: event_id and user_id offset per
copy (10x distinct users - the scale shape that stresses sessionize /
cohort / funnel partitioning), ts jittered forward k seconds so copies
are not byte-identical. All other tables symlink to sf0.1 (the events
family reads only `events`; the other views just need to resolve).
"""
import os
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1x"
os.makedirs(DST, exist_ok=True)

base = pq.read_table(f"{SRC}/events.parquet").to_pandas()
n_ev = base.event_id.max() + 1
n_us = base.user_id.max() + 1
copies = []
for k in range(10):
    c = base.copy()
    c["event_id"] = c.event_id + k * n_ev
    c["user_id"] = c.user_id + k * n_us
    c["ts"] = c.ts + pd.to_timedelta(k, unit="s")
    copies.append(c)
out = pd.concat(copies, ignore_index=True)
pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
               f"{DST}/events.parquet")
print(f"events: {len(out)} rows, {out.user_id.nunique()} users")

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "documents", "embeddings"]:
    dst = f"{DST}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print("done")
