#!/usr/bin/env python3
"""Large-VOCABULARY corpus for the BPE training scale sweep.

The driver's documents tables draw from a ~40-word vocabulary — BPE
exhausts after ~125 merges there, so an 8k–32k-merge run (the real
tokenizer-training shape) needs a corpus whose vocabulary carries
that much merge headroom. This writes (doc_id, text) parquet with a
deterministic md5-derived vocabulary: V distinct pseudo-words of 6–14
lowercase chars (headroom Σ(len−1) ≈ 9·V boundaries), Zipf-ish usage
so pair counts are skewed like real text.

Usage: make_bpe_corpus.py [DST=/tmp/bpedocs] [V=60000] [NDOCS=50000] [WPD=40]
"""
import hashlib, sys
import pyarrow as pa
import pyarrow.parquet as pq

DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bpedocs"
V = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
NDOCS = int(sys.argv[3]) if len(sys.argv) > 3 else 50000
WPD = int(sys.argv[4]) if len(sys.argv) > 4 else 40


def h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


# deterministic vocabulary: word i is 6 + (h % 9) chars of a-z
vocab = []
for i in range(V):
    x = h(f"w{i}")
    n = 6 + x % 9
    word = "".join(chr(97 + (h(f"w{i}c{j}") % 26)) for j in range(n))
    vocab.append(word)

rows_id, rows_text = [], []
for d in range(NDOCS):
    words = []
    for j in range(WPD):
        # Zipf-ish: squaring a uniform fraction skews toward low ranks
        u = h(f"d{d}p{j}") / 2**64
        words.append(vocab[int(u * u * V)])
    rows_id.append(d)
    rows_text.append(" ".join(words))

import os
os.makedirs(DST, exist_ok=True)
pq.write_table(
    pa.table({"doc_id": pa.array(rows_id, pa.int64()),
              "text": pa.array(rows_text, pa.string())}),
    f"{DST}/documents.parquet")
print(f"wrote {NDOCS} docs, vocab {V} at {DST}")
