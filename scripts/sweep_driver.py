import subprocess, sys, time
ORDER = ["d3_dedup_minhash_lsh","d11_fuzzy_clusters","d15_dedup_fuzzy_incremental",
         "s6_embedding_clusters","s2_knn_lsh","g15_scc","g16_sssp",
         "g6_connected_components","g10_reduce_pipeline","g13_assembly_stats",
         "g21_label_propagation","g5_unitigs","g0_overlap","d1_dedup_exact",
         "d4_dedup_simhash","d5b_dedup_embedding_lsh","d6_dedup_clusters",
         "d7_dedup_incremental","d8_dedup_normalized","d12_dedup_funnel",
         "d14_substring_profile","d17_paragraph_dedup",
         "d13_dedup_editdist","d10_containment","d2_dedup_ngram_jaccard"]
TO = int(sys.argv[1]) if len(sys.argv) > 1 else 480
for name in ORDER:
    t0 = time.time()
    try:
        r = subprocess.run(["python3", "-u", "/root/repo/scripts/sweep_one.py",
                            name, "/tmp/sf1x", "/tmp/vsf1"],
                           capture_output=True, text=True, timeout=TO)
        out = (r.stdout + r.stderr).strip().splitlines()
        print((out[-1] if out else f"ERR {name}: no output") + f" [{time.time()-t0:.0f}s]", flush=True)
    except subprocess.TimeoutExpired:
        print(f"TIMEOUT {name} after {TO}s", flush=True)
print("SWEEP_DONE", flush=True)
