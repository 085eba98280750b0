#!/usr/bin/env python3
"""Round-3 VERDICT order #3: settle the dedup_simhash 0.81->1.62s drift.

Interleaved best-of-N passes over the three near-dup family members (the
bisect method from BENCH/CRAWL_BISECT.md): N passes, each timing simhash,
minhash and embedding back-to-back, so a noisy-neighbor window degrades
all three rather than silently biasing one. Prints per-query best/median.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from disco_crawl_spark.session import build_session  # noqa: E402
from disco_crawl_spark import queries as q  # noqa: E402

SF = "/root/testdata/sf0.1"
NAMES = ["dedup_simhash", "dedup_minhash_lsh", "dedup_embedding_cosine"]
N = int(sys.argv[1]) if len(sys.argv) > 1 else 6

spark = build_session("simhash-drift", master="local[32]",
                      shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
qs = q.queries()
for n in NAMES:  # warm python workers / codegen, untimed
    qs[n](spark, SF).count()
times = {n: [] for n in NAMES}
for p in range(N):
    for n in NAMES:
        t0 = time.time()
        qs[n](spark, SF).count()
        times[n].append(round(time.time() - t0, 3))
    print(f"# pass {p}: " + " ".join(f"{n}={times[n][-1]}" for n in NAMES),
          flush=True)
out = {n: {"best": min(v), "median": round(statistics.median(v), 3),
           "all": v} for n, v in times.items()}
print(json.dumps(out), flush=True)
