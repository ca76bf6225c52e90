"""Quick best-of-N timing of the heavy bench queries (same methodology as
the frozen bench.py: build df, count, wall-clock), for iteration between
full bench runs.  Usage: python tools/bench_heavy.py [sf_dir] [query ...]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
ONLY = sys.argv[2:]
N = int(os.environ.get("N_RUNS", "3"))

import __spark_entry__ as entry_mod
from bench import _raw_operator_overrides
from customer_er_spark.session import get_spark

spark = get_spark("bench_heavy", master="local[32]", shuffle_partitions=32)
qfns = dict(entry_mod.queries())
qfns.update(_raw_operator_overrides())

names = ONLY or ["minhash_lsh_pairs", "simhash_pairs", "embedding_topk_lsh"]
for name in names:
    runs = []
    for _ in range(N):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df = qfns[name](spark, SF)
        n = df.count()
        runs.append(round(time.time() - t0, 3))
    print(f"{name:24s} best={min(runs):8.3f}s runs={runs} rows={n}", flush=True)
spark.stop()
