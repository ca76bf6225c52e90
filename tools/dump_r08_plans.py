"""Dump .explain('formatted') for the round-8-touched queries into
plans/r08/<query>_<tag>.txt.  Usage: python tools/dump_r08_plans.py <tag>
(run from the round-start tree for tag=before, from the final tree for
tag=after).  Explain-only — nothing executes except tiny metadata jobs.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("PLANS_OUT", "/root/repo/plans/r08")

import __spark_entry__ as entry_mod
from customer_er_spark.session import get_spark

# plan-only dump: disable the operators' eager materialization barrier so
# .explain sees the full composition instead of a post-checkpoint RDD scan
import customer_er_spark.operators.materialize as _mat

_mat.materialize = lambda df, *a, **k: df

spark = get_spark("dump_r08_plans", master="local[4]")
qs = entry_mod.queries()

# raw bench operators (what the frozen bench times) + touched declared queries
from bench import _raw_operator_overrides

targets = dict(_raw_operator_overrides())
for name in ["simhash_pairs", "duplicate_spans", "dedup_substrings",
             "cosine_near_dup", "minhash_lsh_pairs"]:
    targets[f"query_{name}"] = qs[name]

os.makedirs(OUT, exist_ok=True)
for name, fn in targets.items():
    try:
        df = fn(spark, SF)
    except Exception as e:  # raw ops materialize eagerly; plan-only callers skip
        print(f"skip {name}: {e}")
        continue
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)
spark.stop()
