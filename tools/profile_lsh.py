"""Stage-level profile of lsh_topk at a given SF (guide §1: measure first,
noop-sink isolation).  Not part of the frozen bench."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T, Window

from customer_er_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("profile_lsh")


def noop(df, label):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label:40s} {dt:8.3f}s", flush=True)
    return dt


emb = spark.read.parquet(f"{SF}/embeddings.parquet")
n = emb.count()
print("n vectors:", n)

from customer_er_spark.operators.similarity import (
    _norm2_unrolled, _dot_unrolled, hyperplane_keys,
)
from customer_er_spark.operators.banded import banded_pairs

dim, n_planes, n_tables, seed = 64, 8, 8, 17
planes = hyperplane_keys(dim, n_planes, n_tables, seed)


@F.pandas_udf(T.ArrayType(T.LongType()))
def bucket_udf(vecs: pd.Series) -> pd.Series:
    m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    out = []
    signs = np.einsum("tpd,nd->ntp", planes, m) > 0
    weights = 1 << np.arange(n_planes)
    codes = (signs * weights).sum(axis=2)
    for row in codes:
        out.append([int(t) * (1 << n_planes) + int(c) for t, c in enumerate(row)])
    return pd.Series(out)


base = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("vec")) \
    .withColumn("nrm", F.sqrt(_norm2_unrolled("vec", dim)))
base = base.persist()
bands = base.select("vid", F.explode(bucket_udf(F.col("vec"))).alias("band_key"))
noop(bands, "1 bands (bucket udf + explode)")

# bucket size histogram
hist = bands.groupBy("band_key").count().groupBy("count").count().orderBy(F.col("count").desc())
spark.sparkContext.setJobDescription("bucket histogram")
rows = hist.collect()
big = sorted(rows, key=lambda r: -r["count"])[:10]
tot_pairs = sum(r["count"] * min(r["count"] * (r["count"] - 1) // 2, r["count"] * 256) // r["count"] for r in rows)
print("top bucket sizes:", [(r["count"], r["count(1)"] if "count(1)" in r else r[1]) for r in big][:10])
est = sum(min(m * (m - 1) // 2, m * 256) * c for m, c in [(r[0], r[1]) for r in rows])
print("estimated pair volume (salt-capped):", est)

upairs, _stats = banded_pairs(bands, id_col="vid", max_band_size=256, shuffle_partitions=32)
upairs = upairs.persist()
t_pairs = noop(upairs, "2 banded_pairs (expansion+distinct)")
print("distinct pairs:", upairs.count())

cand = upairs.select(F.col("id_l").alias("query_id"), F.col("id_r").alias("neighbor_id")) \
    .unionAll(upairs.select(F.col("id_r").alias("query_id"), F.col("id_l").alias("neighbor_id")))
q = base.select(F.col("vid").alias("query_id"), F.col("vec").alias("qv"), F.col("nrm").alias("qn"))
c = base.select(F.col("vid").alias("neighbor_id"), F.col("vec").alias("cv"), F.col("nrm").alias("cn"))
scored = (
    cand.join(q, "query_id").join(c, "neighbor_id")
    .withColumn("cos", _dot_unrolled("qv", "cv", dim) / (F.col("qn") * F.col("cn")))
    .select("query_id", "neighbor_id", "cos")
)
noop(scored, "3 scored (joins + unrolled dot)")

w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
topk = (
    scored.withColumn("rank", F.row_number().over(w))
    .where(F.col("rank") <= 5)
    .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
)
noop(topk, "4 full topk (window)")

t0 = time.time()
out = topk.localCheckpoint(eager=True)
print(f"{'5 localCheckpoint of topk':40s} {time.time()-t0:8.3f}s")
print("topk rows:", out.count())
spark.stop()
