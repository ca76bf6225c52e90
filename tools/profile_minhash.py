"""Stage-level profile of minhash_lsh_pairs at a given SF (guide §1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig
from customer_er_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("profile_minhash")
cfg = ERConfig(shuffle_partitions=32)


def noop(df, label):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label:44s} {dt:8.3f}s", flush=True)
    return dt


docs = spark.read.parquet(f"{SF}/documents.parquet")

from customer_er_spark.operators.banded import banded_pairs
from customer_er_spark.operators.dedup import minhash_band_keys, minhash_signatures

for rep in range(2):
    sig = minhash_signatures(docs, cfg)
    noop(sig, f"1 signatures (pandas UDF) rep{rep}")

sig = minhash_signatures(docs, cfg).persist()
sig.count()
bands = minhash_band_keys(sig, cfg)
noop(bands, "2 band keys (explode, sig cached)")

# bucket size histogram
hist = bands.groupBy("band_key").count().groupBy("count").count()
rows = sorted([(r[0], r[1]) for r in hist.collect()], key=lambda x: -x[0])
print("top bucket sizes:", rows[:12])
est = sum(min(m * (m - 1) // 2, m * cfg.max_band_size) * c for m, c in rows)
print("estimated salt-capped pair volume:", est)

pairs, _stats = banded_pairs(
    bands, id_col="doc_id", max_band_size=cfg.max_band_size,
    shuffle_partitions=cfg.shuffle_partitions,
)
pairs = pairs.persist()
noop(pairs, "3 banded_pairs (expansion+distinct)")
print("distinct pairs:", pairs.count())

sl = sig.select(F.col("doc_id").alias("id_l"), F.col("minhash").alias("mh_l"))
sr = sig.select(F.col("doc_id").alias("id_r"), F.col("minhash").alias("mh_r"))
out = (
    pairs.join(sl, "id_l")
    .join(sr, "id_r")
    .withColumn(
        "jacc",
        F.aggregate(
            F.zip_with("mh_l", "mh_r", lambda a, b: (a == b).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(cfg.num_hashes)),
    )
    .where(F.col("jacc") >= 0.5)
    .select("id_l", "id_r", F.round("jacc", 6).alias("jacc"))
)
noop(out, "4 jacc verify join")
t0 = time.time()
final = out.localCheckpoint(eager=True)
print(f"{'5 localCheckpoint':44s} {time.time()-t0:8.3f}s")
print("out rows:", final.count())
spark.stop()
