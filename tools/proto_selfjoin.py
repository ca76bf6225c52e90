"""Prototype: banded_pairs pair-expansion via codegen self-join vs the
interpreted HOF flatten/transform path — equivalence + timing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig
from customer_er_spark.operators.banded import banded_pairs, salted_bands
from customer_er_spark.operators.dedup import minhash_band_keys, minhash_signatures
from customer_er_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("proto_selfjoin")
cfg = ERConfig(shuffle_partitions=32)

docs = spark.read.parquet(f"{SF}/documents.parquet")
sig = minhash_signatures(docs, cfg).persist()
sig.count()
bands = minhash_band_keys(sig, cfg).persist()
bands.count()


def selfjoin_pairs(bands, id_col, max_band_size, shuffle_partitions,
                   payload_cols=(), gate=None, emit_payload=False):
    mem_struct = F.struct(F.col(id_col).alias("id"), *payload_cols)
    repart = bands.repartition(shuffle_partitions, "band_key")
    salted, band_stats = salted_bands(repart, max_band_size, id_col)
    side = salted.select("band_key", "salt", mem_struct.alias("m"),
                         "n_salts").persist()
    a = side.select("band_key", "salt", F.col("m").alias("l"))
    b = side.select("band_key", "salt", F.col("m").alias("r"))
    cond = F.col("l.id") < F.col("r.id")
    if gate:
        cond = cond & F.expr(gate.format(l="l", r="r"))
    out_cols = [F.col("l.id").alias("id_l"), F.col("r.id").alias("id_r")]
    if emit_payload:
        out_cols += [F.col(f"l.{c}").alias(f"{c}_l") for c in payload_cols]
        out_cols += [F.col(f"r.{c}").alias(f"{c}_r") for c in payload_cols]
    pairs_within = a.join(b, ["band_key", "salt"]).where(cond).select(*out_cols)

    reps = (
        side.where(F.col("n_salts") > 1)
        .groupBy("band_key", "salt")
        .agg(F.min("m").alias("rep"))
    )
    wchain = Window.partitionBy("band_key").orderBy("salt")
    chain_cond = F.col("nxt").isNotNull() & (F.col("rep.id") != F.col("nxt.id"))
    if gate:
        chain_cond = chain_cond & F.expr(gate.format(l="rep", r="nxt"))
    chain = (
        reps.withColumn("nxt", F.lead("rep").over(wchain))
        .where(chain_cond)
        .select(
            F.when(F.col("rep.id") < F.col("nxt.id"),
                   F.struct(F.col("rep").alias("l"), F.col("nxt").alias("r")))
            .otherwise(F.struct(F.col("nxt").alias("l"), F.col("rep").alias("r")))
            .alias("p")
        )
        .select(F.col("p.l.id").alias("id_l"), F.col("p.r.id").alias("id_r"),
                *([F.col(f"p.l.{c}").alias(f"{c}_l") for c in payload_cols]
                  + [F.col(f"p.r.{c}").alias(f"{c}_r") for c in payload_cols]
                  if emit_payload else []))
    )
    return pairs_within.unionByName(chain).distinct(), side


for rep in range(3):
    t0 = time.time()
    new_pairs, side = selfjoin_pairs(bands, "doc_id", cfg.max_band_size, 32)
    n_new = new_pairs.count()
    side.unpersist()
    print(f"selfjoin rep{rep}: {time.time()-t0:.3f}s rows={n_new}", flush=True)

for rep in range(3):
    t0 = time.time()
    old_pairs, _ = banded_pairs(bands, id_col="doc_id",
                                max_band_size=cfg.max_band_size,
                                shuffle_partitions=32)
    n_old = old_pairs.count()
    print(f"hof      rep{rep}: {time.time()-t0:.3f}s rows={n_old}", flush=True)

# set equivalence
new_pairs, side = selfjoin_pairs(bands, "doc_id", cfg.max_band_size, 32)
old_pairs, _ = banded_pairs(bands, id_col="doc_id",
                            max_band_size=cfg.max_band_size,
                            shuffle_partitions=32)
diff = new_pairs.exceptAll(old_pairs).count() + old_pairs.exceptAll(new_pairs).count()
print("set diff:", diff)
spark.stop()
