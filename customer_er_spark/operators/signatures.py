"""Stage 1a — per-record signatures.

Input : images(image_id, bytes, w, h, fmt, caption, phash)
Output: signatures(image_id, caption, caption_norm, phash, minhash[], simhash)

Everything except MinHash/SimHash is a Catalyst expression; the two hashes
are Arrow-batched pandas UDFs over the *normalized* caption.  `bytes` is
deliberately dropped here: the wide binary column must not ride through the
band/join shuffles (at 10^12 scale the signature table is ~1% the size of
the image table, which is what makes the LSH join tractable).

Replaces the signature/blocking-model computation hidden inside Zingg's
train/match tasks (/root/reference/02_Initial_Workflow_Part_B.py:229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig
from customer_er_spark.functions.minhash import make_minhash_udf
from customer_er_spark.functions.simhash import simhash_udf
from customer_er_spark.functions.text import normalize_caption


def compute_signatures(images: DataFrame, cfg: ERConfig) -> DataFrame:
    minhash_udf = make_minhash_udf(cfg.shingle_k, cfg.num_hashes, cfg.minhash_seed)
    # structured FieldDef columns (small scalars) ride along so verify can
    # score them; `bytes` and other wide columns still never pass this point
    extra = [f.column for f in cfg.fields if f.column in images.columns]
    return (
        images.select("image_id", "caption", "phash", *extra)
        # explicit fan-out BEFORE the UDFs: a compact input (few parquet
        # files) otherwise yields few scan partitions and the signature
        # stage runs on a fraction of the cluster; hash-partitioning by
        # image_id is deterministic and pre-co-locates the later
        # signature<->pair attach joins.  The wide `bytes` column was
        # already projected away, so this shuffle is cheap.
        .repartition(cfg.shuffle_partitions, "image_id")
        .withColumn("caption_norm", normalize_caption(F.col("caption")))
        .withColumn("minhash", minhash_udf(F.col("caption_norm")))
        .withColumn("simhash", simhash_udf(F.col("caption_norm")))
    )
