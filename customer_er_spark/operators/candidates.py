"""Stage 1b — LSH banding + candidate-pair generation.

This is the engine's replacement for Zingg's learned blocking trees
("mathematical short-cuts that limit which records should be compared",
/root/reference/README.md:5, invoked inside every task — SURVEY.md §2.B B5).

Band sources (unioned, each key already folds in its band index so buckets
never collide across sources):
  * MinHash bands: signature split into `bands` slices of `rows_per_band`
    values; band key = xxhash64(band_idx, slice...).  Pairs with caption
    Jaccard s collide with prob 1-(1-s^r)^b.
  * pHash chunks: the 64-bit perceptual hash split into `phash_chunks`
    equal chunks; by pigeonhole, any pair with Hamming(phash) <= chunks-1
    shares at least one chunk — guaranteed recall for visually
    near-identical pairs regardless of caption damage.

Skew policy (explicit, per north_rule — AQE skew-join splits input
partitions but cannot bound the O(m^2) *output* of a hot band):
  * buckets with <= max_band_size members: full within-bucket self-join
    (all pairs, id_l < id_r).
  * hot buckets (> max_band_size): degrade to a STAR — every member pairs
    with the bucket's min-id representative (O(m) pairs).  Never dropped:
    connectivity through the representative keeps the component intact for
    clustering; the metrics table records every degraded band so the recall
    budget is auditable (no silent caps).

Scale notes: the bucket self-join is an equi-join on band_key after an
explicit repartition(shuffle_partitions, band_key); hot-band detection is a
groupBy on the same key (one shuffle, reused); the hot-band list is tiny and
broadcast for the anti/semi joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig


def band_keys(signatures: DataFrame, cfg: ERConfig) -> DataFrame:
    """signatures -> (image_id, band_key) one row per (record, band)."""
    mh_keys = [
        F.xxhash64(
            F.lit(b),
            *[
                F.element_at("minhash", b * cfg.rows_per_band + r + 1)
                for r in range(cfg.rows_per_band)
            ],
        )
        for b in range(cfg.bands)
    ]
    chunk_bits = 64 // cfg.phash_chunks
    mask = (1 << chunk_bits) - 1

    def chunk(c: int):
        return F.shiftrightunsigned(F.col("phash"), c * chunk_bits).bitwiseAND(
            F.lit(mask)
        )

    # multi-index pair-of-chunks keys: guarantees recall for
    # Hamming <= phash_chunks - phash_clean_chunks (see config.py)
    from itertools import combinations

    ph_keys = [
        F.xxhash64(F.lit(10_000), F.lit(ci), F.lit(cj), chunk(ci), chunk(cj))
        for ci, cj in combinations(range(cfg.phash_chunks), cfg.phash_clean_chunks)
    ] if cfg.phash_clean_chunks == 2 else [
        F.xxhash64(F.lit(10_000 + c), chunk(c)) for c in range(cfg.phash_chunks)
    ]
    return signatures.select(
        "image_id", F.explode(F.array(*mh_keys, *ph_keys)).alias("band_key")
    )


def candidate_pairs(
    signatures: DataFrame, cfg: ERConfig
) -> tuple[DataFrame, DataFrame]:
    """Returns (pairs(id_l, id_r), band_stats) — distinct unordered pairs.

    band_stats(band_key, n_members, degraded) feeds the metrics table.
    """
    bands = band_keys(signatures, cfg).repartition(
        cfg.shuffle_partitions, "band_key"
    )

    stats = bands.groupBy("band_key").agg(
        F.count("*").alias("n_members"), F.min("image_id").alias("rep_id")
    )
    band_stats = stats.withColumn(
        "degraded", F.col("n_members") > F.lit(cfg.max_band_size)
    )
    # singleton buckets generate no pairs — drop them before the join;
    # hot buckets are a tiny list, broadcast both ways.
    hot = band_stats.filter("degraded").select("band_key", "rep_id")
    useful = band_stats.filter(
        (F.col("n_members") > 1) & (~F.col("degraded"))
    ).select("band_key")

    normal = bands.join(F.broadcast(useful), "band_key")
    left = normal.select("band_key", F.col("image_id").alias("id_l"))
    right = normal.select("band_key", F.col("image_id").alias("id_r"))
    pairs_normal = left.join(right, "band_key").where(
        F.col("id_l") < F.col("id_r")
    )

    pairs_star = (
        bands.join(F.broadcast(hot), "band_key")
        .where(F.col("image_id") != F.col("rep_id"))
        .select(
            F.least("image_id", "rep_id").alias("id_l"),
            F.greatest("image_id", "rep_id").alias("id_r"),
        )
    )

    pairs = (
        pairs_normal.select("id_l", "id_r")
        .unionByName(pairs_star)
        .distinct()  # one shuffle on the pair key; AQE coalesces the output
    )
    return pairs, band_stats
