"""Deduplication operator family over text documents.

The image+caption pipeline (plans/pipeline.py) is the flagship; these are
the same LSH machinery re-targeted at a plain `documents(doc_id, text, ...)`
table — the operator set a large-scale training-data pipeline needs:

  exact_dedup          hash-groupBy on normalized text (pure SQL, md5)
  minhash_lsh_pairs    shingle -> MinHash -> band -> bucket self-join
  simhash_pairs        64-bit SimHash, banded by pigeonhole chunks
  ngram_jaccard_pairs  exact character-n-gram Jaccard via a gram join
                       (pure SQL — the DuckDB-checkable near-dup oracle)
  dedup_clusters       connected components over any pair set -> keep/drop

All declarative where possible; Python only inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig
from customer_er_spark.functions.minhash import make_minhash_udf
from customer_er_spark.functions.simhash import simhash_udf
from customer_er_spark.functions.text import normalize_caption
from customer_er_spark.operators.components import connected_components


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_hash, n_copies, keep_id): one row per distinct normalized text
    with >= 1 copy; keep_id = min id (deterministic survivor)."""
    norm = normalize_caption(F.col(text_col))
    return (
        docs.select(F.col(id_col), F.md5(norm).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


def minhash_signatures(
    docs: DataFrame, cfg: ERConfig, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    mh = make_minhash_udf(cfg.shingle_k, cfg.num_hashes, cfg.minhash_seed)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        normalize_caption(F.col(text_col)).alias("text_norm"),
    ).withColumn("minhash", mh(F.col("text_norm")))


def minhash_lsh_pairs(
    docs: DataFrame,
    cfg: ERConfig | None = None,
    jaccard_min: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidate pairs via MinHash LSH, verified by the signature
    Jaccard estimate: (id_l, id_r, jacc)."""
    cfg = cfg or ERConfig()
    # persist: the signature is referenced three times (banding + both join
    # sides); without it the pandas UDF recomputes per reference.  In the
    # checkpointed pipeline (plans/pipeline.py) the catalog write plays this
    # role durably.  Unpersisted below after the eager materialization of
    # the (small) pair output, so a long-lived session does not accumulate
    # cached blocks across queries.
    sig = minhash_signatures(docs, cfg, id_col, text_col).persist()
    keys = [
        F.xxhash64(
            F.lit(b),
            *[
                F.element_at("minhash", b * cfg.rows_per_band + r + 1)
                for r in range(cfg.rows_per_band)
            ],
        )
        for b in range(cfg.bands)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*keys)).alias("band_key")
    ).repartition(cfg.shuffle_partitions, "band_key")
    left = bands.select("band_key", F.col("doc_id").alias("id_l"))
    right = bands.select("band_key", F.col("doc_id").alias("id_r"))
    pairs = (
        left.join(right, "band_key")
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .distinct()
    )
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
        .where(F.col("jacc") >= jaccard_min)
        .select("id_l", "id_r", F.round("jacc", 6).alias("jacc"))
    )
    # materialize the verified pairs (small output), then free the cached
    # signatures — downstream consumers read the checkpointed result.
    out = out.localCheckpoint(eager=True)
    sig.unpersist()
    return out


def simhash_pairs(
    docs: DataFrame,
    hamming_max: int = 6,
    chunks: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash: banded by pigeonhole on `chunks` equal
    slices (guaranteed recall for Hamming <= chunks-1), verified by full
    64-bit Hamming <= hamming_max.  Pure SQL after the hash UDF."""
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        simhash_udf(normalize_caption(F.col(text_col))).alias("simhash"),
    )
    bits = 64 // chunks
    mask = (1 << bits) - 1
    keys = [
        F.xxhash64(
            F.lit(c),
            F.shiftrightunsigned("simhash", c * bits).bitwiseAND(F.lit(mask)),
        )
        for c in range(chunks)
    ]
    bands = sig.select(
        "doc_id", "simhash", F.explode(F.array(*keys)).alias("band_key")
    )
    left = bands.select(
        "band_key", F.col("doc_id").alias("id_l"), F.col("simhash").alias("sh_l")
    )
    right = bands.select(
        "band_key", F.col("doc_id").alias("id_r"), F.col("simhash").alias("sh_r")
    )
    return (
        left.join(right, "band_key")
        .where(F.col("id_l") < F.col("id_r"))
        .select(
            "id_l",
            "id_r",
            F.bit_count(F.col("sh_l").bitwiseXOR(F.col("sh_r"))).alias("hamming"),
        )
        .where(F.col("hamming") <= hamming_max)
        .distinct()
    )


def ngram_grams(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, gram): distinct character n-grams — pure SQL (lateral
    explode over positions), no UDF, so DuckDB can replay it exactly."""
    norm = normalize_caption(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc_id"), norm.alias("t"))
        .where(F.length("t") >= n)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("t") - (n - 1))).alias("g"),
            "t",
        )
        .select("doc_id", F.substring(F.col("t"), F.col("g"), n).alias("gram"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    jaccard_min: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact n-gram-set Jaccard near-dup pairs:
    (id_l, id_r, n_inter, n_union, jacc).

    Exact (not probabilistic) — this is the oracle-checkable twin of
    minhash_lsh_pairs, and BOTH modes produce identical above-threshold
    output:

      prefix_filter=True (default, the scale path): PPJoin-style prefix
        filtering (Chaudhuri et al. SSJoin'06 / Bayardo et al. WWW'07).
        Grams are globally ordered by (doc frequency asc, gram asc); each
        doc indexes only its first ceil((1-t)*|A|)+1 grams — its RAREST
        ones.  Lemma: two sets with Jaccard >= t must share an element
        within these prefixes, so joining on prefix grams finds every
        qualifying pair while ubiquitous stopword grams (the quadratic
        skew risk of a naive gram join) never enter the index.  Exact
        intersections are then computed per candidate via array_intersect
        over the full gram sets (JVM-side, bounded by candidate count).
      prefix_filter=False: the naive full inverted-index join (kept as the
        brute-force twin for tests; its hot-gram partitions rely on AQE
        skew splitting).
    """
    grams = ngram_grams(docs, n, id_col, text_col)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    # jacc is kept as the raw (unrounded) double; oracle comparisons should
    # use the integer columns — round() of a dyadic-rational ratio (e.g.
    # 1/128) can land exactly on a .5 decimal tie, where Spark (HALF_UP)
    # and other engines (half-even) disagree.
    if not prefix_filter:
        gl = grams.select(F.col("doc_id").alias("id_l"), "gram")
        gr = grams.select(F.col("doc_id").alias("id_r"), "gram")
        inter = (
            gl.join(gr, "gram")
            .where(F.col("id_l") < F.col("id_r"))
            .groupBy("id_l", "id_r")
            .agg(F.count("*").alias("n_inter"))
        )
        sl = sizes.select(F.col("doc_id").alias("id_l"), F.col("n_grams").alias("sz_l"))
        sr = sizes.select(F.col("doc_id").alias("id_r"), F.col("n_grams").alias("sz_r"))
        return (
            inter.join(sl, "id_l")
            .join(sr, "id_r")
            .withColumn("n_union", F.col("sz_l") + F.col("sz_r") - F.col("n_inter"))
            .withColumn("jacc", F.col("n_inter") / F.col("n_union"))
            .where(F.col("jacc") >= jaccard_min)
            .select("id_l", "id_r", "n_inter", "n_union", "jacc")
        )

    from pyspark.sql import Window

    # global gram order: rare first (doc frequency asc, gram asc tie-break)
    gram_df = grams.groupBy("gram").agg(F.count("*").alias("gram_df"))
    ranked = (
        grams.join(gram_df, "gram")
        .join(sizes, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("gram_df", "gram")
            ),
        )
    )
    # prefix length ceil((1-t)*|A|)+1: one more than the provable minimum,
    # guarding float rounding on the safe (longer) side
    prefix = ranked.where(
        F.col("rk")
        <= F.ceil(F.lit(1.0 - jaccard_min) * F.col("n_grams")).cast("int") + 1
    ).select("doc_id", "gram")
    cand = (
        prefix.select(F.col("doc_id").alias("id_l"), "gram")
        .join(prefix.select(F.col("doc_id").alias("id_r"), "gram"), "gram")
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .distinct()
    )
    gram_sets = grams.groupBy("doc_id").agg(
        F.collect_list("gram").alias("gset"), F.count("*").alias("n_grams")
    )
    return (
        cand.join(
            gram_sets.select(
                F.col("doc_id").alias("id_l"),
                F.col("gset").alias("gs_l"),
                F.col("n_grams").alias("sz_l"),
            ),
            "id_l",
        )
        .join(
            gram_sets.select(
                F.col("doc_id").alias("id_r"),
                F.col("gset").alias("gs_r"),
                F.col("n_grams").alias("sz_r"),
            ),
            "id_r",
        )
        .withColumn(
            "n_inter", F.size(F.array_intersect("gs_l", "gs_r")).cast("long")
        )
        .withColumn("n_union", F.col("sz_l") + F.col("sz_r") - F.col("n_inter"))
        .withColumn("jacc", F.col("n_inter") / F.col("n_union"))
        .where(F.col("jacc") >= jaccard_min)
        .select("id_l", "id_r", "n_inter", "n_union", "jacc")
    )


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id) via connected components over any pair set;
    cluster_id = min doc_id in the component (survivor)."""
    typed = pairs.select(
        F.col("id_l").cast("string").alias("id_l"),
        F.col("id_r").cast("string").alias("id_r"),
    )
    return connected_components(typed).select(
        F.col("image_id").alias("doc_id"), "cluster_id"
    )
