"""Deduplication operator family over text documents.

The image+caption pipeline (plans/pipeline.py) is the flagship; these are
the same LSH machinery re-targeted at a plain `documents(doc_id, text, ...)`
table — the operator set a large-scale training-data pipeline needs:

  exact_dedup          hash-groupBy on normalized text (pure SQL, md5)
  minhash_lsh_pairs    shingle -> MinHash -> band -> salted in-partition
                       pair expansion (operators/banded.py)
  simhash_pairs        64-bit md5 SimHash — pure Catalyst (NO Python UDF),
                       banded by pigeonhole chunks through the same salted
                       kernel, and DuckDB-replayable bit for bit
  ngram_jaccard_pairs  exact character-n-gram Jaccard via a gram join
                       (pure SQL — the DuckDB-checkable near-dup oracle)
  dedup_clusters       connected components over any pair set -> keep/drop

Skew policy: every banded self-join here routes through
operators/banded.banded_pairs — hot buckets (duplicate floods: boilerplate,
empty strings, error pages that share every band) are sub-salted to
O(m * max_band_size) pair volume with representative chaining for
connectivity, never O(m^2).  All declarative where possible; Python only
inside Arrow-batched pandas UDFs (MinHash signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig
from customer_er_spark.functions.minhash import make_minhash_udf
from customer_er_spark.functions.text import normalize_caption
from customer_er_spark.operators.banded import banded_pairs
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
    from customer_er_spark.functions.partitioning import fan_out

    mh = make_minhash_udf(cfg.shingle_k, cfg.num_hashes, cfg.minhash_seed)
    # adaptive fan-out BEFORE the UDF (same lesson as
    # signatures.compute_signatures): a compact one-row-group parquet
    # input otherwise runs the whole signature stage on ONE task —
    # measured 10-13.5 s single-task vs ~1 s fanned at sf1.0.  No-op when
    # the scan already offers enough splits (functions/partitioning.py).
    return fan_out(
        docs.select(
            F.col(id_col).alias("doc_id"),
            normalize_caption(F.col(text_col)).alias("text_norm"),
        ),
        cfg.shuffle_partitions,
        "doc_id",
    ).withColumn("minhash", mh(F.col("text_norm")))


def minhash_band_keys(sig: DataFrame, cfg: ERConfig) -> DataFrame:
    """(doc_id, band_key): one row per (doc, band); the wide minhash array
    is projected AWAY here — pairs are gated and deduplicated on 8-byte
    keys first, signatures join back after (verify-shuffle-width lesson)."""
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
    return sig.select("doc_id", F.explode(F.array(*keys)).alias("band_key"))


def minhash_lsh_pairs(
    docs: DataFrame,
    cfg: ERConfig | None = None,
    jaccard_min: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    catalog=None,
    table: str | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash LSH, verified by the signature
    Jaccard estimate: (id_l, id_r, jacc).

    Catalog-mode scratch output defaults to a per-parameters table name
    (scratch_name), so concurrent calls with different configs sharing one
    catalog never clobber each other's intermediates.

    Scale shape: band rows -> banded_pairs (ONE exchange, in-partition pair
    expansion, hot-band sub-salting with representative chaining, distinct)
    -> join the 128-long signatures back onto the (small) distinct pair set
    for the Jaccard-estimate verify.  A duplicate flood of m identical docs
    costs O(m * max_band_size) pairs, not O(m^2)."""
    cfg = cfg or ERConfig()
    # persist: the signature is referenced three times (banding + both join
    # sides); without it the pandas UDF recomputes per reference.  In the
    # checkpointed pipeline (plans/pipeline.py) the catalog write plays this
    # role durably.  Unpersisted below after the eager materialization of
    # the (small) pair output, so a long-lived session does not accumulate
    # cached blocks across queries.
    sig = minhash_signatures(docs, cfg, id_col, text_col).persist()
    # distinct=False: the Jaccard estimate is a pure function of the pair
    # and the >= jaccard_min filter is highly selective, so candidates are
    # scored WITH band multiplicity and only the few survivors are deduped
    # below — the pair-key distinct exchange (21.2M rows at sf1.0 guarding
    # a 2.5k-row result) disappears from the plan.
    pairs, _stats = banded_pairs(
        minhash_band_keys(sig, cfg),
        id_col="doc_id",
        max_band_size=cfg.max_band_size,
        shuffle_partitions=cfg.shuffle_partitions,
        distinct=False,
    )
    # Jaccard-estimate verify: score the (narrow) candidate pairs against a
    # BOUNDED broadcast of the signature matrix (functions/pairscore.py —
    # count_equal/num_hashes is exactly the aggregate(zip_with(...)) sum of
    # 0.0/1.0 doubles, so values are bit-identical).  The prior join path
    # shipped the 128-long arrays onto every candidate through two wide
    # shuffles (21M pairs x ~2 KB at sf1.0) and evaluated the interpreted
    # zip_with chain per pair — measured 17 s of the stage; it remains the
    # fallback for oversized or non-long-id tables.
    from customer_er_spark.functions.pairscore import (
        collect_bounded_matrix,
        equality_fraction_pair_scores,
    )
    import numpy as np

    matrix = collect_bounded_matrix(
        sig, "doc_id", "minhash", np.int64, max_rows=500_000
    )
    if matrix is not None:
        scored = equality_fraction_pair_scores(
            docs.sparkSession, pairs, matrix[0], matrix[1], cfg.num_hashes
        )
    else:
        sl = sig.select(F.col("doc_id").alias("id_l"), F.col("minhash").alias("mh_l"))
        sr = sig.select(F.col("doc_id").alias("id_r"), F.col("minhash").alias("mh_r"))
        scored = (
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
            .select("id_l", "id_r", "jacc")
        )
    out = (
        scored.where(F.col("jacc") >= jaccard_min)
        .select("id_l", "id_r", F.round("jacc", 6).alias("jacc"))
        .distinct()  # survivors only (jacc is pair-deterministic, so
        #              distinct here equals the old pre-score distinct)
    )
    # materialize the verified pairs (small output), then free the cached
    # signatures — downstream consumers read the committed/checkpointed
    # result.  Pass a catalog for a durable snapshot commit (cluster mode);
    # the default localCheckpoint is the single-box fallback.
    from customer_er_spark.operators.materialize import materialize, scratch_name

    if table is None:
        table = scratch_name("minhash_pairs", cfg.config_hash(), jaccard_min)
    out = materialize(out, catalog, table, config_hash=cfg.config_hash())
    sig.unpersist()
    from customer_er_spark.operators.banded import release_scratch

    release_scratch(pairs)  # kernel checkpoint blocks: freed, not GC-deferred
    return out


# ---------------------------------------------------------------------------
# SimHash — md5-based, pure Catalyst, DuckDB-replayable
# ---------------------------------------------------------------------------
#
# Token hash = first 16 hex chars (64 bits) of md5(token); bit i of the
# token hash (i = 4*(p-1) + b for hex-digit position p in 1..16, bit b in
# 0..3) votes +1/-1; the document's SimHash bit i is 1 iff the vote sum is
# positive.  The hash is carried as two non-negative 32-bit halves
# (sim_lo = bits 0..31, sim_hi = bits 32..63) so every expression stays
# inside plain BIGINT arithmetic in BOTH engines — no 64-bit sign games.
# Spark and DuckDB evaluate the *same* generated scalar SQL, so the oracle
# can never drift from the operator.

_HEX = "0123456789abcdef"


def _simhash_bit_sql(p: int, b: int, instr_fn: str) -> str:
    """SQL for bit b of hex digit p of md5 column `m` (0/1)."""
    return f"(({instr_fn}('{_HEX}', substring(m, {p}, 1)) - 1) >> {b}) & 1"


def _simhash_half_sql(bits: range, instr_fn: str) -> str:
    """SQL assembling SimHash bits `bits` (absolute indices) into one
    non-negative 32-bit half from the vote-count columns c_<i>."""
    terms = [
        f"(CASE WHEN c_{i} > 0 THEN {1 << (i - bits.start)} ELSE 0 END)"
        for i in bits
    ]
    return "(" + " + ".join(terms) + ")"


def _simhash_vote_sqls(instr_fn: str) -> list[str]:
    """64 aggregate SQL strings: c_<i> = sum over tokens of (2*bit_i - 1)."""
    out = []
    for i in range(64):
        p, b = i // 4 + 1, i % 4
        out.append(
            f"sum(2 * ({_simhash_bit_sql(p, b, instr_fn)}) - 1) AS c_{i}"
        )
    return out


def simhash_sql(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, sim_hi, sim_lo): 64-bit md5 SimHash as two uint32-valued
    BIGINT halves — pure Catalyst (explode + md5 + 64 codegen aggregates),
    no Python in the path.  Docs with empty normalized text are excluded
    (no tokens -> no signature)."""
    from customer_er_spark.functions.partitioning import fan_out

    toks = (
        # adaptive fan-out BEFORE the token explode + md5 + 64 partial-agg
        # columns: a one-row-group parquet input otherwise runs the whole
        # map-side vote aggregation (the stage's dominant cost) on ONE
        # task.  The shuffle moved is just (id, normalized text) — narrow
        # — and it is a no-op when the scan already offers enough splits.
        fan_out(
            docs.select(
                F.col(id_col).alias("doc_id"),
                normalize_caption(F.col(text_col)).alias("t"),
            ).where(F.length("t") > 0),
            32,
            "doc_id",
        )
        .select("doc_id", F.explode(F.split("t", " ")).alias("tk"))
        .select("doc_id", F.md5("tk").alias("m"))
    )
    votes = toks.groupBy("doc_id").agg(
        *[F.expr(s) for s in _simhash_vote_sqls("instr")]
    )
    return votes.select(
        "doc_id",
        F.expr(_simhash_half_sql(range(32, 64), "instr")).alias("sim_hi"),
        F.expr(_simhash_half_sql(range(0, 32), "instr")).alias("sim_lo"),
    )


def simhash_oracle_sql(
    hamming_max: int = 6, table: str = "documents"
) -> str:
    """DuckDB replay of simhash_pairs: same generated bit expressions, then
    a brute-force O(n^2) self-join (the oracle does not band — pigeonhole
    banding with chunks > hamming_max finds exactly this set)."""
    norm = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    votes = ",\n               ".join(_simhash_vote_sqls("strpos"))
    hi = _simhash_half_sql(range(32, 64), "strpos")
    lo = _simhash_half_sql(range(0, 32), "strpos")
    return f"""
        WITH d AS (SELECT doc_id, {norm} AS t FROM {table}),
        tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tk
                FROM d WHERE length(t) > 0),
        md AS (SELECT doc_id, md5(tk) AS m FROM tok),
        votes AS (SELECT doc_id,
               {votes}
               FROM md GROUP BY doc_id),
        sim AS (SELECT doc_id, {hi} AS sim_hi, {lo} AS sim_lo FROM votes)
        SELECT a.doc_id AS id_l, b.doc_id AS id_r,
               CAST(bit_count(xor(a.sim_hi, b.sim_hi))
                    + bit_count(xor(a.sim_lo, b.sim_lo)) AS INT) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim_hi, b.sim_hi))
              + bit_count(xor(a.sim_lo, b.sim_lo)) <= {hamming_max}
    """


def simhash_pairs(
    docs: DataFrame,
    hamming_max: int = 6,
    chunks: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_band_size: int = 1024,
    shuffle_partitions: int = 32,
) -> DataFrame:
    """Near-dup pairs by SimHash: (id_l, id_r, hamming).

    max_band_size is 1024 here (vs 256 for the image pipeline): 2-chunk
    SimHash keys on natural text still concentrate a few hundred documents
    in the most popular chunk-value pairs (measured max 291 at sf0.1 —
    skew, not duplication), and a 1024-member bucket costs at most ~0.5M
    in-partition gated codegen comparisons — sub-second — while a genuine
    flood (>> 1024 identical texts sharing ALL keys) still salts safely.

    MULTI-INDEX pair-of-chunks banding (same scheme as the image pipeline's
    pHash keys, candidates.band_keys / HmSearch-style): the 64-bit SimHash
    splits into `chunks` equal slices and every unordered PAIR of chunks
    forms one band key.  Pigeonhole: a pair within Hamming distance
    chunks-2 keeps >= 2 clean chunks, so it shares at least one 2-chunk
    key — with hamming_max <= chunks - 2 the banded result EQUALS the
    brute-force set (which is what simhash_oracle_sql checks).

    Why pairs of chunks and not single chunks: SimHash bit votes on natural
    text are dominated by common tokens, so single 8-bit chunk values are
    heavily SKEWED — buckets grow linearly with corpus size and the salted
    kernel would degrade recall on perfectly ordinary corpora (measured at
    sf0.1: single-chunk banding lost 8% of true pairs to salting).
    2-chunk keys have 2^16 effective values — ~256x fewer random
    collisions, buckets stay small on natural data, and salting engages
    only for genuine duplicate floods (which share ALL keys and still
    degrade safely to O(m * max_band_size) + chain connectivity).

    The full 64-bit Hamming gate runs in-partition before the distinct, so
    random 2-chunk collisions die in codegen without being shuffled."""
    if 64 % chunks or 32 % (64 // chunks):
        raise ValueError("chunks must be one of 2, 4, 8, 16, 32, 64")
    if hamming_max > chunks - 2:
        raise ValueError(
            f"hamming_max {hamming_max} exceeds the pigeonhole guarantee of "
            f"{chunks} chunks in pairs (recall only assured up to {chunks - 2})"
        )
    sim = simhash_sql(docs, id_col, text_col)
    cb = 64 // chunks
    mask = (1 << cb) - 1

    def chunk(c: int):
        lo_bit = c * cb
        half = F.col("sim_lo") if lo_bit < 32 else F.col("sim_hi")
        shift = lo_bit if lo_bit < 32 else lo_bit - 32
        return F.shiftrightunsigned(half, shift).bitwiseAND(F.lit(mask))

    from itertools import combinations

    keys = [
        F.xxhash64(F.lit(ci), F.lit(cj), chunk(ci), chunk(cj))
        for ci, cj in combinations(range(chunks), 2)
    ]
    bands = sim.select(
        "doc_id", "sim_hi", "sim_lo", F.explode(F.array(*keys)).alias("band_key")
    )
    gate = (
        f"(bit_count({{l}}.sim_hi ^ {{r}}.sim_hi) "
        f"+ bit_count({{l}}.sim_lo ^ {{r}}.sim_lo)) <= {hamming_max}"
    )
    pairs, _stats = banded_pairs(
        bands,
        id_col="doc_id",
        payload_cols=("sim_hi", "sim_lo"),
        gate=gate,
        max_band_size=max_band_size,
        shuffle_partitions=shuffle_partitions,
        emit_payload=True,
    )
    return pairs.select(
        "id_l",
        "id_r",
        (
            F.bit_count(F.col("sim_hi_l").bitwiseXOR(F.col("sim_hi_r")))
            + F.bit_count(F.col("sim_lo_l").bitwiseXOR(F.col("sim_lo_r")))
        ).cast("int").alias("hamming"),
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


def exact_jaccard_for_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram-set Jaccard for an EXISTING candidate pair set:
    (id_l, id_r, n_inter, n_union).  Pure SQL (gram sets + array_intersect)
    so DuckDB can replay the same values; cost is bounded by the candidate
    count, not n^2."""
    gram_sets = ngram_grams(docs, n, id_col, text_col).groupBy("doc_id").agg(
        F.collect_list("gram").alias("gset"), F.count("*").alias("n_grams")
    )
    return (
        pairs.select("id_l", "id_r")
        .join(
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
        .select("id_l", "id_r", "n_inter", "n_union")
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
    return (
        exact_jaccard_for_pairs(cand, docs, n, id_col, text_col)
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
