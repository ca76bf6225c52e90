"""Incremental workflow — link incoming records to the existing registry,
then dedup the remainder and merge (reference:
/root/reference/03_Incremental_Workflow.py).

Reference shape: `link` takes two pipes of identical schema (03:106-118),
emits only linked records with z_cluster / z_score / z_source
('priors'|'incoming'), where a prior's z_score is the max over its incoming
matches (03:202-208); accept/review/reject thresholds are prose only
(03:283-288); `match` then runs on incoming alone and new clusters are
inserted for records not already present (03:397).

Ours, made concrete and cheaper:
  * priors are NOT re-blocked each run — the initial run's signature
    checkpoint is reused (the reference recomputes Zingg blocking over the
    full priors table every time);
  * the bipartite band join only keeps cross-source pairs by construction;
  * the threshold rules are code, not prose: accept iff best score >=
    match_threshold AND the runner-up is not itself accept-grade (ambiguous
    multi-link -> review, mirroring 03:283-288's "manual review" rule);
  * registry cluster_ids are stable across runs (the initial component id
    is kept even when a cluster grows) — deliberately unlike the
    reference's per-run uuid1 minting (02B:295-309).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from customer_er_spark.catalog import SparkCatalog
from customer_er_spark.config import ERConfig
from customer_er_spark.operators.candidates import band_keys, candidate_pairs
from customer_er_spark.operators.components import connected_components
from customer_er_spark.operators.signatures import compute_signatures
from customer_er_spark.operators.verify import verify_pairs


def link_pairs(
    priors_sig: DataFrame, incoming_sig: DataFrame, cfg: ERConfig
) -> tuple[DataFrame, DataFrame]:
    """Bipartite LSH candidates: (pairs(id_l=prior, id_r=incoming),
    band_stats) — cross-source only, no within-source pairs (those belong
    to match, not link).

    Skew policy mirrors candidate_pairs: both sides are unioned, bucket
    sizes counted once, and hot bands (prior+incoming members >
    max_band_size) are salted into sub-buckets; cross-side pairs are
    generated within each sub-bucket, so one hot band shared by m priors
    and n incoming yields O((m+n)*max_band_size) pairs, never O(m*n).
    band_stats records every degraded band (same audit contract as the
    initial pipeline)."""
    from customer_er_spark.operators.candidates import salted_buckets

    pb = band_keys(priors_sig, cfg).select(
        "band_key", "image_id", F.lit("p").alias("side")
    )
    ib = band_keys(incoming_sig, cfg).select(
        "band_key", "image_id", F.lit("i").alias("side")
    )
    both = pb.unionByName(ib).repartition(cfg.shuffle_partitions, "band_key")
    salted, band_stats = salted_buckets(both, cfg)
    left = salted.where("side = 'p'").select(
        "band_key", "salt", F.col("image_id").alias("id_l")
    )
    right = salted.where("side = 'i'").select(
        "band_key", "salt", F.col("image_id").alias("id_r")
    )
    pairs = (
        left.join(right, ["band_key", "salt"]).select("id_l", "id_r").distinct()
    )
    return pairs, band_stats


def run_link(
    spark: SparkSession,
    incoming: DataFrame,
    catalog: SparkCatalog,
    cfg: ERConfig | None = None,
) -> dict:
    """Link incoming against the registry; writes `incoming_signatures`,
    `linked` (reference-shaped) and `link_decisions` tables."""
    cfg = cfg or ERConfig()
    ch = cfg.config_hash()

    priors_sig = catalog.read_table("signatures")
    inc_sig = compute_signatures(incoming, cfg)
    catalog.write_table(inc_sig, "incoming_signatures", config_hash=ch)
    inc_sig = catalog.read_table("incoming_signatures")

    # checkpoint candidates through the catalog: the bipartite band join
    # executes exactly once (the write action); verify reads the committed
    # parquet and the summary count comes free from the manifest.
    raw_pairs, link_band_stats = link_pairs(priors_sig, inc_sig, cfg)
    catalog.write_table(link_band_stats, "link_band_stats", config_hash=ch)
    cand_manifest = catalog.write_table(
        raw_pairs, "link_candidates", config_hash=ch
    )
    pairs = catalog.read_table("link_candidates")
    both_sig = priors_sig.unionByName(inc_sig)
    scored = verify_pairs(pairs, both_sig, cfg).where("is_match")

    members = catalog.read_table("cluster_members").select(
        "image_id", "cluster_id"
    )
    linked_raw = scored.join(
        members.withColumnRenamed("image_id", "id_l"), "id_l"
    )  # attach the prior's registry cluster

    # reference-shaped `linked` output: one row per record per link group,
    # z_source tags the side, prior z_score = max over its incoming matches
    prior_rows = (
        linked_raw.groupBy("id_l", "cluster_id")
        .agg(F.max("score").alias("z_score"))
        .select(
            F.col("id_l").alias("image_id"),
            F.col("cluster_id").alias("z_cluster"),
            "z_score",
            F.lit("priors").alias("z_source"),
        )
    )
    incoming_rows = linked_raw.select(
        F.col("id_r").alias("image_id"),
        F.col("cluster_id").alias("z_cluster"),
        F.col("score").alias("z_score"),
        F.lit("incoming").alias("z_source"),
    )
    linked = prior_rows.unionByName(incoming_rows)
    linked_manifest = catalog.write_table(linked, "linked", config_hash=ch)

    # decision rules (03:283-288 made executable): per incoming record rank
    # candidate clusters by best score; accept a clear single winner at/above
    # match_threshold, review ambiguous or mid-band links, reject the rest.
    per_cluster = (
        linked_raw.groupBy("id_r", "cluster_id")
        .agg(F.max("score").alias("best_score"))
    )
    w = Window.partitionBy("id_r").orderBy(
        F.col("best_score").desc(), F.col("cluster_id").asc()
    )
    ranked = per_cluster.withColumn("rk", F.row_number().over(w))
    best = ranked.where("rk = 1").select(
        F.col("id_r").alias("image_id"),
        F.col("cluster_id").alias("best_cluster"),
        "best_score",
    )
    runner = ranked.where("rk = 2").select(
        F.col("id_r").alias("image_id"),
        F.col("best_score").alias("second_score"),
    )
    decisions = (
        best.join(runner, "image_id", "left")
        .withColumn(
            "decision",
            F.when(
                (F.col("best_score") >= cfg.match_threshold)
                & (
                    F.col("second_score").isNull()
                    | (F.col("second_score") < cfg.match_threshold)
                ),
                F.lit("accept"),
            )
            .when(F.col("best_score") >= cfg.review_threshold, F.lit("review"))
            .otherwise(F.lit("reject")),
        )
    )
    catalog.write_table(decisions, "link_decisions", config_hash=ch)
    # summary counts come from the just-committed manifests — re-running
    # pairs.count()/linked.count() here would re-execute the band join and
    # the verify cascade a second time.
    return {
        "candidates": cand_manifest["counts"]["rows_out"],
        "linked_records": linked_manifest["counts"]["rows_out"],
        "decisions": {
            r["decision"]: r["count"]
            for r in catalog.read_table("link_decisions")  # committed parquet,
            .groupBy("decision").count().collect()          # not the live plan
        },
    }


def run_incremental_match(
    spark: SparkSession,
    incoming: DataFrame,
    catalog: SparkCatalog,
    cfg: ERConfig | None = None,
) -> dict:
    """After run_link: dedup the incoming set itself, then merge everything
    into the registry (prose contract 03:397).

      accepted incoming            -> join their prior cluster (stable id)
      remaining incoming           -> clustered among themselves (new ids)
      cluster z_min/maxScore       -> recomputed from the union of all
                                      verified match edges (old + link + new)
    """
    cfg = cfg or ERConfig()
    ch = cfg.config_hash()

    inc_sig = catalog.read_table("incoming_signatures")
    decisions = catalog.read_table("link_decisions")
    accepted = decisions.where("decision = 'accept'").select(
        "image_id", F.col("best_cluster").alias("cluster_id")
    )

    # match within incoming (full pipeline, incoming-only)
    pairs, _ = candidate_pairs(inc_sig, cfg)
    scored = verify_pairs(pairs, inc_sig, cfg)
    matches = scored.where("is_match").persist()  # reused across two writes
    # records accepted into the registry must not also seed new clusters:
    # drop within-incoming edges touching accepted records (their cluster
    # membership is already decided; the remaining graph re-clusters)
    acc_ids = accepted.select(F.col("image_id").alias("aid"))
    rem = (
        matches.join(acc_ids, matches.id_l == acc_ids.aid, "left_anti")
        .join(acc_ids, F.col("id_r") == acc_ids.aid, "left_anti")
    )
    new_assign = connected_components(
        rem.select("id_l", "id_r"), cfg.cc_checkpoint_every
    )

    # merged assignment for every incoming record
    inc_ids = inc_sig.select("image_id")
    merged = (
        inc_ids.join(accepted, "image_id", "left")
        .join(new_assign.withColumnRenamed("cluster_id", "new_cluster"),
              "image_id", "left")
        .withColumn(
            "cluster_id",
            F.coalesce("cluster_id", "new_cluster", "image_id"),
        )
        .select("image_id", "cluster_id")
    )

    # union of all verified edges feeding min/max link scores
    old_members = catalog.read_table("cluster_members")
    old_pairs = catalog.read_table("verified_pairs").where("is_match")
    linked = catalog.read_table("linked")
    # reconstruct accepted link edges as (prior, incoming, score) from the
    # linked table: incoming rows carry per-edge scores
    link_edge_scores = (
        linked.where("z_source = 'incoming'")
        .join(
            accepted.withColumnRenamed("cluster_id", "acc_cluster"),
            "image_id",
        )
        .where(F.col("z_cluster") == F.col("acc_cluster"))
        .select(
            F.col("image_id").alias("id_r"),
            F.col("z_cluster").alias("cluster_id"),
            F.col("z_score").alias("score"),
        )
    )
    all_edges = (
        old_pairs.select("id_l", "id_r", "score")
        .unionByName(matches.select("id_l", "id_r", "score"))
        .unionByName(
            link_edge_scores.select(
                F.col("cluster_id").alias("id_l"),  # score attaches to both ends
                "id_r",
                "score",
            )
        )
    )

    full_assign = (
        old_members.select("image_id", "cluster_id")
        .unionByName(merged)
    )
    per_member = (
        all_edges.select(F.col("id_l").alias("image_id"), "score")
        .unionByName(all_edges.select(F.col("id_r").alias("image_id"), "score"))
        .groupBy("image_id")
        .agg(F.min("score").alias("z_minScore"), F.max("score").alias("z_maxScore"))
    )
    sig_all = catalog.read_table("signatures").unionByName(inc_sig)
    new_members = (
        full_assign.join(
            sig_all.select("image_id", "caption_norm", "phash"), "image_id"
        )
        .join(per_member, "image_id", "left")
        .select(
            "cluster_id",
            "image_id",
            F.col("caption_norm").alias("caption"),
            "phash",
            "z_minScore",
            "z_maxScore",
            F.current_timestamp().alias("datetime"),
        )
    )
    n_incoming = inc_ids.count()
    n_accepted = accepted.count()
    n_new = new_assign.count()

    # IMPORTANT ordering: write_table swaps the snapshot and expires the old
    # data files, so every lazy plan reading a table's OLD snapshot must be
    # materialized (written) before that table is overwritten, and downstream
    # consumers must re-read the committed snapshot, not reuse a stale plan.
    # new_members reads old cluster_members + old verified_pairs + old
    # signatures -> it goes first.
    catalog.write_table(new_members, "cluster_members", config_hash=ch)
    catalog.write_table(
        old_pairs.select("id_l", "id_r", "score")
        .unionByName(matches.select("id_l", "id_r", "score"))
        .withColumn("is_match", F.lit(True)),
        "verified_pairs",
        config_hash=ch,
    )
    members_now = catalog.read_table("cluster_members")
    clusters = (
        members_now.groupBy("cluster_id")
        .agg(F.count("*").alias("n_members"))
        .withColumn("datetime", F.current_timestamp())
    )
    catalog.write_table(clusters, "clusters", config_hash=ch)
    # keep the full signature registry current for the next increment
    catalog.write_table(sig_all, "signatures", config_hash=ch)
    return {
        "incoming": n_incoming,
        "accepted_into_registry": n_accepted,
        "new_cluster_records": n_new,
        "total_members": members_now.count(),
    }
