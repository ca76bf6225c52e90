"""Threshold-calibration report — the deterministic replacement for the
reference's findTrainingData labeling loop
(/root/reference/02_Initial_Workflow_Part_A.py:236-285, sampler config
02A:150-159; SURVEY.md §2.B B1).

The reference samples candidate pairs for a human to label so Zingg can
learn thresholds.  Our engine's thresholds (caption_sim_min,
match_threshold, review_threshold) are config, so what a user needs is a
*stratified view of the score distribution*: how many candidate pairs land
in each similarity stratum, how many of them the current config accepts,
and a deterministic example pair per stratum to eyeball.  Pure relational
— DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_report_ratio(
    pairs: DataFrame,
    num_col: str = "n_inter",
    den_col: str = "n_union",
    id_l: str = "id_l",
    id_r: str = "id_r",
) -> DataFrame:
    """Stratify integer-ratio-scored pairs (e.g. exact n-gram Jaccard
    n_inter/n_union) into deciles.

    stratum = least((10*num) div den, 9) — INTEGER division, so the
    bucketing is bit-identical in any engine (float floor(x*10) can
    disagree across engines on dyadic-rational ties).

    -> (stratum, n_pairs, example_pair) with example_pair the
    lexicographically-minimal "id_l|id_r" string of the stratum.
    """
    stratum = F.least(
        F.expr(f"(10 * {num_col}) div {den_col}").cast("int"), F.lit(9)
    )
    example = F.concat(
        F.col(id_l).cast("string"), F.lit("|"), F.col(id_r).cast("string")
    )
    return pairs.groupBy(stratum.alias("stratum")).agg(
        F.count("*").alias("n_pairs"),
        F.min(example).alias("example_pair"),
    )


def calibration_report_scores(
    scored: DataFrame,
    score_col: str = "score",
    match_col: str = "is_match",
) -> DataFrame:
    """Pipeline variant over verified pairs (double scores): per decile,
    pair count, how many the current config accepts, and score bounds.
    Feeds the `calibration_report` catalog table a user inspects before
    moving caption_sim_min / match_threshold."""
    stratum = F.least(F.floor(F.col(score_col) * 10).cast("int"), F.lit(9))
    return scored.groupBy(stratum.alias("stratum")).agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col(match_col).cast("long")).alias("n_matches"),
        F.min(score_col).alias("min_score"),
        F.max(score_col).alias("max_score"),
        F.min(
            F.concat(F.col("id_l").cast("string"), F.lit("|"), F.col("id_r").cast("string"))
        ).alias("example_pair"),
    )
