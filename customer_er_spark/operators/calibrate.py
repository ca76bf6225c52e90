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


def calibration_observation(
    score_col: str = "score",
    match_col: str = "is_match",
    id_l: str = "id_l",
    id_r: str = "id_r",
):
    """Observed-metrics twin of calibration_report_scores: (Observation,
    aggregate columns) to attach to the verified_pairs WRITE action via
    df.observe(...), so the calibration report costs ZERO extra Spark jobs
    — the write that materializes verified_pairs computes the 10 strata x
    5 aggregates as a side effect (the same trick that collapsed the CC
    convergence test to one job per round, operators/components.py)."""
    from pyspark.sql import Observation

    obs = Observation()
    stratum = F.least(F.floor(F.col(score_col) * 10).cast("int"), F.lit(9))
    example = F.concat(
        F.col(id_l).cast("string"), F.lit("|"), F.col(id_r).cast("string")
    )
    aggs = []
    for s in range(10):
        cond = stratum == s
        aggs += [
            F.count(F.when(cond, F.lit(1))).alias(f"n_{s}"),
            F.sum(F.when(cond, F.col(match_col).cast("long"))).alias(f"m_{s}"),
            F.min(F.when(cond, F.col(score_col))).alias(f"lo_{s}"),
            F.max(F.when(cond, F.col(score_col))).alias(f"hi_{s}"),
            F.min(F.when(cond, example)).alias(f"ex_{s}"),
        ]
    return obs, aggs


def calibration_rows(metrics: dict) -> list[dict]:
    """Observation metrics -> calibration_report rows: identical values
    and shape to calibration_report_scores' output (empty strata omitted,
    exactly as a groupBy emits no row for an empty group); conditional
    count/sum/min/max over the same expressions are the same aggregates
    the groupBy runs, just evaluated during the upstream write."""
    rows = []
    for s in range(10):
        n = metrics[f"n_{s}"]
        if not n:
            continue
        rows.append(
            {
                "stratum": s,
                "n_pairs": int(n),
                "n_matches": int(metrics[f"m_{s}"] or 0),
                "min_score": float(metrics[f"lo_{s}"]),
                "max_score": float(metrics[f"hi_{s}"]),
                "example_pair": metrics[f"ex_{s}"],
            }
        )
    return rows


def calibration_schema():
    """pyarrow schema matching calibration_report_scores' Spark output
    types bit-for-bit (stratum is int32 from cast('int'))."""
    import pyarrow as pa

    return pa.schema(
        [
            ("stratum", pa.int32()),
            ("n_pairs", pa.int64()),
            ("n_matches", pa.int64()),
            ("min_score", pa.float64()),
            ("max_score", pa.float64()),
            ("example_pair", pa.string()),
        ]
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
