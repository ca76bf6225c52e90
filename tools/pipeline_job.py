"""spark-submit entry point for the image dedup pipeline (north-rule job).

    spark-submit --master local[N] --py-files dist/customer_er_spark.zip \
        tools/pipeline_job.py <corpus_dir> <catalog_dir> <cores>

Prints one JSON line: {"cores", "images", "wall_sec", "images_per_sec",
"recall", "precision"}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    corpus_dir, catalog_dir, cores = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = (
        SparkSession.builder.appName(f"pipeline-job-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from customer_er_spark.catalog import SparkCatalog
    from customer_er_spark.config import ERConfig
    from customer_er_spark.plans.pipeline import recall_vs_truth, run_initial

    catalog = SparkCatalog(spark, catalog_dir)
    cfg = ERConfig(shuffle_partitions=cores)
    images = spark.read.parquet(f"{corpus_dir}/images.parquet")
    n = images.count()

    t0 = time.time()
    summary = run_initial(spark, images, catalog, cfg, n_images=n)
    wall = time.time() - t0

    truth = spark.read.parquet(f"{corpus_dir}/truth_pairs.parquet")
    rec = recall_vs_truth(spark, catalog.read_table("cluster_members"), truth)
    print(
        json.dumps(
            {
                "cores": cores,
                "images": n,
                "wall_sec": round(wall, 2),
                "images_per_sec": round(n / wall, 2),
                "recall": round(rec["recall"], 4),
                "precision": round(rec["precision"], 4),
                # per-stage walls: the scaling-efficiency evidence that
                # survives this sandbox's 2-3x wall-clock jitter
                "stages": {
                    k: v.get("wall_sec")
                    for k, v in summary.items()
                    if isinstance(v, dict) and "wall_sec" in v
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
