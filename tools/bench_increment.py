"""Increment-cost evidence: link+merge wall time AND registry bytes read
for a FIXED-SIZE increment against registries of growing size.

The banded-once contract (plans/incremental.py) claims an increment costs
O(|incoming|) compute — the registry is scanned (columnar, 3 narrow
columns) but never exploded, shuffled, or window-counted — and, since the
bucket+bloom manifest pruning landed, that the SCAN itself is pruned to
the files the increment can actually band-collide with.  Two phases:

  rebuild   registries of n and k*n images via run_initial, the SAME
            m-image increment against each: wall-time ratio (compute is
            O(incoming)) + the link's registry_scan stats.
  appends   one registry grown from n toward k*n by successive DISJOINT
            m-image increments (the streaming-ingest shape): per-step
            registry_scan stats.  The claim under test: bytes_read stays
            bounded by actual band collisions (initial-snapshot touched
            files + colliding/bloom-FP append files) while bytes_total
            grows with every merge — i.e. the scan is output-sensitive,
            not registry-sized.

Writes bench_out/increment_scaling.json and prints one JSON line.

Usage: python tools/bench_increment.py [n_small] [growth] [m_incoming]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    growth = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    m_inc = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from customer_er_spark.catalog import SparkCatalog
    from customer_er_spark.config import ERConfig
    from customer_er_spark.datagen import write_corpus
    from customer_er_spark.plans.incremental import (
        run_incremental_match,
        run_link,
    )
    from customer_er_spark.plans.pipeline import run_initial
    from customer_er_spark.session import get_spark

    spark = get_spark(
        "bench_increment", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    cfg = ERConfig(shuffle_partitions=cpus)

    # one fixed increment corpus, reused against every registry size; ids
    # get an "inc_" prefix so they never collide with registry ids (the
    # generator numbers ids sequentially per corpus)
    from pyspark.sql import functions as F

    inc_dir = tempfile.mkdtemp(prefix="inc_corpus_")
    write_corpus(inc_dir, n_base=int(m_inc / 1.25), dup_fraction=0.25,
                 seed=777)
    incoming = spark.read.parquet(f"{inc_dir}/images.parquet").withColumn(
        "image_id", F.concat(F.lit("inc_"), F.col("image_id"))
    )

    out = {"cpus": cpus, "m_incoming": m_inc, "sizes": {}}
    try:
        for n in (n_small, n_small * growth):
            reg_dir = tempfile.mkdtemp(prefix=f"reg_{n}_")
            cat_dir = tempfile.mkdtemp(prefix=f"cat_{n}_")
            try:
                write_corpus(reg_dir, n_base=int(n / 1.25),
                             dup_fraction=0.25, seed=42)
                images = spark.read.parquet(f"{reg_dir}/images.parquet")
                catalog = SparkCatalog(spark, cat_dir)
                run_initial(spark, images, catalog, cfg)
                # best-of-2 on the increment (host jitter defense); each
                # run uses a fresh run_key so nothing resumes
                walls, scan = [], None
                for i in range(2):
                    # wipe the merge's effects so each run links against
                    # the SAME registry state
                    cat2 = tempfile.mkdtemp(prefix=f"cat2_{n}_")
                    shutil.rmtree(cat2, ignore_errors=True)
                    shutil.copytree(cat_dir, cat2)
                    c2 = SparkCatalog(spark, cat2)
                    t0 = time.time()
                    ls = run_link(spark, incoming, c2, cfg, run_key=f"r{i}")
                    run_incremental_match(spark, incoming, c2, cfg)
                    walls.append(round(time.time() - t0, 3))
                    scan = ls.get("registry_scan")
                    shutil.rmtree(cat2, ignore_errors=True)
                out["sizes"][str(n)] = {
                    "registry_images": n,
                    "walls": walls,
                    "best": min(walls),
                    "registry_scan": scan,
                }
                print(f"# registry {n}: increment walls {walls} scan {scan}",
                      file=sys.stderr)
            finally:
                shutil.rmtree(reg_dir, ignore_errors=True)
                shutil.rmtree(cat_dir, ignore_errors=True)
    finally:
        shutil.rmtree(inc_dir, ignore_errors=True)

    small = out["sizes"][str(n_small)]["best"]
    big = out["sizes"][str(n_small * growth)]["best"]
    out["wall_ratio_big_vs_small"] = round(big / small, 3)
    out["registry_growth"] = growth

    # appends phase: ONE registry grown by successive disjoint increments
    # (streaming-ingest shape); the scan stats per step are the evidence
    # that per-increment registry I/O tracks band collisions, not size
    reg_dir = tempfile.mkdtemp(prefix="reg_app_")
    cat_dir = tempfile.mkdtemp(prefix="cat_app_")
    steps = []
    try:
        write_corpus(reg_dir, n_base=int(n_small / 1.25), dup_fraction=0.25,
                     seed=42)
        images = spark.read.parquet(f"{reg_dir}/images.parquet")
        catalog = SparkCatalog(spark, cat_dir)
        run_initial(spark, images, catalog, cfg)
        n_steps = max(2, (n_small * (growth - 1)) // m_inc)
        n_steps = min(n_steps, 12)  # bound tool wall time
        for i in range(n_steps):
            step_dir = tempfile.mkdtemp(prefix=f"step_{i}_")
            try:
                write_corpus(step_dir, n_base=int(m_inc / 1.25),
                             dup_fraction=0.25, seed=1000 + i)
                inc = spark.read.parquet(
                    f"{step_dir}/images.parquet"
                ).withColumn(
                    "image_id", F.concat(F.lit(f"a{i}_"), F.col("image_id"))
                )
                reg_before = catalog.table_meta("signatures")["counts"][
                    "rows_out"
                ]
                t0 = time.time()
                ls = run_link(spark, inc, catalog, cfg, run_key=f"s{i}")
                run_incremental_match(spark, inc, catalog, cfg)
                steps.append({
                    "step": i,
                    "registry_rows_before": reg_before,
                    "wall": round(time.time() - t0, 3),
                    "registry_scan": ls.get("registry_scan"),
                })
            finally:
                shutil.rmtree(step_dir, ignore_errors=True)
        out["append_growth"] = steps
        first = steps[0]["registry_scan"] or {}
        last = steps[-1]["registry_scan"] or {}
        if first.get("bytes_read") and last.get("bytes_total"):
            out["append_bytes_read_ratio_last_vs_first"] = round(
                last["bytes_read"] / first["bytes_read"], 3
            )
            out["append_bytes_total_ratio_last_vs_first"] = round(
                last["bytes_total"] / first["bytes_total"], 3
            )
    finally:
        shutil.rmtree(reg_dir, ignore_errors=True)
        shutil.rmtree(cat_dir, ignore_errors=True)
    out["_ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    with open(os.path.join(REPO, "bench_out", "increment_scaling.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
