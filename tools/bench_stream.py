"""Streaming-increment latency evidence: drive stream_images_to_registry
(the REAL Structured Streaming ingest, foreachBatch + fences) for several
disjoint micro-batches against registries of size n and growth*n, and
record per-batch wall + the pruned registry-scan footprint.

Claim under test (r5 verdict #6 + #1): with the bucket+bloom manifest
pruning, a streaming micro-batch's cost is registry-size-independent —
the per-batch registry I/O tracks actual band collisions, not how many
records (or prior micro-batches) the registry holds.

Evidence recorded per batch (from the catalog's batch_metrics state, set
by process_registry_batch, plus the StreamingQuery's own progress):
  wall_sec        link + merge wall for the batch
  registry_scan   files/bytes of priors_bands opened vs total

Writes bench_out/stream_increment.json and prints one JSON line.

Usage: python tools/bench_stream.py [n_small] [growth] [m_batch] [n_batches]
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
    m_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    n_batches = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    import pyarrow as pa
    import pyarrow.parquet as pq

    from customer_er_spark.catalog import SparkCatalog
    from customer_er_spark.config import ERConfig
    from customer_er_spark.datagen import _SCHEMA, generate, write_corpus
    from customer_er_spark.plans.pipeline import run_initial
    from customer_er_spark.session import get_spark
    from customer_er_spark.streaming.streams import stream_images_to_registry

    spark = get_spark(
        "bench_stream", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    cfg = ERConfig(shuffle_partitions=cpus)

    # micro-batch files: one parquet file per batch, disjoint generator
    # universes, ids prefixed per batch so nothing collides by id
    src_master = tempfile.mkdtemp(prefix="stream_src_")
    for i in range(n_batches):
        rows, _ = generate(
            n_base=int(m_batch / 1.25), dup_fraction=0.25, seed=5000 + i
        )
        for r in rows:
            r["image_id"] = f"b{i}_{r['image_id']}"
        pq.write_table(
            pa.Table.from_pylist(rows, schema=_SCHEMA),
            os.path.join(src_master, f"batch_{i:03d}.parquet"),
        )

    out = {
        "cpus": cpus,
        "m_batch": m_batch,
        "n_batches": n_batches,
        "sizes": {},
    }
    try:
        for n in (n_small, n_small * growth):
            reg_dir = tempfile.mkdtemp(prefix=f"sreg_{n}_")
            cat_dir = tempfile.mkdtemp(prefix=f"scat_{n}_")
            ckpt = tempfile.mkdtemp(prefix=f"sckpt_{n}_")
            src = tempfile.mkdtemp(prefix=f"ssrc_{n}_")
            try:
                write_corpus(reg_dir, n_base=int(n / 1.25),
                             dup_fraction=0.25, seed=42)
                images = spark.read.parquet(f"{reg_dir}/images.parquet")
                catalog = SparkCatalog(spark, cat_dir)
                run_initial(spark, images, catalog, cfg,
                            n_images=images.count())
                # feed the SAME batch files to this registry's stream
                for f in sorted(os.listdir(src_master)):
                    shutil.copy(os.path.join(src_master, f),
                                os.path.join(src, f))
                q = stream_images_to_registry(
                    spark, src, catalog, cfg, ckpt,
                    available_now=True, max_files_per_trigger=1,
                )
                q.awaitTermination()
                batches = []
                for bid in range(n_batches + 2):  # ids may shift by replay
                    m = catalog.get_state(f"batch_metrics::{bid}")
                    if m is not None:
                        batches.append({"batch_id": bid, **m})
                walls = [b["wall_sec"] for b in batches]
                out["sizes"][str(n)] = {
                    "registry_images": n,
                    "batches": batches,
                    "mean_batch_wall": round(sum(walls) / len(walls), 3)
                    if walls else None,
                }
                print(f"# registry {n}: batch walls {walls}", file=sys.stderr)
            finally:
                for d in (reg_dir, cat_dir, ckpt, src):
                    shutil.rmtree(d, ignore_errors=True)
    finally:
        shutil.rmtree(src_master, ignore_errors=True)

    small = out["sizes"][str(n_small)]["mean_batch_wall"]
    big = out["sizes"][str(n_small * growth)]["mean_batch_wall"]
    if small and big:
        out["batch_wall_ratio_big_vs_small"] = round(big / small, 3)
    out["registry_growth"] = growth
    out["_ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    with open(os.path.join(REPO, "bench_out", "stream_increment.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    print(json.dumps({k: v for k, v in out.items() if k != "sizes"}))


if __name__ == "__main__":
    main()
