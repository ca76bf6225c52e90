"""Duplicate-flood adversarial tests for the document-dedup / ANN family.

The single most common web-scale pathology: m identical records (boilerplate,
empty strings, error pages) share EVERY band, so a naive two-sided band
self-join emits O(m^2) pairs.  Round-2 verdict: the flagship image pipeline
was protected (sub-band salting) but minhash_lsh_pairs / simhash_pairs /
lsh_topk were not.  These tests pin the fixed behavior:

  * pair volume stays O(m * max_band_size) — far below C(m, 2);
  * the representative chain keeps the flood ONE connected component
    (no silent recall loss at the cluster level);
  * distinct outsiders are not swallowed by the flood.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig
from customer_er_spark.operators.dedup import (
    dedup_clusters,
    minhash_lsh_pairs,
    simhash_pairs,
)

FLOOD_N = 2000
FLOOD_TEXT = (
    "error 404 page not found the requested resource is unavailable "
    "please contact the administrator of this website for assistance"
)


@pytest.fixture(scope="module")
def flood_docs(spark):
    rows = [(i, FLOOD_TEXT) for i in range(FLOOD_N)]
    rows += [
        (FLOOD_N + 0, "a completely different document about spark joins"),
        (FLOOD_N + 1, "yet another unrelated text concerning parquet files"),
        (FLOOD_N + 2, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_minhash_flood_bounded_and_connected(spark, flood_docs):
    cfg = ERConfig(max_band_size=16, shuffle_partitions=8)
    pairs = minhash_lsh_pairs(flood_docs, cfg, jaccard_min=0.5)
    n_pairs = pairs.count()
    # bands * m * max_band_size / 2 + chains ~ 5.2e5; C(m,2) = 2e6.  The
    # unsalted join would emit every one of the 2e6 flood pairs (identical
    # docs co-locate in all 32 bands).
    assert 0 < n_pairs <= 600_000, n_pairs
    assert n_pairs < FLOOD_N * (FLOOD_N - 1) // 4  # well under half of C(m,2)
    # every emitted pair is within the flood (outsiders don't collide)
    assert pairs.where((F.col("id_l") >= FLOOD_N) | (F.col("id_r") >= FLOOD_N)).count() == 0
    # representative chaining keeps the flood ONE component
    clusters = dedup_clusters(pairs.select("id_l", "id_r"))
    sizes = clusters.groupBy("cluster_id").count().collect()
    assert len(sizes) == 1 and sizes[0]["count"] == FLOOD_N


def test_simhash_flood_bounded_and_connected(spark, flood_docs):
    pairs = simhash_pairs(
        flood_docs, hamming_max=6, max_band_size=16, shuffle_partitions=8
    )
    n_pairs = pairs.count()
    # C(8,2)=28 pair-of-chunk keys * m * max_band_size / 2 + chains ~ 4.5e5
    # (vs C(m,2) = 2e6 unsalted)
    assert 0 < n_pairs <= 600_000, n_pairs
    flood_pairs = pairs.where((F.col("id_l") < FLOOD_N) & (F.col("id_r") < FLOOD_N))
    assert flood_pairs.where(F.col("hamming") != 0).count() == 0
    clusters = dedup_clusters(
        pairs.select("id_l", "id_r").where(
            (F.col("id_l") < FLOOD_N) & (F.col("id_r") < FLOOD_N)
        )
    )
    sizes = clusters.groupBy("cluster_id").count().collect()
    assert len(sizes) == 1 and sizes[0]["count"] == FLOOD_N


def test_lsh_topk_vector_flood_bounded(spark):
    from customer_er_spark.operators.similarity import lsh_topk

    # 1500 identical vectors land in ONE bucket of every table; a naive
    # bucket join is 1500^2 * 8 tables.  Salted, it completes fast and each
    # query still fills its top-k with exact-duplicate neighbors (cos=1).
    n, dim, k = 1500, 16, 5
    vec = [float(i % 7 - 3) or 1.0 for i in range(dim)]
    rows = [(i, vec) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_topk(
        emb, k=k, dim=dim, n_planes=4, n_tables=4,
        max_bucket_size=32, shuffle_partitions=8,
    ).persist()
    got = out.count()
    # every query that returns anything returns duplicates at cos ~ 1.0
    assert out.where(F.col("cos") < 0.999999).count() == 0
    # nearly every query fills its k slots from its sub-bucket alone
    assert got >= int(0.95 * n * k), got
    assert got <= n * k
    out.unpersist()
