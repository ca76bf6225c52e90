"""Similarity search over an embedding column (array<float>).

Two paths, same result contract (query_id, neighbor_id, cos, rank):

  brute_force_topk   exact: cross join + JVM-side dot product.  The dot
                     product is built as an UNROLLED sum of per-dimension
                     products in a fixed left-to-right order so the duckdb
                     oracle replays bit-identical IEEE arithmetic.
  lsh_topk           scale path: random-hyperplane LSH buckets (SimHash for
                     vectors) restrict the candidate set; same scoring.
                     Probabilistic recall, measured against brute force in
                     tests.

At 10^12 scale brute force is O(n^2) and exists as the correctness oracle;
the LSH path shuffles each vector to b bucket keys and joins within bucket
(same banding machinery as the dedup engine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_unrolled(left: str, right: str, dim: int) -> Column:
    terms = [
        F.element_at(left, i + 1).cast("double")
        * F.element_at(right, i + 1).cast("double")
        for i in range(dim)
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def _norm2_unrolled(col: str, dim: int) -> Column:
    terms = [
        F.element_at(col, i + 1).cast("double") * F.element_at(col, i + 1).cast("double")
        for i in range(dim)
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every vector (excluding itself)."""
    base = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("nrm", F.sqrt(_norm2_unrolled("vec", dim)))
    q = base.select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = base.select(
        F.col("vid").alias("neighbor_id"),
        F.col("vec").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _dot_unrolled("qv", "cv", dim) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def hyperplane_keys(dim: int, n_planes: int, n_tables: int, seed: int = 17) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets (n_tables independent
    tables of n_planes bits), candidates = same bucket in any table."""
    planes = hyperplane_keys(dim, n_planes, n_tables, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = []
        signs = np.einsum("tpd,nd->ntp", planes, m) > 0  # (n, tables, planes)
        weights = 1 << np.arange(n_planes)
        codes = (signs * weights).sum(axis=2)  # (n, tables)
        for row in codes:
            out.append([int(t) * (1 << n_planes) + int(c) for t, c in enumerate(row)])
        return pd.Series(out)

    base = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("nrm", F.sqrt(_norm2_unrolled("vec", dim)))
    # persist: bucket keys feed both sides of the self-join; unpersisted
    # below after the (small) top-k output is materialized.
    buckets = base.withColumn(
        "bucket", F.explode(bucket_udf(F.col("vec")))
    ).persist()
    l = buckets.select(
        "bucket",
        F.col("vid").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    r = buckets.select(
        "bucket",
        F.col("vid").alias("neighbor_id"),
        F.col("vec").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cand = (
        l.join(r, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cos", _dot_unrolled("qv", "cv", dim) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    ).localCheckpoint(eager=True)  # n*k rows — small
    buckets.unpersist()
    return out
