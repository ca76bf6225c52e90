"""Exact cosine-threshold similarity join (operators/simjoin.py).

Completeness is a theorem (AllPairs prefix bound) — so the tests hold the
operator to SET EQUALITY with a brute-force recomputation, not recall.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from customer_er_spark.operators.simjoin import (
    cosine_near_dup_pairs,
    hashed_shingle_counts,
    sparse_cosine_join,
)


def _brute_pairs(feats_rows, threshold):
    """Driver-side brute force over (vec_id, feature, weight) rows."""
    vecs = {}
    for vid, feat, w in feats_rows:
        vecs.setdefault(vid, {})[feat] = w
    ids = sorted(vecs)
    out = set()
    for i, a in enumerate(ids):
        va = vecs[a]
        na = math.sqrt(sum(w * w for w in va.values()))
        for b in ids[i + 1 :]:
            vb = vecs[b]
            dot = sum(w * vb.get(f, 0) for f, w in va.items())
            if dot == 0:
                continue
            nb = math.sqrt(sum(w * w for w in vb.values()))
            cos = dot / (na * nb)
            if cos >= threshold:
                out.add((a, b, round(cos, 6)))
    return out


def _corpus(n_random=60, n_dups=6, seed=7):
    rng = random.Random(seed)

    def words(k):
        return " ".join(
            "".join(rng.choice("abcdefgh") for _ in range(4)) for _ in range(k)
        )

    rows = [(i, words(20)) for i in range(n_random)]
    for i in range(n_dups):
        base = words(20)
        toks = base.split()
        toks[3] = "zzzz"  # one-token edit => high but not 1.0 cosine
        rows.append((1000 + 2 * i, base))
        rows.append((1001 + 2 * i, " ".join(toks)))
    return rows


def test_cosine_join_matches_bruteforce(spark):
    """Set equality with brute force at two thresholds — completeness AND
    precision, including exact rounded cosine values."""
    docs = spark.createDataFrame(_corpus(), ["doc_id", "text"])
    feats = hashed_shingle_counts(docs, dim=4096, n=3)
    feat_rows = [(r["vec_id"], r["feature"], r["weight"]) for r in feats.collect()]
    for t in (0.9, 0.5):
        got = {
            (r["id_a"], r["id_b"], r["cos"])
            for r in sparse_cosine_join(feats, t).collect()
        }
        assert got == _brute_pairs(feat_rows, t), f"threshold {t}"


def test_prefix_filter_prunes(spark):
    """The indexed prefix must be a strict subset of the full posting list
    (otherwise the 'filter' is a rename of the naive gram join)."""
    docs = spark.createDataFrame(_corpus(n_random=120), ["doc_id", "text"])
    feats = hashed_shingle_counts(docs, dim=4096, n=3)
    out, stats = sparse_cosine_join(feats, 0.9, with_stats=True)
    out.collect()
    n_feats = feats.count()
    # band_stats rows = distinct indexed prefix features; total candidate
    # volume must be far under brute force n*(n-1)/2
    n_docs = docs.count()
    brute = n_docs * (n_docs - 1) // 2
    n_cands = (
        stats.agg(
            F.sum(F.col("n_members") * (F.col("n_members") - 1) / 2)
        ).collect()[0][0]
        or 0
    )
    assert n_cands < brute / 5, (n_cands, brute)
    # prefix index smaller than the full feature table
    n_prefix = stats.agg(F.sum("n_members")).collect()[0][0] or 0
    assert n_prefix < n_feats, (n_prefix, n_feats)


def test_flood_degrades_precision_safe(spark):
    """A prefix-feature flood (max_band_size exceeded) may MISS pairs but
    must never emit a wrong one: every emitted pair's cosine is >= t."""
    rows = _corpus(n_random=40, n_dups=4, seed=11)
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = cosine_near_dup_pairs(docs, 0.9, dim=4096, n=3, max_band_size=2)
    feats = hashed_shingle_counts(docs, dim=4096, n=3)
    feat_rows = [(r["vec_id"], r["feature"], r["weight"]) for r in feats.collect()]
    truth = _brute_pairs(feat_rows, 0.9)
    got = {(r["id_a"], r["id_b"], r["cos"]) for r in out.collect()}
    assert got <= truth  # precision 1.0 unconditionally


def test_short_docs_vanish(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a b c d e"), (4, "a b c d e")],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in cosine_near_dup_pairs(docs, 0.9, dim=512, n=3).collect()
    }
    assert got == {(3, 4, 1.0)}
