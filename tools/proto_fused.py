"""Prototype: fused bucket expand+score for minhash (pairs never cross the
Arrow boundary) vs the join+scorer path — equivalence + timing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F

from customer_er_spark.config import ERConfig
from customer_er_spark.functions.pairscore import (
    collect_bounded_matrix,
    equality_fraction_pair_scores,
)
from customer_er_spark.operators.banded import banded_pairs, salted_bands
from customer_er_spark.operators.dedup import minhash_band_keys, minhash_signatures
from customer_er_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("proto_fused")
cfg = ERConfig(shuffle_partitions=32)
docs = spark.read.parquet(f"{SF}/documents.parquet")
sig = minhash_signatures(docs, cfg).persist()
sig.count()
m = collect_bounded_matrix(sig, "doc_id", "minhash", np.int64, 500_000)
bands = minhash_band_keys(sig, cfg).persist()
bands.count()


def fused(bands, ids, mat, denom, jmin, max_band_size, parts):
    """Salted band rows -> surviving (id_l, id_r, jacc) with id_l < id_r,
    WITH multiplicity (same contract as banded_pairs(distinct=False) +
    equality scorer + filter)."""
    b = spark.sparkContext.broadcast((ids, mat))
    repart = bands.repartition(parts, "band_key")
    salted, _stats = salted_bands(repart, max_band_size, id_col="doc_id")
    rows = salted.select("band_key", "salt", "doc_id", "n_salts")

    def gen(batches):
        ids_, mat_ = b.value
        bk, st, di, ns = [], [], [], []
        for rb in batches:
            bk.append(rb.column(0).to_numpy(zero_copy_only=False))
            st.append(rb.column(1).to_numpy(zero_copy_only=False))
            di.append(rb.column(2).to_numpy(zero_copy_only=False))
            ns.append(rb.column(3).to_numpy(zero_copy_only=False))
        if not bk:
            return
        BK = np.concatenate(bk); ST = np.concatenate(st)
        DI = np.concatenate(di); NS = np.concatenate(ns)
        # group rows by (band_key, salt); within each bucket emit all pairs
        order = np.lexsort((DI, ST, BK))
        BK, ST, DI, NS = BK[order], ST[order], DI[order], NS[order]
        key_change = np.flatnonzero((BK[1:] != BK[:-1]) | (ST[1:] != ST[:-1]))
        starts = np.r_[0, key_change + 1]
        ends = np.r_[key_change + 1, len(BK)]
        out_l, out_r, out_j = [], [], []
        DIDX = np.searchsorted(ids_, DI)
        for s, e in zip(starts, ends):
            msz = e - s
            if msz < 2:
                continue
            iu, ju = np.triu_indices(msz, k=1)
            li = DIDX[s:e][iu]
            ri = DIDX[s:e][ju]
            eq = (mat_[li] == mat_[ri]).sum(axis=1)
            keep = eq >= jmin * denom
            if keep.any():
                a = DI[s:e][iu][keep]; c = DI[s:e][ju][keep]
                lo = np.minimum(a, c); hi = np.maximum(a, c)
                out_l.append(lo); out_r.append(hi)
                out_j.append(eq[keep] / float(denom))
        # chain edges for hot bands: min doc per (band, salt), consecutive
        # salts; gate through the same jacc filter
        hot = NS > 1
        if hot.any():
            BKh, STh, DIh = BK[hot], ST[hot], DI[hot]
            # rows sorted by (bk, st, di): first row of each (bk, st) group
            # is the min doc id (ids sorted within group)
            kc = np.flatnonzero((BKh[1:] != BKh[:-1]) | (STh[1:] != STh[:-1]))
            gs = np.r_[0, kc + 1]
            rep_bk, rep_di = BKh[gs], DIh[gs]
            same_band = rep_bk[1:] == rep_bk[:-1]
            a, c = rep_di[:-1][same_band], rep_di[1:][same_band]
            nz = a != c
            a, c = a[nz], c[nz]
            if len(a):
                li = np.searchsorted(ids_, a); ri = np.searchsorted(ids_, c)
                eq = (mat_[li] == mat_[ri]).sum(axis=1)
                keep = eq >= jmin * denom
                if keep.any():
                    lo = np.minimum(a[keep], c[keep])
                    hi = np.maximum(a[keep], c[keep])
                    out_l.append(lo); out_r.append(hi)
                    out_j.append(eq[keep] / float(denom))
        if out_l:
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.concatenate(out_l), type=pa.int64()),
                 pa.array(np.concatenate(out_r), type=pa.int64()),
                 pa.array(np.concatenate(out_j), type=pa.float64())],
                names=["id_l", "id_r", "jacc"])

    return rows.mapInArrow(gen, schema="id_l long, id_r long, jacc double")


def current(bands):
    pairs, _ = banded_pairs(bands, id_col="doc_id",
                            max_band_size=cfg.max_band_size,
                            shuffle_partitions=32, distinct=False)
    return equality_fraction_pair_scores(spark, pairs, m[0], m[1],
                                         cfg.num_hashes).where(F.col("jacc") >= 0.5)

for rep in range(3):
    t0 = time.time()
    nf = fused(bands, m[0], m[1], cfg.num_hashes, 0.5, cfg.max_band_size, 32) \
        .select("id_l", "id_r", F.round("jacc", 6).alias("jacc")).distinct().count()
    print(f"fused   rep{rep}: {time.time()-t0:.2f}s rows={nf}", flush=True)
for rep in range(3):
    t0 = time.time()
    nc = current(bands).select("id_l", "id_r", F.round("jacc", 6).alias("jacc")).distinct().count()
    print(f"current rep{rep}: {time.time()-t0:.2f}s rows={nc}", flush=True)

a = fused(bands, m[0], m[1], cfg.num_hashes, 0.5, cfg.max_band_size, 32) \
    .select("id_l", "id_r", F.round("jacc", 6).alias("jacc")).distinct()
c = current(bands).select("id_l", "id_r", F.round("jacc", 6).alias("jacc")).distinct()
print("set diff:", a.exceptAll(c).count() + c.exceptAll(a).count())
spark.stop()
