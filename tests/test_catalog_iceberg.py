"""Iceberg backend: interface parity with the parquet-manifest catalog.

No Iceberg runtime jar exists in this container (offline), so the
round-trip test self-skips; what MUST hold offline is (a) the two
backends expose the same contract — method-for-method, parameter-for-
parameter — so every pipeline accepts either, and (b) the guard fails
loudly with configuration instructions instead of deep in a job.
"""

from __future__ import annotations

import inspect

import pytest

from customer_er_spark.catalog import SparkCatalog
from customer_er_spark.catalog_iceberg import IcebergCatalog, iceberg_available

CONTRACT = [
    "write_table", "append_table", "read_table", "table_meta",
    "snapshot_id", "has_snapshot", "get_state", "set_state",
    "drop_table", "list_tables", "create_database", "drop_database",
    "database", "ddl", "table_files", "resolve_file", "file_bloom",
]


def test_interface_parity():
    for meth in CONTRACT:
        base = inspect.signature(getattr(SparkCatalog, meth))
        ice = inspect.signature(getattr(IcebergCatalog, meth))
        base_params = list(base.parameters)
        ice_params = list(ice.parameters)
        # every parameter a pipeline can pass to the parquet backend must
        # be accepted by the Iceberg backend under the same name
        assert base_params == ice_params or set(base_params) <= set(ice_params), (
            meth, base_params, ice_params,
        )


def test_unavailable_raises_clearly(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg IS available here; covered by the roundtrip test")
    with pytest.raises(RuntimeError, match="spark.sql.catalog"):
        IcebergCatalog(spark)


def test_pruned_scan_from_iceberg_files_shape(spark, tmp_path):
    """r6 verdict #5: the incremental link's driver-side scan pruning must
    fire from `.files`-shaped entries (file path + rows + bytes ONLY — no
    manifest blooms/key ranges, those stay native to Iceberg's parquet).
    Offline stand-in: a facade over a real parquet catalog serves exactly
    that shape with backend='iceberg'; bucket-partition pruning must fire
    (mode='pruned'), the pruned scan must be lossless for the probe keys,
    and a backend without `.files` must report mode='iceberg-delegated'
    with the full scan."""
    import numpy as np
    from pyspark.sql import functions as F

    from customer_er_spark.config import ERConfig
    from customer_er_spark.operators.candidates import (
        band_sorted,
        with_band_bucket,
    )
    from customer_er_spark.plans import incremental as inc

    cfg = ERConfig(shuffle_partitions=4, band_buckets=8)
    cat = SparkCatalog(spark, str(tmp_path / "ice_parity"))
    bands = spark.createDataFrame(
        [(k, f"im{k}", 0) for k in range(1, 401)],
        "band_key long, image_id string, phash long",
    )
    cat.write_table(
        band_sorted(with_band_bucket(bands, cfg), cfg), "priors_bands",
        partition_by=["band_bucket"], bloom_col="band_key",
        write_options={"maxRecordsPerFile": "25"},
    )

    class IcebergFacade:
        backend = "iceberg"

        def __init__(self, inner, serve_files=True):
            self._inner, self._serve = inner, serve_files

        def table_files(self, name):
            if not self._serve:
                return None  # .files metadata table unavailable
            return [
                {
                    "path": e["path"],
                    "file": self._inner.resolve_file(e),
                    "rows": e["rows"],
                    "bytes": e["bytes"],
                }
                for e in self._inner.table_files(name)
            ]

        def table_meta(self, name):
            return self._inner.table_meta(name)

        def read_table(self, name):
            return self._inner.read_table(name)

        def resolve_file(self, e):
            return e["file"]

        def file_bloom(self, e, rg=None):
            return None

    keys = np.array([3, 7, 123], dtype=np.int64)
    buckets = {int(b) for b in np.unique(keys % cfg.band_buckets)}
    df, stats = inc._pruned_priors_bands(
        spark, IcebergFacade(cat), cfg, buckets, keys
    )
    assert stats["mode"] == "pruned", stats
    assert 0 < stats["files_read"] < stats["files_total"], stats
    got = {
        r["band_key"]
        for r in df.where(F.col("band_key").isin([3, 7, 123])).collect()
    }
    assert got == {3, 7, 123}  # lossless for every probe key

    df2, stats2 = inc._pruned_priors_bands(
        spark, IcebergFacade(cat, serve_files=False), cfg, buckets, keys
    )
    assert stats2 == {"mode": "iceberg-delegated"}, stats2
    assert df2.count() == 400  # delegated = full table, Iceberg prunes inside


def test_iceberg_roundtrip(spark, tmp_path):
    """Full contract drive — runs only where an Iceberg catalog named
    'ice' is configured (see catalog_iceberg module docstring)."""
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar in this container")
    cat = IcebergCatalog(spark, namespace="er_test")
    df = spark.range(0, 100).withColumnRenamed("id", "v")
    meta = cat.write_table(df, "t1", config_hash="abc", inputs={"x": "1"})
    assert meta["counts"]["rows_out"] == 100
    assert cat.has_snapshot("t1", "abc", {"x": "1"})
    snap0 = cat.snapshot_id("t1")
    cat.append_table(spark.range(100, 150).withColumnRenamed("id", "v"), "t1")
    assert cat.read_table("t1").count() == 150
    assert cat.snapshot_id("t1") != snap0  # append = new snapshot
    cat.set_state("fence", {"batch": 7})
    assert cat.get_state("fence") == {"batch": 7}
    with pytest.raises(ValueError):  # schema contract holds here too
        cat.append_table(spark.range(5).withColumnRenamed("id", "other"), "t1")
    cat.drop_table("t1")
    assert "t1" not in cat.list_tables()
