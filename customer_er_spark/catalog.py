"""Thin table catalog with snapshot manifests — Iceberg-like semantics over
parquet directories.

The north rule targets Iceberg tables; this container has no Iceberg runtime
jar (no network), so all pipeline code talks to this abstraction instead of
paths.  `SparkCatalog` provides:

    write_table(df, name, ...)   atomic snapshot commit (write to a fresh
                                 snapshot dir, then atomically rename a JSON
                                 manifest pointing at it)
    read_table(name)             read the current snapshot
    has_snapshot(name, config_hash, inputs)
                                 resume check: a stage is skippable iff a
                                 committed snapshot exists whose config hash
                                 AND upstream snapshot ids match
    table_meta(name)             manifest dict (snapshot id, lineage, counts)

On a real cluster the same interface maps 1:1 onto Iceberg:
write_table -> df.writeTo(tbl).createOrReplace(), snapshot_id -> Iceberg
snapshot id, has_snapshot -> snapshot summary properties.  The reference's
analog is Delta saveAsTable + DESCRIBE DETAIL
(/root/reference/01_Prepare_Data.py:173-180,
 /root/reference/02_Initial_Workflow_Part_A.py:88).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SparkCatalog:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "manifest.json")

    # -- manifest ------------------------------------------------------------
    def table_meta(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def snapshot_id(self, name: str) -> str | None:
        meta = self.table_meta(name)
        return meta["snapshot_id"] if meta else None

    def has_snapshot(
        self,
        name: str,
        config_hash: str | None = None,
        inputs: dict[str, str] | None = None,
    ) -> bool:
        meta = self.table_meta(name)
        if meta is None:
            return False
        if config_hash is not None and meta.get("config_hash") != config_hash:
            return False
        if inputs is not None and meta.get("inputs") != inputs:
            return False
        return True

    # -- IO -------------------------------------------------------------------
    def write_table(
        self,
        df: DataFrame,
        name: str,
        config_hash: str = "",
        inputs: dict[str, str] | None = None,
        partition_by: list[str] | None = None,
        extra_meta: dict | None = None,
    ) -> dict:
        """Write df as a fresh snapshot and commit it atomically.

        The data lands in  <table>/snap-<id>/  first; the manifest rename is
        the commit point, so a killed run never exposes a half-written
        snapshot (the kill-and-rerun resumability test relies on this).
        """
        snap_id = f"snap-{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
        tdir = self._table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        data_dir = os.path.join(tdir, snap_id)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        n_files = sum(
            1 for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        # row count from the written files (metadata-cheap column-pruned
        # scan) — never df.count(), which would recompute the whole plan
        rows_out = self.spark.read.parquet(data_dir).count()
        manifest = {
            "table": name,
            "snapshot_id": snap_id,
            "path": data_dir,
            "schema": df.schema.jsonValue(),
            "config_hash": config_hash,
            "inputs": inputs or {},
            "n_files": n_files,
            "counts": {"rows_out": rows_out},
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            **(extra_meta or {}),
        }
        old = self.table_meta(name)
        tmp = self._manifest_path(name) + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(name))  # atomic commit
        if old is not None and os.path.isdir(old.get("path", "")):
            shutil.rmtree(old["path"], ignore_errors=True)  # expire old snapshot
        return manifest

    def read_table(self, name: str) -> DataFrame:
        meta = self.table_meta(name)
        if meta is None:
            raise FileNotFoundError(f"table {name!r} has no committed snapshot")
        return self.spark.read.parquet(meta["path"])

    def drop_table(self, name: str) -> None:
        shutil.rmtree(self._table_dir(name), ignore_errors=True)

    def list_tables(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.base_dir)
            if os.path.exists(self._manifest_path(d))
        )
