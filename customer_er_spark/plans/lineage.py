"""Per-stage / per-partition lineage + metrics (north_rule: "resumable from
checkpoint with per-partition lineage + metrics tables").

Each stage appends to two driver-side-cheap tables in the catalog:

  metrics(stage, rows_in, rows_out, wall_sec, config_hash, input_snapshots,
          output_snapshot, ts)
  partition_lineage(stage, output_snapshot, partition_id, rows)

The per-partition histogram comes straight from the commit manifest's
per-file footer counts (catalog._commit walks the written files anyway):
a committed table's durable partitions ARE its data files, so recording
them costs ZERO Spark jobs — the old spark_partition_id() histogram ran
one extra scan job per stage, a pure fixed cost that diluted scaling
efficiency at small corpus sizes.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession


class StageMetrics:
    def __init__(self, spark: SparkSession, catalog):
        self.spark = spark
        self.catalog = catalog
        self._rows: list[dict] = []
        self._parts: list[dict] = []

    def record(
        self,
        stage: str,
        rows_in: int,
        rows_out: int,
        wall_sec: float,
        config_hash: str,
        input_snapshots: dict[str, str],
        output_snapshot: str,
        data_files: list[dict] | None = None,
        extra: dict | None = None,
    ) -> None:
        self._rows.append(
            {
                "stage": stage,
                "rows_in": int(rows_in),
                "rows_out": int(rows_out),
                "wall_sec": float(round(wall_sec, 3)),
                "config_hash": config_hash,
                "input_snapshots": json.dumps(input_snapshots, sort_keys=True),
                "output_snapshot": output_snapshot,
                "extra": json.dumps(extra or {}, sort_keys=True),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
        for i, df_info in enumerate(data_files or []):
            self._parts.append(
                {
                    "stage": stage,
                    "output_snapshot": output_snapshot,
                    "partition_id": i,
                    "rows": int(df_info["rows"]),
                }
            )

    def flush(self) -> None:
        # driver-side rows, driver-side commit: zero Spark jobs
        # (catalog.write_table_local) — these tables are dozens of rows
        if self._rows:
            self.catalog.write_table_local(self._rows, "metrics")
        if self._parts:
            self.catalog.write_table_local(self._parts, "partition_lineage")
