"""Per-stage / per-partition lineage + metrics (north_rule: "resumable from
checkpoint with per-partition lineage + metrics tables").

Each stage appends to two driver-side-cheap tables in the catalog:

  metrics(stage, rows_in, rows_out, wall_sec, config_hash, input_snapshots,
          output_snapshot, ts)
  partition_lineage(stage, output_snapshot, partition_id, rows)

The per-partition histogram is computed distributedly with
spark_partition_id() + groupBy — one cheap job over the checkpointed output
(already on disk), no collect of data rows.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
        output_df: DataFrame | None = None,
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
        if output_df is not None:
            hist = (
                output_df.groupBy(F.spark_partition_id().alias("partition_id"))
                .count()
                .collect()
            )
            for r in hist:
                self._parts.append(
                    {
                        "stage": stage,
                        "output_snapshot": output_snapshot,
                        "partition_id": int(r["partition_id"]),
                        "rows": int(r["count"]),
                    }
                )

    def flush(self) -> None:
        if self._rows:
            df = self.spark.createDataFrame(self._rows)
            self.catalog.write_table(df, "metrics")
        if self._parts:
            df = self.spark.createDataFrame(self._parts)
            self.catalog.write_table(df, "partition_lineage")
