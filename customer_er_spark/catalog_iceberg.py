"""Iceberg-backed implementation of the SparkCatalog interface.

`catalog.SparkCatalog` (parquet dirs + JSON manifests) and this class expose
the SAME contract, so every pipeline/operator accepts either:

    write_table / append_table / read_table / table_meta / snapshot_id /
    has_snapshot / get_state / set_state / drop_table / list_tables /
    create_database / drop_database / ddl

Mapping (the 1:1 the parquet backend's docstring promises):

    write_table   -> df.writeTo(tbl).using("iceberg").createOrReplace()
                     + commit metadata in table properties
    append_table  -> df.writeTo(tbl).append()   (Iceberg append snapshot:
                     prior data files untouched, O(|incoming|) I/O)
    snapshot_id   -> the Iceberg snapshot id (SELECT from tbl.snapshots)
    has_snapshot  -> stored config_hash/inputs table properties
    state store   -> a tiny two-column Iceberg table (key, value)
    database DDL  -> CREATE/DROP NAMESPACE

Availability: this container ships no Iceberg runtime jar (offline — the
spark-runtime jar cannot be fetched), so the class guards every entry
point with `iceberg_available()` and the test suite skips unless a
configured `spark.sql.catalog.<name>` Iceberg catalog is present.  On a
real cluster, enable it with the standard session config:

    spark.jars.packages  org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v>
    spark.sql.catalog.ice                org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.ice.type           hadoop
    spark.sql.catalog.ice.warehouse      <path>

Reference analog: Delta saveAsTable + DESCRIBE DETAIL
(/root/reference/01_Prepare_Data.py:173-180,
 /root/reference/02_Initial_Workflow_Part_A.py:88).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog_name: str = "ice") -> bool:
    """True iff an Iceberg catalog is configured AND its classes load."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog_name}", None)
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # runtime jar present?
        return True
    except Exception:
        return False


class IcebergCatalog:
    """SparkCatalog-compatible facade over a configured Iceberg catalog."""

    _STATE_TABLE = "_state_kv"

    def __init__(
        self,
        spark: SparkSession,
        namespace: str = "er",
        catalog_name: str = "ice",
    ):
        if not iceberg_available(spark, catalog_name):
            raise RuntimeError(
                f"Iceberg catalog {catalog_name!r} is not configured in this "
                "SparkSession (no runtime jar in this container); use "
                "catalog.SparkCatalog or configure spark.sql.catalog."
                f"{catalog_name} on a cluster"
            )
        self.spark = spark
        self.catalog_name = catalog_name
        self.namespace = namespace
        spark.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {catalog_name}.{namespace}"
        )

    # -- identifiers ---------------------------------------------------------
    def _tbl(self, name: str) -> str:
        return f"{self.catalog_name}.{self.namespace}.{name}"

    def _exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(name))

    # -- manifest-equivalent metadata ---------------------------------------
    def table_meta(self, name: str) -> dict | None:
        if not self._exists(name):
            return None
        props = {
            r["key"]: r["value"]
            for r in self.spark.sql(
                f"SHOW TBLPROPERTIES {self._tbl(name)}"
            ).collect()
        }
        snap = self.snapshot_id(name)
        counts = json.loads(props.get("er.counts", "{}") or "{}")
        return {
            "table": name,
            "snapshot_id": snap,
            "schema": self.spark.table(self._tbl(name)).schema.jsonValue(),
            "config_hash": props.get("er.config_hash", ""),
            "inputs": json.loads(props.get("er.inputs", "{}") or "{}"),
            "counts": counts,
            **json.loads(props.get("er.extra_meta", "{}") or "{}"),
        }

    def snapshot_id(self, name: str) -> str | None:
        if not self._exists(name):
            return None
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._tbl(name)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(row[0]["snapshot_id"]) if row else None

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

    # -- IO ------------------------------------------------------------------
    def _stamp(
        self,
        name: str,
        config_hash: str,
        inputs: dict | None,
        extra_meta: dict | None,
        rows_appended: int,
    ) -> dict:
        tbl = self._tbl(name)
        rows_out = self.spark.table(tbl).count()
        counts = {"rows_out": rows_out, "rows_appended": rows_appended}
        for k, v in {
            "er.config_hash": config_hash,
            "er.inputs": json.dumps(inputs or {}, sort_keys=True),
            "er.counts": json.dumps(counts),
            "er.extra_meta": json.dumps(extra_meta or {}, sort_keys=True),
        }.items():
            vq = v.replace("'", "''")
            self.spark.sql(
                f"ALTER TABLE {tbl} SET TBLPROPERTIES ('{k}' = '{vq}')"
            )
        return self.table_meta(name)

    def write_table(
        self,
        df: DataFrame,
        name: str,
        config_hash: str = "",
        inputs: dict[str, str] | None = None,
        partition_by: list[str] | None = None,
        extra_meta: dict | None = None,
        overwrite_schema: bool = False,
    ) -> dict:
        # Iceberg's createOrReplace IS schema evolution; enforce the same
        # guard as the parquet backend when evolution wasn't requested
        old = self.table_meta(name)
        if old is not None and not overwrite_schema:
            from customer_er_spark.catalog import SparkCatalog

            SparkCatalog._schema_sig(old["schema"])  # reuse the signature
            if SparkCatalog._schema_sig(old["schema"]) != SparkCatalog._schema_sig(
                df.schema.jsonValue()
            ):
                raise ValueError(
                    f"schema change on overwrite to table {name!r}; pass "
                    "overwrite_schema=True to evolve it"
                )
        w = df.writeTo(self._tbl(name)).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        n = df.count()  # Iceberg snapshot summary also records this
        return self._stamp(name, config_hash, inputs, extra_meta, n)

    def append_table(
        self,
        df: DataFrame,
        name: str,
        config_hash: str = "",
        inputs: dict[str, str] | None = None,
        partition_by: list[str] | None = None,
        extra_meta: dict | None = None,
    ) -> dict:
        if not self._exists(name):
            return self.write_table(
                df, name, config_hash, inputs, partition_by, extra_meta
            )
        old = self.table_meta(name)
        from customer_er_spark.catalog import SparkCatalog

        if SparkCatalog._schema_sig(old["schema"]) != SparkCatalog._schema_sig(
            df.schema.jsonValue()
        ):
            raise ValueError(f"schema change on append to table {name!r}")
        df.writeTo(self._tbl(name)).append()
        # rows_appended from the NEW current snapshot's summary
        row = self.spark.sql(
            f"SELECT summary FROM {self._tbl(name)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        appended = int((row[0]["summary"] or {}).get("added-records", 0)) if row else 0
        return self._stamp(name, config_hash, inputs, extra_meta, appended)

    def read_table(self, name: str) -> DataFrame:
        if not self._exists(name):
            raise FileNotFoundError(f"table {name!r} has no committed snapshot")
        return self.spark.table(self._tbl(name))

    # -- tiny state store ----------------------------------------------------
    def get_state(self, key: str, default=None):
        if not self._exists(self._STATE_TABLE):
            return default
        rows = (
            self.read_table(self._STATE_TABLE)
            .where(f"key = '{key}'")
            .collect()
        )
        return json.loads(rows[0]["value"]) if rows else default

    def set_state(self, key: str, value) -> None:
        tbl = self._tbl(self._STATE_TABLE)
        payload = json.dumps(value).replace("'", "''")
        if not self._exists(self._STATE_TABLE):
            self.spark.sql(
                f"CREATE TABLE {tbl} (key STRING, value STRING) USING iceberg"
            )
        self.spark.sql(f"DELETE FROM {tbl} WHERE key = '{key}'")
        self.spark.sql(f"INSERT INTO {tbl} VALUES ('{key}', '{payload}')")

    # -- management ----------------------------------------------------------
    def drop_table(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self._tbl(name)}")

    def list_tables(self) -> list[str]:
        return sorted(
            r["tableName"]
            for r in self.spark.sql(
                f"SHOW TABLES IN {self.catalog_name}.{self.namespace}"
            ).collect()
        )

    def create_database(self, name: str, if_not_exists: bool = True) -> None:
        ine = "IF NOT EXISTS " if if_not_exists else ""
        self.spark.sql(
            f"CREATE NAMESPACE {ine}{self.catalog_name}.{name}"
        )

    def drop_database(self, name: str, cascade: bool = False) -> None:
        casc = " CASCADE" if cascade else ""
        self.spark.sql(
            f"DROP NAMESPACE IF EXISTS {self.catalog_name}.{name}{casc}"
        )

    def database(self, name: str) -> "IcebergCatalog":
        return IcebergCatalog(self.spark, name, self.catalog_name)

    def ddl(self, stmt: str):
        import re

        s = stmt.strip().rstrip(";")
        m = re.fullmatch(
            r"CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)", s, re.I
        )
        if m:
            return self.create_database(m.group(2), bool(m.group(1)))
        m = re.fullmatch(r"DROP\s+DATABASE\s+(\w+)(\s+CASCADE)?", s, re.I)
        if m:
            return self.drop_database(m.group(1), cascade=bool(m.group(2)))
        m = re.fullmatch(r"USE\s+(\w+)", s, re.I)
        if m:
            return self.database(m.group(1))
        raise ValueError(f"unsupported DDL: {stmt!r}")
