"""Schema-enforced ingest for the images table.

`read_images` accepts parquet (columnar, preferred), CSV (the reference's
ingest format — base64-encoded bytes column, header, optional inference),
and JSON.  Every path lands on the exact BASELINE.json input_hint schema:

    images(image_id string, bytes binary, w int, h int, fmt string,
           caption string, phash long)

Unknown extra columns are dropped; missing required columns raise
immediately (fail at plan time, not 40 stages later).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

_CASTS = {
    "image_id": "string",
    "w": "int",
    "h": "int",
    "fmt": "string",
    "caption": "string",
    "phash": "bigint",
}


def validate_images_schema(df: DataFrame) -> DataFrame:
    missing = [f.name for f in IMAGES_SCHEMA.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"images input missing required columns: {missing}")
    bytes_col = (
        F.col("bytes").cast("binary").alias("bytes")
        if dict(df.dtypes)["bytes"] != "string"
        # CSV/JSON carry binary as base64 text
        else F.unbase64(F.col("bytes")).alias("bytes")
    )
    return df.select(
        F.col("image_id").cast("string").alias("image_id"),
        bytes_col,
        F.col("w").cast("int").alias("w"),
        F.col("h").cast("int").alias("h"),
        F.col("fmt").cast("string").alias("fmt"),
        F.col("caption").cast("string").alias("caption"),
        F.col("phash").cast("bigint").alias("phash"),
    )


def read_images(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    csv_header: bool = True,
) -> DataFrame:
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "csv":
        df = spark.read.csv(path, header=csv_header, inferSchema=True)
    elif fmt == "json":
        df = spark.read.json(path)
    else:
        raise ValueError(f"unsupported images source format: {fmt}")
    return validate_images_schema(df)


def read_table_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Generic CSV scan (reference A1, /root/reference/01_Prepare_Data.py
    ingest): header row, RFC-4180 doubled-quote escaping (escape='"' —
    Spark's default backslash escaping is nonstandard and unreadable by
    most other engines), explicit schema string.  The reference uses
    inferSchema=True; the engine pins types instead — inference samples
    the data and can flip a column's type between runs, which would break
    the committed-snapshot schema contract (catalog._check_schema)."""
    return (
        spark.read.option("header", True)
        .option("escape", '"')
        .schema(schema)
        .csv(path)
    )


def write_table_csv(df: DataFrame, path: str) -> None:
    """Sink twin of read_table_csv: header + RFC-4180 doubled-quote
    escaping, one file (the staging use case is small dims and test
    fixtures; large tables belong in parquet/Iceberg)."""
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(path)
    )


def images_to_csv(df: DataFrame, path: str) -> None:
    """Round-trip sink for the CSV ingest path (bytes as base64 text).
    base64() may emit MIME-chunked output with embedded newlines, which
    would split CSV records — strip all whitespace (unbase64 ignores it)."""
    df.withColumn(
        "bytes", F.regexp_replace(F.base64(F.col("bytes")), r"[\r\n]", "")
    ).write.mode("overwrite").option("header", True).csv(path)
