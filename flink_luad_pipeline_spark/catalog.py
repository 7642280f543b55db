"""Table catalog over the driver's synthetic parquet test data.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``{sf_dir}/{name}.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — columnar, so Catalyst column pruning and predicate
    pushdown reach the file reader (``PushedFilters`` in .explain)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts may be parquet TIMESTAMP(NANOS), which Spark rejects
        # by default (PARQUET_TYPE_ILLEGAL). With the legacy conf it reads
        # as epoch-nanos LONG; rebuild a microsecond timestamp with exact
        # integer division (a double division would lose precision above
        # 2^53 ns). Newer testdata generations store MICROS and arrive as
        # a native timestamp already — leave those untouched.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() works too."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
