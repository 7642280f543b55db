"""Bucketed (hash-clustered) parquet tables — the co-located join path.

The 100 TB recipe for repeated big-big joins: persist both sides
bucketed by the join key with the same bucket count. Each bucket pair
joins independently — the join needs NO shuffle at all (the scan shows
``SelectedBucketsCount`` and the plan has no Exchange on either join
input; asserted in tests/test_plans.py). This replaces the shuffle the
reference paid on every Flink join; Flink 0.10 had no persistent
co-location (SURVEY §4.1 — join strategy was fully delegated to its
optimizer per job).

Tables are written as EXTERNAL tables (explicit ``path``) so the data
lands in a caller-chosen directory, not the default warehouse; bucket
metadata lives in the session catalog.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``bucket_col``.

    Sorting within buckets lets sort-merge joins skip the per-task
    sort too. ``num_buckets`` must match on both sides of a co-located
    join; at 100 TB size it so one bucket ≈ one task's worth of data
    (hundreds of MB), e.g. 4096 buckets for a 1 TB fact table.
    """
    if path is None:
        path = os.path.join(tempfile.gettempdir(), "flps_bucketed", table)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata comes from the
    session catalog, so joins on the bucket key skip the Exchange)."""
    return spark.table(table)
