"""JSON-lines source & sink + embedded-JSON column parsing.

The reference only reads TSV (Input.scala:29-30), but its event-pipeline
north star (BASELINE.json) and any real ingest surface need JSON:
newline-delimited files (the streaming-friendly layout Spark's file
source splits per line) and JSON-typed string columns (the ``events.props``
payload in the driver's testdata).

Scale notes: ``spark.read.schema(s).json`` with an explicit schema skips
the whole-dataset inference pass (one full extra scan at 100 TB);
``from_json`` is a JVM-side expression — no Python in the parse path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Newline-delimited JSON scan with explicit schema (no inference
    scan). Corrupt lines are dropped, mirroring the reference's
    ``lenient = true`` CSV semantics."""
    return (
        spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink, overwrite, one file per task (same layout
    contract as csv_io.write_tsv)."""
    df.write.mode("overwrite").json(path)


def json_field(col: Column, schema: str, field: str) -> Column:
    """Parse an embedded-JSON string column and project one field.

    ``from_json`` with an explicit struct schema: malformed documents
    yield NULL (PERMISSIVE), matching DuckDB ``json_extract`` semantics.
    """
    return F.from_json(col, schema)[field]
