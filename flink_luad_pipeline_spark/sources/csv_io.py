"""CSV/TSV sources & sinks (SURVEY §2.1: S1, S2, S5, S6).

Mirrors the reference reader semantics (Input.scala:29-30, 120-121):
tab-separated, ``#`` comments ignored, malformed rows silently dropped
(``lenient = true`` -> Spark ``mode=DROPMALFORMED``), scan-time column
projection (``includedFields`` -> ``select``; on Parquet Catalyst prunes
automatically). Sink mirrors PipeLine.scala:36: TSV, overwrite, one file
per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_tsv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S1 — typed TSV scan; drops malformed rows and ``#`` comments.

    Reference: ``env.readCsvFile[DefFileFormat](path, fieldDelimiter="\\t",
    lenient=true, ignoreComments="#")`` (Input.scala:29-30).
    """
    return (
        spark.read.schema(schema)
        .option("sep", "\t")
        .option("comment", "#")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


def read_tsv_projected(
    spark: SparkSession, path: str, schema: str, columns: list[str]
) -> DataFrame:
    """S2 — TSV scan with scan-time column projection.

    Reference: ``includedFields = Array(0, 1)`` (Input.scala:120-121).
    The explicit ``select`` lets Catalyst prune the parse to the needed
    fields; on columnar formats the pruning reaches the file reader.
    """
    return read_tsv(spark, path, schema).select(*columns)


def write_tsv(df: DataFrame, path: str) -> None:
    """S5 — TSV sink, overwrite, one file per parallel task.

    Reference: ``writeAsCsv(path, "\\n", "\\t", WriteMode.OVERWRITE)``
    (PipeLine.scala:36); the observed artifact ``pipeline/output/
    text.txt/{1..8}`` is exactly Spark's one-file-per-partition layout.
    """
    df.write.mode("overwrite").option("sep", "\t").csv(path)


def resolve_output_path(template: str, token: str) -> str:
    """S6 — output filename templating.

    Reference: ``path.replace("%s%", System.currentTimeMillis.toString)``
    (PipeLine.scala:36). The token is injected by the caller so tests
    stay deterministic (the reference's wall-clock token is the only
    nondeterminism in its output contract).
    """
    return template.replace("%s%", token)
