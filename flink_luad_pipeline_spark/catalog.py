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


def events_ts_is_nanos(path: str) -> bool:
    """True iff the events file stores ``ts`` as parquet TIMESTAMP(NANOS).

    Probed from the parquet footer with pyarrow so the Spark session is
    never reconfigured for the (current, MICROS) common case. Works on a
    single file or a directory of part files.
    """
    import os

    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        parts = sorted(
            f for f in os.listdir(p) if f.endswith(".parquet")
        )
        if not parts:
            return False
        p = os.path.join(path, parts[0])
    try:
        t = pq.read_schema(p).field("ts").type
    except Exception:
        return False
    return str(t).startswith("timestamp[ns")


_PYFILES_SHIPPED: set[str] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to the Python workers via ``addPyFile``.

    Arrow-batched UDF closures (multimodal, dedup, streaming state)
    reference module-level functions, so workers must be able to import
    ``flink_luad_pipeline_spark``. When the driver process imports the
    package from a directory that is on the *driver's* ``sys.path`` only
    (e.g. an external harness running from another cwd), worker
    deserialization raises ModuleNotFoundError. Zipping the package once
    per session and registering it with ``addPyFile`` makes every query
    self-contained regardless of the driver's environment — the cluster
    analogue is exactly this: ship the code with the job, don't assume
    it is pre-installed on executors.
    """
    import os
    import zipfile

    app_id = spark.sparkContext.applicationId
    if app_id in _PYFILES_SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"flps_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _PYFILES_SHIPPED.add(app_id)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — columnar, so Catalyst column pruning and predicate
    pushdown reach the file reader (``PushedFilters`` in .explain)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_package_on_executors(spark)
    if name == "events":
        # events.ts may be parquet TIMESTAMP(NANOS), which Spark rejects
        # by default (PARQUET_TYPE_ILLEGAL). Probe the footer first so
        # the common MICROS case never touches session conf; only NANOS
        # files set the legacy conf (left set for the session: Spark
        # reads confs at scan time, so a set/restore around the lazy
        # definition would break the later action). The NANOS branch
        # rebuilds a microsecond timestamp with exact integer division
        # (double division loses precision above 2^53 ns) and casts to
        # TIMESTAMP_NTZ so both branches yield the same type as native
        # MICROS isAdjustedToUTC=false files.
        path = table_path(sf_dir, name)
        if events_ts_is_nanos(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return spark.read.parquet(path).withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
            )
        return spark.read.parquet(path)
    return spark.read.parquet(table_path(sf_dir, name))


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() works too."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
