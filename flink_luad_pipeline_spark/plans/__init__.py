"""Query registry consumed by ``__spark_entry__.py``.

Each submodule registers (name -> callable(spark, sf_dir) -> DataFrame)
pairs and, where SQL-expressible, a DuckDB oracle SQL twin. The driver
runs both at sf0.01 and compares row-count + schema + order-insensitive
value-hash, so every computed column is aliased identically on both
sides and floating-point aggregates are rounded identically on both
sides (see plans/registry.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Registration order IS the driver's correctness-check order, and the
# driver's sweep has a time budget — if it truncates, everything after
# the cut gets no CORRECTNESS row. Import the contractual SURVEY §2 core
# first, then the graded extension families, so a truncation can only
# ever cost the cheapest-to-re-verify tail.
from . import relational_queries  # noqa: F401  (SURVEY §2 core: S/P/A/J/U/O + b/j/s/x)
from . import analytics_queries  # noqa: F401  (§2 iteration + ML: I1, C1-C5, g1/g2)
from . import streaming_queries  # noqa: F401  (ss1-ss8)
from . import llm_queries  # noqa: F401  (LLM data-pipeline ops)
from . import datapipe_queries  # noqa: F401  (chunk/split/pack/decontaminate)
from . import extended_queries  # noqa: F401  (OLAP b-family)
from .registry import ORACLES, QUERIES


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)
