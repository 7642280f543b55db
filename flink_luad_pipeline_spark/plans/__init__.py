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

from . import (  # noqa: F401  (import side effect: registration)
    analytics_queries,
    datapipe_queries,
    extended_queries,
    llm_queries,
    relational_queries,
    streaming_queries,
)
from .registry import ORACLES, QUERIES


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)
