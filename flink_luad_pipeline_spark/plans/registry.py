"""Shared registry + conventions for oracle-checked queries.

Conventions that make the DuckDB comparison deterministic:

- **Alias everything.** The driver sorts columns by name before hashing,
  so Spark and oracle column names must match exactly.
- **Round doubles.** Double aggregates accumulate in engine-specific
  order; we ``round(x, N)`` on BOTH sides (N=2 for currency-scale sums,
  N=6 for O(1) statistics like corr) so the low bits never disagree.
- **Pin integer widths.** DuckDB ``sum(INT)`` is HUGEINT and
  ``row_number()`` is BIGINT while Spark's are BIGINT/INT; both sides
  cast explicitly to BIGINT.
- **Format timestamps** that appear in output columns as
  ``yyyy-MM-dd HH:mm:ss`` strings on both sides.
- **No nondeterminism.** No current_timestamp in outputs, no arbitrary
  first(); use min/max/row_number over explicit orderings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the DuckDB SQL twin (None -> the
    driver records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
