"""Shared registry + conventions for oracle-checked queries.

Conventions that make the DuckDB comparison deterministic:

- **Alias everything.** The driver sorts columns by name before hashing,
  so Spark and oracle column names must match exactly.
- **Round doubles.** Double aggregates accumulate in engine-specific
  order; we ``round(x, N)`` on BOTH sides (N=2 for currency-scale sums,
  N=6 for O(1) statistics like corr) so the low bits never disagree.
- **Never emit DECIMAL in output columns.** Internal math may (and
  should) run in exact DECIMAL, but the driver's value-hasher
  canonicalizes Spark ``Decimal`` objects and DuckDB decimals (coerced
  to float64 by pandas) differently, so every DECIMAL-typed output red-
  flags even when values are identical. The ``query`` decorator casts
  any final DecimalType column to DOUBLE; oracle SQL wraps its outer
  decimal casts in ``CAST(... AS DOUBLE)``. Both engines then convert
  the *same exact decimal value* with round-to-nearest, so the doubles
  are bit-identical.
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


def _decimal_outputs_to_double(df: DataFrame) -> DataFrame:
    """Cast any DecimalType output column to DOUBLE, preserving column
    order. Interior decimal math stays exact; only the final projection
    changes, and decimal->double is deterministic round-to-nearest on
    both engines (see module docstring)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DecimalType

    dec = {f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)}
    if not dec:
        return df
    return df.select(
        *[
            F.col(c).cast("double").alias(c) if c in dec else F.col(c)
            for c in df.columns
        ]
    )


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the DuckDB SQL twin (None -> the
    driver records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver runs queries in ITS OWN vanilla session — no
            # UTC pin. Epoch math (j10), streaming event-time windows
            # and date_format over LTZ all assume UTC, so pin it here
            # (runtime conf, cheap, idempotent).
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return _decimal_outputs_to_double(fn(spark, sf_dir))

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
