"""Every registered query with an oracle must match DuckDB exactly —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from flink_luad_pipeline_spark import plans

from .compare import compare

QUERIES = plans.all_queries()
ORACLES = plans.all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    rel = duck.sql(ORACLES[name])
    compare(df, rel)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
