"""Property tests for the round-6 scale devices: the hierarchical
exclusive prefix sum must equal the naive global-window definition on
arbitrary (unique-key, value) inputs regardless of partitioning, and
the 3-bucket nearest-event join must pick exactly the neighbor the
naive O(n·m) definition picks — including candidates exactly AT the
tolerance bound and at bucket boundaries."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_luad_pipeline_spark.operators.relational import (
    exclusive_prefix_sum,
)

ROWS = st.lists(
    st.integers(min_value=-1000, max_value=1000),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(ROWS)
def test_exclusive_prefix_sum_matches_naive(spark, values):
    data = [(i * 7, v) for i, v in enumerate(values)]  # unique, gappy keys
    df = spark.createDataFrame(data, "k BIGINT, v BIGINT").repartition(5)
    got = {
        r.k: r.cum
        for r in exclusive_prefix_sum(df, "k", "v", "cum").collect()
    }
    run, want = 0, {}
    for k, v in data:
        want[k] = run
        run += v
    assert got == want


TOL = 300  # seconds; bucket width of the 3-bucket device

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # user
        st.sampled_from(["error", "click"]),
        # offsets cluster around tolerance/bucket boundaries on purpose
        st.one_of(
            st.integers(min_value=0, max_value=TOL * 4),
            st.sampled_from(
                [0, TOL - 1, TOL, TOL + 1, 2 * TOL, 2 * TOL + 1, 3 * TOL]
            ),
        ),
    ),
    min_size=2,
    max_size=16,
)


def _naive_nearest(rows):
    out = {}
    for i, (u, t, s) in enumerate(rows):
        if t != "error":
            continue
        best = None
        for j, (u2, t2, s2) in enumerate(rows):
            if t2 != "click" or u2 != u:
                continue
            adt = abs(s - s2) * 1_000_000
            if adt > TOL * 1_000_000:
                continue
            key = (adt, s2, j)
            if best is None or key < best:
                best = key
        out[i] = (best[2], best[0]) if best else (None, None)
    return out


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(EVENTS)
def test_nearest_event_join_matches_naive(spark, events):
    from flink_luad_pipeline_spark.plans.registry import QUERIES

    epoch = dt.datetime(2024, 1, 1)
    data = [
        (i, u, typ, epoch + dt.timedelta(seconds=s), 0.0, "{}")
        for i, (u, typ, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        data,
        "event_id BIGINT, user_id BIGINT, event_type STRING,"
        " ts TIMESTAMP, value DOUBLE, props STRING",
    )
    # drive the same dataflow the j13 query uses, against this frame
    import flink_luad_pipeline_spark.plans.relational_queries as rq

    orig_load = rq.load
    rq.load = lambda _s, _d, _t: df
    try:
        got = {
            r.event_id: (r.nearest_click_id, r.abs_dt_us)
            for r in QUERIES["j13_nearest_event_join"](spark, "ignored")
            .collect()
        }
    finally:
        rq.load = orig_load
    assert got == _naive_nearest(
        [(u, typ, s) for (u, typ, s) in events]
    )
