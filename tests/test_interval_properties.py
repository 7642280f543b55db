"""Property test for the banded interval-overlap join: on arbitrary
interval sets (bucket-boundary-aligned starts, zero durations, and
durations exactly at the bucket-width-minus-one cap included), the
banding scheme must emit exactly the pairs the naive O(n²) definition
does — no pair missed across bucket boundaries, no pair duplicated."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_luad_pipeline_spark.operators import relational as R

BUCKET = 64  # small width so intervals frequently straddle boundaries

EPOCH = dt.datetime(2024, 1, 1)

INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        # start offsets cluster around bucket boundaries on purpose
        st.one_of(
            st.integers(min_value=0, max_value=BUCKET * 4),
            st.sampled_from([0, BUCKET - 1, BUCKET, BUCKET + 1, BUCKET * 2]),
        ),
        st.integers(min_value=0, max_value=BUCKET - 1),  # duration < width
        st.integers(min_value=0, max_value=999_999),  # microsecond part
    ),
    min_size=2,
    max_size=12,
)


def naive_pairs(rows):
    out = set()
    for i, (ka, sa, ea) in enumerate(rows):
        for j, (kb, sb, eb) in enumerate(rows):
            if j <= i or ka != kb:
                continue
            if sa < eb and sb < ea:
                out.add((ka, min(i, j), max(i, j)))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(INTERVALS)
def test_banding_matches_naive_overlap(spark, intervals):
    rows = []
    data = []
    for idx, (key, start_s, dur_s, us) in enumerate(intervals):
        s = EPOCH + dt.timedelta(seconds=start_s, microseconds=us)
        e = s + dt.timedelta(seconds=dur_s)
        rows.append((key, s, e))
        data.append((idx, key, s, e))
    df = spark.createDataFrame(
        data, "id INT, key INT, s TIMESTAMP, e TIMESTAMP"
    )
    got = {
        (r.key, r.id_a, r.id_b)
        for r in R.interval_overlap_pairs(
            df, key="key", id_col="id", start="s", end="e", bucket_sec=BUCKET
        ).collect()
    }
    assert got == naive_pairs(rows)
