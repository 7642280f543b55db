"""Streaming-vs-batch parity for the ops the DuckDB oracle can't
express: session windows (gaps-and-islands batch twin)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_luad_pipeline_spark.catalog import load
from flink_luad_pipeline_spark.streaming import ops


def batch_sessions(events, gap_minutes=30):
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event of the same user exceeds the threshold."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


def test_session_windows_match_batch(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = ops.session_window_agg(ops.read_events_stream(spark, sf_dir))
    got = ops.run_available_now(stream, "test_sessions", "append")
    streamed = {
        (r.user_id, r.session_start): r.n_events for r in got.collect()
    }
    events = load(spark, sf_dir, "events")
    expected_df = batch_sessions(events)
    expected = {
        (r.user_id, r.session_start): r.n_events for r in expected_df.collect()
    }
    # append mode withholds sessions not sealed by the final watermark
    # (max ts - 1h): streamed must be a subset of batch, matching counts
    assert streamed, "no sessions emitted"
    assert set(streamed) <= set(expected)
    for k, n in streamed.items():
        assert expected[k] == n
    # and nearly all sessions should be sealed (only the last hour open)
    assert len(streamed) >= 0.8 * len(expected)
