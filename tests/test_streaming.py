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
    # ts is TIMESTAMP_NTZ, which can't cast straight to long — go via
    # session-TZ TIMESTAMP (pinned UTC) for the epoch-seconds gap.
    sec = F.col("ts").cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
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


def test_watermark_seals_windows_append_mode(spark, tmp_path):
    """Real watermark semantics over multi-batch file replay (append
    mode): only windows fully below the final watermark are emitted;
    an unsealed window is withheld. Note Spark's documented guarantee
    is one-directional — within-delay data is never dropped, while
    beyond-delay stragglers are dropped only best-effort (observed:
    an old straggler in a later micro-batch may still aggregate and,
    being below the watermark, seal immediately)."""
    import datetime as dt

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_file(name, hours):
        rows = [
            (i, dt.datetime(2024, 1, 1, h, m), 1.0)
            for i, (h, m) in enumerate(hours)
        ]
        spark.createDataFrame(
            rows, "event_id LONG, ts TIMESTAMP, value DOUBLE"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    # batch 1 (listed first alphabetically): on-time data around 10:00
    write_file("a_ontime", [(10, 0), (10, 10), (10, 20), (11, 30)])
    # batch 2: straggler from 01:00 — far below the watermark by then
    write_file("b_late", [(1, 0)])

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = (
        spark.readStream.schema("event_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 1)  # force separate micro-batches
        .parquet(f"{src}/*")
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"), "n"
        )
    )
    got = ops.run_available_now(stream, "late_drop_test", "append")
    windows = {r.ws: r.n for r in got.collect()}
    # sealed window emitted intact (all within-delay rows aggregated)
    assert windows.get("2024-01-01 10:00:00") == 3
    # final watermark is 11:00 -> the 11:00-12:00 window is NOT sealed
    # and must be withheld in append mode
    assert "2024-01-01 11:00:00" not in windows


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


def test_transform_with_state_totals(spark, sf_dir):
    """Spark 4 transformWithStateInPandas twin of ss5. The protobuf
    gate locates a pure-Python google.protobuf runtime when no pip
    package exists (see streaming/protobuf_gate.py); skips only if
    none is found anywhere."""
    import pytest

    from flink_luad_pipeline_spark.streaming import protobuf_gate

    if not protobuf_gate.ensure_protobuf(spark):
        pytest.skip("no google.protobuf runtime available")
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        totals = ops.transform_with_state_totals(
            ops.read_events_stream(spark, sf_dir)
        )
        sink = ops.run_available_now(totals, "tws_test", "update")
        final = sink.groupBy("user_id").agg(
            F.max("n_events").alias("n_events")
        )
        batch = (
            load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        assert final.exceptAll(batch).isEmpty()
        assert batch.exceptAll(final).isEmpty()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
