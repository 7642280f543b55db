"""Structured Streaming queries over the events table (north-star
surface; the reference is batch-only — SURVEY §2.9).

Each query replays the events parquet through a real file-source stream
(watermark + windows/dedup/state) with Trigger.AvailableNow into a
memory sink, then returns the sink table. Where the streaming result
provably equals a batch computation (complete-mode window aggs, dedup
keys, final stateful totals), a DuckDB oracle checks it exactly; the
session-window query stays rows-only (its batch twin is asserted in
tests/test_streaming.py).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.io import write_frames
from ..streaming import ops
from .registry import query

_COUNTER = itertools.count()


def _drain(stream_df: DataFrame, base_name: str, mode: str) -> DataFrame:
    """Unique memory-sink name per invocation so repeated runs in one
    session never read a stale table."""
    return ops.run_available_now(
        stream_df, f"{base_name}_{next(_COUNTER)}", mode
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # stable formatting
    return ops.read_events_stream(spark, sf_dir)


@query(
    "ss1_tumbling_window",
    oracle=(
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')"
        " AS window_start, event_type, count(*) AS n,"
        " CAST(CAST(round(max(value), 6) AS DECIMAL(18,6)) AS DOUBLE)"
        "  AS max_value"
        " FROM events GROUP BY 1, 2"
    ),
)
def ss1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows with watermark, complete mode —
    equals the batch hour-truncated group-by, hence oracle-checked."""
    agg = ops.tumbling_window_agg(_events(spark, sf_dir))
    return _drain(agg, "ss1_tumbling", "complete")


@query(
    "ss2_sliding_window",
    oracle=(
        "WITH starts AS (SELECT unnest([date_trunc('hour', ts)"
        " - INTERVAL 1 HOUR, date_trunc('hour', ts)]) AS ws FROM events)"
        " SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,"
        " count(*) AS n FROM starts GROUP BY ws"
    ),
)
def ss2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h windows (each event in two windows), complete
    mode; oracle unrolls the overlap with unnest."""
    agg = ops.sliding_window_counts(_events(spark, sf_dir))
    return _drain(agg, "ss2_sliding", "complete")


@query(
    "ss3_session_window",
    oracle=(
        # gaps-and-islands twin of session_window(gap=30min): a new
        # session starts when the inactivity gap reaches 30 min (Spark
        # session ranges are [ts, ts+gap), touching ranges don't merge);
        # append mode emits only sessions sealed by the final watermark
        # max(ts) - 1h, i.e. session_end <= max(ts) - 1h.
        "WITH o AS (SELECT user_id, ts,"
        " CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)"
        " IS NULL OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)"
        " >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess FROM events),"
        " s AS (SELECT user_id, ts, sum(new_sess) OVER ("
        " PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)"
        " AS sess_id FROM o),"
        " g AS (SELECT user_id, min(ts) AS session_start,"
        " max(ts) + INTERVAL 30 MINUTE AS session_end,"
        " count(*) AS n_events FROM s GROUP BY user_id, sess_id)"
        " SELECT user_id,"
        " strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,"
        " strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,"
        " CAST(n_events AS BIGINT) AS n_events FROM g"
        " WHERE session_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)"
    ),
)
def ss3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user, append mode. Only
    sessions sealed by the final watermark (max event time - 1h) are
    emitted; the oracle reproduces exactly that with gaps-and-islands
    SQL plus the seal filter, so even the stateful streaming query is
    value-checked, not just rows-only."""
    agg = ops.session_window_agg(_events(spark, sf_dir))
    return _drain(agg, "ss3_session", "append")


@query(
    "ss4_streaming_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def ss4_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type): the emitted
    key set is exactly DISTINCT."""
    dedup = ops.streaming_dedup_keys(_events(spark, sf_dir))
    return _drain(dedup, "ss4_dedup", "append")


@query(
    "ss5_stateful_totals",
    oracle=(
        "SELECT user_id, count(*) AS n_events,"
        " CAST(CAST(round(max(value), 6) AS DECIMAL(18,6)) AS DOUBLE)"
        "  AS max_value"
        " FROM events GROUP BY user_id"
    ),
)
def ss5_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState running
    count/max per user), update mode. The sink holds one emission per
    (user, trigger); totals are monotone, so max() over emissions is
    the final state — which must equal the batch aggregate."""
    totals = ops.stateful_user_totals(_events(spark, sf_dir))
    sink = _drain(totals, "ss5_stateful", "update")
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max("max_value"), 6).cast("decimal(18,6)").alias("max_value"),
    )


@query(
    "ss6_stream_stream_join",
    oracle=(
        "SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,"
        " strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_at,"
        " strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_at"
        " FROM events c JOIN events p ON c.user_id = p.user_id"
        " AND c.event_type = 'click' AND p.event_type = 'purchase'"
        " AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE"
    ),
)
def ss6_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click -> purchase within 30 min).
    Watermarks + the event-time range bound the join state; with
    AvailableNow replay every match is emitted exactly once, so the
    append-mode result equals the batch interval join the oracle runs."""
    ev = _events(spark, sf_dir)
    joined = ops.stream_stream_click_purchase(ev, "30 minutes")
    return _drain(joined, "ss6_ssjoin", "append")


@query(
    "ss7_stream_static_enrich",
    oracle=(
        "SELECT e.event_type, coalesce(c.c_mktsegment, 'Unknown') AS segment,"
        " count(*) AS n, CAST(CAST(round(sum(e.value), 6) AS DECIMAL(18,6))"
        "  AS DOUBLE) AS sum_value"
        " FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey"
        " GROUP BY 1, 2"
    ),
)
def ss7_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment + complete-mode aggregation:
    the canonical dimension-join pattern (static side re-broadcast per
    micro-batch, zero stream state). Final complete-mode counts equal
    the batch left join + group-by."""
    from ..catalog import load

    ev = _events(spark, sf_dir)
    dim = load(spark, sf_dir, "customer")
    agg = ops.stream_static_enrichment(ev, dim)
    agg = agg.withColumn(
        "sum_value", F.col("sum_value").cast("decimal(18,6)")
    )
    return _drain(agg, "ss7_enrich", "complete")


@query(
    "ss8_foreach_batch_sink",
    oracle=(
        "SELECT user_id, count(*) AS n,"
        " CAST(CAST(round(sum(value), 6) AS DECIMAL(18,6)) AS DOUBLE)"
        "  AS sum_value"
        " FROM events GROUP BY user_id"
    ),
)
def ss8_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom streaming sink: complete-mode per-user totals written by
    foreachBatch into per-batch parquet directories (idempotent
    overwrite = effectively-exactly-once files); the query returns the
    final snapshot read back from disk, which equals the batch
    aggregate."""
    import os
    import tempfile

    ev = _events(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).cast("decimal(18,6)").alias("sum_value"),
    )
    path = os.path.join(
        tempfile.gettempdir(), "flps_fbsink", f"run_{next(_COUNTER)}"
    )
    os.makedirs(path, exist_ok=True)
    final_dir = ops.foreach_batch_parquet_sink(agg, path)
    return spark.read.parquet(final_dir)


@query(
    "ss9_stateful_ewma",
    oracle=(
        "WITH ordered AS (SELECT user_id,"
        "  list(value ORDER BY ts, event_id) AS xs"
        "  FROM events GROUP BY user_id)"
        " SELECT user_id,"
        " CAST(len(xs) AS BIGINT) AS n_events,"
        " round(list_reduce(xs, (acc, x) -> 0.1 * x + 0.9 * acc), 6)"
        "  AS ewma"
        " FROM ordered"
    ),
)
def ss9_stateful_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive custom stateful streaming operator: per-user
    EWMA via applyInPandasWithState (streaming twin of o2_grouped_ewma,
    same bit-exact DuckDB list_reduce oracle). Update mode; n_events is
    monotone per user, so max_by(ewma, n_events) picks the final
    state's emission."""
    ewma = ops.stateful_user_ewma(_events(spark, sf_dir))
    sink = _drain(ewma, "ss9_ewma", "update")
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max_by("ewma", "n_events"), 6).alias("ewma"),
    )


@query(
    "ss10_snapshot_dedup_ingest",
    oracle=(
        "WITH fps AS (SELECT doc_id,"
        " md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp"
        " FROM documents),"
        " snap AS (SELECT DISTINCT fp FROM fps WHERE doc_id < 250)"
        " SELECT DISTINCT fp FROM fps"
        " WHERE fp NOT IN (SELECT fp FROM snap)"
    ),
)
def ss10_snapshot_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion with snapshot dedup — the streaming
    twin of ll45: the documents feed is fingerprinted, anti-joined
    against a static snapshot fingerprint table (docs with id < 250,
    standing in for the materialized corpus index), and deduped within
    the feed. The emitted fingerprint set is deterministic (which doc
    carries a fp first is not, so only keys are emitted — same contract
    as ss4) and equals the batch DISTINCT-minus-snapshot, hence
    oracle-checked."""
    from ..catalog import load

    snap = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 250)
        .select(
            F.md5(
                F.trim(
                    F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
                )
            ).alias("fp")
        )
        .distinct()
    )
    stream = ops.read_documents_stream(spark, sf_dir)
    kept = ops.snapshot_dedup_stream(stream, snap)
    return _drain(kept, "ss10_snapdedup", "append")


@query(
    "ss11_transform_with_state",
    oracle=(
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,"
        " CAST(CAST(round(max(value), 6) AS DECIMAL(18,6)) AS DOUBLE)"
        "  AS max_value"
        " FROM events GROUP BY user_id"
    ),
)
def ss11_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas (Spark 4 arbitrary-state API: typed
    ValueState handles over the RocksDB provider) running the same
    per-user count/max as ss5's applyInPandasWithState — both custom-
    stateful tiers now execute, each against the identical batch
    oracle. Needs a google.protobuf runtime (the TWS state-server
    protocol); streaming/protobuf_gate locates the pure-Python one if
    no pip package exists. RocksDB is also the provider you'd run at
    production state sizes — state lives off-heap, not in executor
    JVM memory."""
    from ..streaming import protobuf_gate

    if not protobuf_gate.ensure_protobuf(spark):
        raise RuntimeError(
            "transformWithStateInPandas needs a google.protobuf runtime"
        )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        totals = ops.transform_with_state_totals(_events(spark, sf_dir))
        sink = _drain(totals, "ss11_tws", "update")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max("max_value"), 6)
        .cast("decimal(18,6)")
        .alias("max_value"),
    )


@query(
    "ss12_late_data_drop",
    oracle=(
        "WITH wm AS (SELECT max(CASE WHEN event_id % 2 = 0 THEN ts END)"
        "  - INTERVAL 1 HOUR AS wm1,"
        "  max(ts) - INTERVAL 1 HOUR AS wm2 FROM events),"
        " w1 AS (SELECT date_trunc('hour', ts) AS ws, count(*) AS n"
        "  FROM events, wm WHERE event_id % 2 = 0"
        "  AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm1"
        "  GROUP BY 1),"
        " w2 AS (SELECT date_trunc('hour', ts) AS ws, count(*) AS n"
        "  FROM events, wm"
        "  WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR > wm1"
        "  AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm2"
        "  GROUP BY 1)"
        " SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,"
        " CAST(n AS BIGINT) AS n FROM w1"
        " UNION ALL SELECT strftime(ws, '%Y-%m-%d %H:%M:%S'),"
        " CAST(n AS BIGINT) FROM w2"
    ),
)
def ss12_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data drop + checkpoint recovery, observable and exact: the
    events table replays as two checkpointed AvailableNow runs (even
    ids, then odd). Phase 2 recovers the persisted watermark, so odd
    rows in windows closed during phase 1 are DROPPED — the emitted
    counts prove it (closed windows hold even-only counts; the oracle
    reconstructs the same two-watermark partition in SQL). The one
    streaming semantic (and the restart/recovery path) the single-run
    ss1-ss11 queries cannot exercise."""
    return ops.late_drop_two_phase(spark, sf_dir)


@query(
    "ss13_streaming_ohlc",
    oracle=(
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')"
        " AS window_start, user_id,"
        " min({'t': ts, 'i': event_id, 'v': value}).v AS open,"
        " max(value) AS high, min(value) AS low,"
        " max({'t': ts, 'i': event_id, 'v': value}).v AS close,"
        " CAST(count(*) AS BIGINT) AS volume"
        " FROM events GROUP BY 1, 2"
    ),
)
def ss13_streaming_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of o6's OHLC bars: watermarked tumbling windows
    whose open/close ride min/max over a (ts, event_id, value) struct,
    so the state store merges partial bars instead of buffering ordered
    events. Complete mode -> equals the batch hourly resample, hence
    the shared oracle with o6's grouping."""
    agg = ops.ohlc_bars_stream(_events(spark, sf_dir))
    return _drain(agg, "ss13_ohlc", "complete")


@query(
    "ss14_dedup_within_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def ss14_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ss4's unbounded-stream variant: dropDuplicatesWithinWatermark
    caps dedup state at one watermark window of keys instead of growing
    forever — the API you actually deploy against an infinite stream.
    Replay delivers everything in the first micro-batch, so the emitted
    keys equal DISTINCT and the oracle holds."""
    dedup = ops.streaming_dedup_within_watermark(_events(spark, sf_dir))
    return _drain(dedup, "ss14_dedup_wm", "append")


@query(
    "ss15_stream_stream_left_outer",
    oracle=(
        "SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,"
        " strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_at,"
        " strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_at"
        " FROM (SELECT * FROM events WHERE event_type = 'click') c"
        " LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p"
        " ON c.user_id = p.user_id"
        " AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE"
    ),
)
def ss15_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ss6's LEFT OUTER sibling: clicks with no purchase inside the gap
    emit null-padded ONLY once the watermark seals them — a sentinel
    event pair past max(ts) forces every real click's seal, so the
    emitted set equals the batch LEFT JOIN and the withheld-until-
    provable semantics itself is what's being checked."""
    out = ops.stream_stream_left_outer(_events(spark, sf_dir).sparkSession, sf_dir)
    # sentinel guard on the DRAINED table (batch side): filtering the
    # streaming plan would push below the watermark ops and delete the
    # sentinels (see the op's docstring)
    return _drain(out, "ss15_loj", "append").where(F.col("user_id") >= 0)


@query(
    "ss16_chained_stateful_ops",
    oracle=(
        "SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start,"
        " CAST(count(*) AS BIGINT) AS n_distinct_pairs FROM ("
        " SELECT DISTINCT date_trunc('hour', ts) AS h, user_id, event_type"
        " FROM events) GROUP BY h"
    ),
)
def ss16_chained_stateful_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two stateful operators in ONE streaming query: watermarked
    dedup at the door feeding a tumbling-window count behind it — the
    multi-stateful pipeline shape of a real ingest topology, sharing
    one checkpoint. Dedup keys include the hour bucket so the result
    is a pure function of the input (hourly DISTINCT), oracle-checked
    in complete mode."""
    agg = ops.chained_stateful_dedup_agg(_events(spark, sf_dir))
    return _drain(agg, "ss16_chained", "complete")


@query(
    "ss17_dynamic_session_window",
    oracle=(
        # Generalized gaps-and-islands for per-event gaps: an event
        # opens a new session iff its ts reaches the RUNNING MAX end
        # (ts+gap) of all earlier events — lag(ts) alone is wrong when
        # an earlier long-gap event covers past its successor's end.
        # Session end = max(ts+gap) within the island; append mode
        # emits only sessions sealed by the final watermark.
        "WITH g AS (SELECT user_id, ts, event_id,"
        " ts + CASE WHEN event_type = 'purchase'"
        "  THEN INTERVAL 45 MINUTE ELSE INTERVAL 15 MINUTE END AS e"
        " FROM events),"
        " m AS (SELECT user_id, ts, event_id, e,"
        " max(e) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end"
        " FROM g),"
        " o AS (SELECT user_id, ts, event_id, e,"
        " CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0 END"
        "  AS new_sess FROM m),"
        " s AS (SELECT user_id, ts, e, sum(new_sess) OVER ("
        " PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS UNBOUNDED PRECEDING) AS sess_id FROM o),"
        " agg AS (SELECT user_id, min(ts) AS session_start,"
        " max(e) AS session_end, count(*) AS n_events"
        " FROM s GROUP BY user_id, sess_id)"
        " SELECT user_id,"
        " strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,"
        " strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,"
        " CAST(n_events AS BIGINT) AS n_events FROM agg"
        " WHERE session_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)"
    ),
)
def ss17_dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows (purchase = 45 min hold, other
    events 15 min), append mode — the per-event-gap generalization of
    ss3 that fixed-gap sessionization can't express. The oracle is the
    generalized gaps-and-islands closure (running-max end, not lag),
    so the merge rule, the session-end arithmetic, AND the watermark
    seal are all value-checked."""
    agg = ops.dynamic_session_window_agg(_events(spark, sf_dir))
    return _drain(agg, "ss17_dynsession", "append")


def _ss18_oracle() -> str:
    """The batch twin of the streaming near-dup probe: the full
    no-cutoff MinHash-LSH pair list (ll63's oracle machinery) over the
    PLAIN documents table, restricted to pairs whose one side is a
    snapshot doc (doc_id < 250) and re-emitted directionally
    (probe doc -> snapshot neighbor), at the probe's 0.5 threshold."""
    from .llm_queries import _AUG_SQL, _MINHASH_ORACLE_NOCUT

    plain = _MINHASH_ORACLE_NOCUT.replace(
        _AUG_SQL, "SELECT doc_id, text FROM documents"
    )
    assert plain != _MINHASH_ORACLE_NOCUT
    return (
        f"WITH p AS ({plain})"
        " SELECT doc_a AS doc_id, doc_b AS dup_of, jaccard FROM p"
        "  WHERE doc_b < 250 AND jaccard >= 0.5"
        " UNION ALL"
        " SELECT doc_b AS doc_id, doc_a AS dup_of, jaccard FROM p"
        "  WHERE doc_a < 250 AND jaccard >= 0.5"
    )


@query("ss18_streaming_neardup_probe", oracle=_ss18_oracle())
def ss18_streaming_neardup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup ingestion gate — ss10 catches exact
    re-ingests (fingerprint anti-join); this catches near-duplicates:
    the feed probes a PERSISTED MinHash band index
    (dedup.build_minhash_index over the doc_id < 250 snapshot, the
    ll63 artifact) via a stateless stream-static band equi-join, and
    every candidate is exact-Jaccard-verified in-row against the
    static shingle sets. The oracle replays the identical no-cutoff
    pipeline in batch, so band collisions, verification scores, and
    the emitted pair set are all value-checked — the streaming twin of
    the persisted-index incremental tier."""
    from ..catalog import load
    from ..operators import dedup

    snap = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 250)
        .select("doc_id", "text")
    )
    sh, banded = dedup.build_minhash_index(snap, "doc_id", "text", k=3)
    stream = ops.read_documents_stream(spark, sf_dir)
    pairs = ops.neardup_probe_stream(stream, sh, banded, threshold=0.5)
    return _drain(pairs, "ss18_neardup", "append")


def ss18_components(spark: SparkSession, sf_dir: str) -> dict:
    """Bench decomposition of ss18 (VERDICT r6 item 5): the registered
    query's end-to-end time conflates the one-time snapshot INDEX
    BUILD with the streaming DRAIN, which made the streaming cost
    illegible in the headline. This helper times them separately —
    index build materialized the way a production snapshot write would
    be, then the AvailableNow drain probing the prebuilt index — and
    derives the micro-batch throughput (documents ingested per second
    of drain), the number a streaming user actually sizes a feed by.
    Not a registered query (no oracle — it reports timings); bench.py
    records it in bench_full.json next to the ss18 headline row."""
    import time as _time

    from ..catalog import load
    from ..operators import dedup

    snap = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 250)
        .select("doc_id", "text")
    )
    t0 = _time.perf_counter()
    sh, banded = dedup.build_minhash_index(snap, "doc_id", "text", k=3)
    sh = sh.localCheckpoint(eager=True)
    banded = banded.localCheckpoint(eager=True)
    index_build_s = _time.perf_counter() - t0

    n_docs = load(spark, sf_dir, "documents").count()
    t0 = _time.perf_counter()
    stream = ops.read_documents_stream(spark, sf_dir)
    pairs = ops.neardup_probe_stream(stream, sh, banded, threshold=0.5)
    _drain(pairs, "ss18_components", "append").count()
    drain_s = _time.perf_counter() - t0
    return {
        "index_build_s": round(index_build_s, 4),
        "drain_s": round(drain_s, 4),
        "docs_per_s": round(n_docs / drain_s, 1),
    }


def _ss19_oracle() -> str:
    """Batch twin of the streaming DSIR gate: the full-table ratio
    (target = lang 'en', the _DSIR_ORACLE arithmetic) applied back to
    every document, per-bucket terms DECIMAL-quantized exactly like
    the stream's fold, gate at log_weight >= 0."""
    from .llm_queries import _TOKENS_SQL, _hex10

    return (
        "WITH tok AS (SELECT doc_id, lang = 'en' AS is_t,"
        f" {_TOKENS_SQL} AS t FROM documents),"
        " grams AS (SELECT doc_id, is_t,"
        " unnest(list_transform(range(1, len(t)),"
        " i -> t[i] || ' ' || t[i + 1])) AS g FROM tok WHERE len(t) >= 2),"
        f" feat AS (SELECT doc_id, is_t, {_hex10('g')} % 256 AS b"
        " FROM grams),"
        " cnts AS (SELECT b, count(*) AS cr,"
        " sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct FROM feat GROUP BY b),"
        " tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM cnts),"
        " ratio AS (SELECT b, ln((ct + 1.0) / (tt + 256))"
        " - ln((cr + 1.0) / (tr + 256)) AS lr FROM cnts, tot),"
        " db AS (SELECT doc_id, b, count(*) AS c FROM feat"
        " GROUP BY doc_id, b),"
        " w AS (SELECT doc_id, sum(c) AS nf,"
        " round(CAST(sum(CAST(round(c * lr, 9) AS DECIMAL(28,9)))"
        "  AS DOUBLE), 6) AS lw"
        " FROM db JOIN ratio USING (b) GROUP BY doc_id)"
        " SELECT doc_id, CAST(nf AS BIGINT) AS n_bigrams,"
        " CAST(lw AS DOUBLE) AS log_weight"
        " FROM w WHERE lw >= 0.0"
    )


@query("ss19_streaming_dsir_gate", oracle=_ss19_oracle())
def ss19_streaming_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DSIR quality gate: the learned-selection tier (ll53)
    applied AT INGEST — the bucket→log-ratio table is trained
    batch-side on the corpus (target = English), collected once
    (≤256 rows, the BPE-merge-table boundary class) and baked into a
    stateless map-literal scorer, so each streamed document is scored
    and gated in a single projection: no state store, no watermark,
    feed-rate throughput. Keeps docs scoring >= 0 (at least as
    target-like as the raw average). The oracle replays training AND
    scoring in batch with the identical DECIMAL-quantized fold, so
    the gate's exact decision set is value-checked — the streaming
    member of the ll53 → ll89 selection family."""
    from ..catalog import load
    from ..operators.importance import dsir_ratio_table

    docs = load(spark, sf_dir, "documents")
    ratio_rows = [
        (int(r["b"]), float(r["lr"]))
        for r in dsir_ratio_table(docs, F.col("lang") == "en").collect()
    ]
    stream = ops.read_documents_stream(spark, sf_dir)
    gated = ops.dsir_gate_stream(stream, ratio_rows, threshold=0.0)
    return _drain(gated, "ss19_dsirgate", "append")


def _ss20_oracle() -> str:
    """Batch twin of the COMPOSED streaming ingest gate: gopher-kept
    docs (ll43's machinery), fingerprint not in the doc_id<250
    snapshot, one row per DISTINCT surviving fingerprint (which copy
    arrives first is nondeterministic — same contract as ss4/ss10; all
    copies share tokens, hence scores), scored by the full-corpus DSIR
    ratio with the stream's exact DECIMAL-quantized fold, gated at
    log_weight >= 0."""
    from .llm_queries import (
        _GOPHER_KEPT_SQL,
        _TOKENS_SQL,
        _gopher_m_ctes,
        _hex10,
    )

    fp_sql = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    return (
        "WITH "
        + _gopher_m_ctes("documents")
        + f", keptd AS (SELECT doc_id FROM m WHERE {_GOPHER_KEPT_SQL}),"
        f" fps AS (SELECT doc_id, {fp_sql} AS fp FROM documents),"
        " snap AS (SELECT DISTINCT fp FROM fps WHERE doc_id < 250),"
        " cand AS (SELECT f.fp, min(f.doc_id) AS rid FROM fps f"
        "   JOIN keptd USING (doc_id)"
        "   WHERE f.fp NOT IN (SELECT fp FROM snap) GROUP BY f.fp),"
        f" ctok AS (SELECT c.fp, {_TOKENS_SQL} AS t FROM cand c"
        "   JOIN documents ON documents.doc_id = c.rid),"
        " nb AS (SELECT fp, CASE WHEN len(t) >= 2 THEN len(t) - 1"
        "   ELSE 0 END AS n_bigrams FROM ctok),"
        " cgrams AS (SELECT fp, unnest(list_transform(range(1, len(t)),"
        "   i -> t[i] || ' ' || t[i + 1])) AS g FROM ctok"
        "   WHERE len(t) >= 2),"
        f" cfeat AS (SELECT fp, {_hex10('g')} % 256 AS b FROM cgrams),"
        # ratio table trained on the FULL corpus (ss19's arithmetic)
        " tokall AS (SELECT doc_id, lang = 'en' AS is_t,"
        f" {_TOKENS_SQL} AS t FROM documents),"
        " gall AS (SELECT doc_id, is_t,"
        " unnest(list_transform(range(1, len(t)),"
        " i -> t[i] || ' ' || t[i + 1])) AS g FROM tokall"
        " WHERE len(t) >= 2),"
        f" fall AS (SELECT doc_id, is_t, {_hex10('g')} % 256 AS b"
        " FROM gall),"
        " cnts AS (SELECT b, count(*) AS cr,"
        " sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct FROM fall"
        " GROUP BY b),"
        " tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM cnts),"
        " ratio AS (SELECT b, ln((ct + 1.0) / (tt + 256))"
        " - ln((cr + 1.0) / (tr + 256)) AS lr FROM cnts, tot),"
        " db AS (SELECT fp, b, count(*) AS c FROM cfeat GROUP BY fp, b),"
        " w AS (SELECT fp,"
        " round(CAST(sum(CAST(round(c * lr, 9) AS DECIMAL(28,9)))"
        "  AS DOUBLE), 6) AS lw"
        " FROM db JOIN ratio USING (b) GROUP BY fp)"
        " SELECT n.fp, CAST(n.n_bigrams AS BIGINT) AS n_bigrams,"
        " CAST(coalesce(w.lw, 0.0) AS DOUBLE) AS log_weight"
        " FROM nb n LEFT JOIN w USING (fp)"
        " WHERE coalesce(w.lw, 0.0) >= 0.0"
    )


@query("ss20_streaming_curation_gate", oracle=_ss20_oracle())
def ss20_streaming_curation_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The COMPOSED streaming ingest gate — ll94's curation recipe in
    its at-ingest form: Gopher format rules (stateless ll43 signal
    projections on the feed) → exact dedup against the persisted
    corpus snapshot (ss10's stream-static fingerprint anti-join) →
    exact dedup within the feed (ss4's keyed dropDuplicates state) →
    the learned DSIR quality gate (ss19's map-literal scorer). Proves
    the streaming devices COMPOSE the way the batch operators do in
    ll94 — one query, one drain, every stage acting. Emitted rows are
    keyed by fingerprint (the ss4/ss10 determinism contract; same-fp
    copies share tokens hence scores), so the set is value-checked by
    a single batch oracle replaying all four stages."""
    from ..catalog import load
    from ..operators.importance import dsir_ratio_table
    from .llm_queries import _gopher_rules, _gopher_signal_frame

    docs = load(spark, sf_dir, "documents")
    ratio_rows = [
        (int(r["b"]), float(r["lr"]))
        for r in dsir_ratio_table(docs, F.col("lang") == "en").collect()
    ]
    snap = (
        docs.where(F.col("doc_id") < 250)
        .select(
            F.md5(
                F.trim(
                    F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
                )
            ).alias("fp")
        )
        .distinct()
    )
    stream = ops.read_documents_stream(spark, sf_dir)
    sig = _gopher_signal_frame(stream, extra=("text",))
    kept_pred = None
    for _, ok in _gopher_rules():
        kept_pred = ok if kept_pred is None else kept_pred & ok
    gated = ops.curation_gate_stream(
        sig.where(kept_pred).select("doc_id", "text"),
        snap,
        ratio_rows,
        threshold=0.0,
    )
    return _drain(gated, "ss20_curationgate", "append")


def _ss21_oracle() -> str:
    from .llm_queries import _LL100_ORACLE

    return _LL100_ORACLE


def _ss21_drain(
    spark: SparkSession,
    sf_dir: str,
    compact_every: int | None = None,
    feed_path: str | None = None,
    max_files_per_trigger: int | None = None,
    resume: bool = False,
    name: str = "ss21",
) -> dict:
    """ss21's build+drain, parameterized so tests can drive the SAME
    fold code path at a finer batching grain with compaction + GC on
    (VERDICT r11 item 2). ``compact_every``: when the fold-root list
    exceeds this many roots, collapse it to ONE fresh compaction root
    (``_ll100_compact_state``) and DELETE the superseded roots — the
    retention rule actually executed, not just documented.
    ``feed_path``: a pre-written delta feed (tests share one feed
    across a GC'd and an uncompacted run so both see identical
    batches). ``resume=True``: a RESTART — keep the checkpoint (the
    stream skips committed batches) and rebuild the fold state from
    the durable MANIFEST instead of day-0 (ADVICE r11: the in-memory
    root list dies with the driver; the manifest is its durable twin,
    and this is the code path that READS it). ``name`` scopes the
    state/feed/out dirs so a resume pair shares them deterministically
    across two driver "lifetimes". Returns {"out": curated DataFrame,
    "state": the live fold state, "state_root", "out_path", "fold":
    the foreachBatch fn (for direct replay tests)}."""
    import glob as _glob
    import json as _json
    import os as _os
    import shutil

    from .llm_queries import (
        _ll100_build_state,
        _ll100_compact_state,
        _ll100_day_n_over,
        _ll100_fixture,
        _ll100_fold_delta_frames,
    )
    from .relational_queries import sink_path

    base, delta, t = _ll100_fixture(spark, sf_dir)
    n = f"{next(_COUNTER)}" if name == "ss21" else "named"
    root_base = sink_path(f"{name}_state_{n}", sf_dir)
    feed = feed_path or sink_path(f"{name}_feed_{n}", sf_dir)
    out_path = sink_path(f"{name}_out_{n}", sf_dir)
    manifest = f"{root_base}_manifest.json"
    if resume:
        # restart-with-preserved-checkpoint: committed batches are
        # checkpoint-skipped, so their fold roots MUST come from the
        # manifest — state_root/day-0 is NOT rebuilt
        with open(manifest) as fh:
            man = _json.load(fh)
        state_root = root_base
        state = {
            "roots": list(man["roots"]),
            "max_id": int(man["max_id"]),
            "folded": set(man["folded"]),
            "gone": [],
        }
    else:
        state_root = _ll100_build_state(spark, base, sf_dir, root=root_base)
        # the per-session counter restarts in every process, so a
        # previous RUN's sink/checkpoint can collide with this one: a
        # stale checkpoint makes AvailableNow treat the feed as already
        # committed, and stale output/fold/compaction roots (+
        # manifest) would accumulate across runs — both observed;
        # start clean
        for stale in (out_path, f"{feed}_chk"):
            shutil.rmtree(stale, ignore_errors=True)
        for stale in (
            _glob.glob(f"{state_root}_d*") + _glob.glob(f"{state_root}_c*")
        ):
            shutil.rmtree(stale, ignore_errors=True)
        if _os.path.exists(manifest):
            _os.remove(manifest)
        state = {
            "roots": [state_root],
            "max_id": t,
            "folded": set(),
            "gone": [],
        }
    if feed_path is None and not resume:
        # never on resume (ADVICE r12): overwriting the feed under the
        # preserved checkpoint produces NEW part filenames, so the
        # whole delta would replay as fresh batches — and ss21's fold
        # has no row-level overlap guard, so replayed rows would
        # re-enter the day-N pass
        delta.write.mode("overwrite").parquet(feed)
    # the feed was written from `delta` (resume appends the same
    # shape), so its schema needs no footer-inference job (guide §1.2)
    schema = delta.schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed)

    def _write_manifest() -> None:
        # the durable twin of the in-memory root list (ADVICE r11):
        # a restart with a preserved checkpoint resumes by READING
        # this instead of replaying — committed batches are skipped by
        # the checkpoint, so without it their fold roots would silently
        # drop out of every later batch's state view.
        # 100 TB contract (VERDICT r12 item 7): this atomic-replace
        # local JSON is the pipeline's single point of coordination; at
        # scale it becomes a conditional-put (compare-and-swap) to an
        # object store / catalog entry. The invariants that must
        # survive that port: (a) the manifest is durable BEFORE any GC
        # deletes a superseded root, (b) exactly one writer per root
        # lineage (here: the single foreachBatch driver), (c) readers
        # resolve the state ONLY through the manifest, never by listing
        # directories.
        tmp = f"{manifest}.tmp"
        with open(tmp, "w") as fh:
            _json.dump(
                {
                    "roots": state["roots"],
                    "folded": sorted(state["folded"]),
                    "max_id": state["max_id"],
                },
                fh,
            )
        _os.replace(tmp, manifest)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # O(delta) state fold (VERDICT r10 item 2): the batch's day-N
        # pass runs against the multi-root state view, emits its
        # curated rows to a batch-keyed output partition, and appends
        # ONLY its delta artifacts as a new fold root — bytes written
        # per batch scale with the batch. Idempotent per batch_id
        # (ADVICE r10 low): a replayed batch already folded is skipped
        # whole (the folded-id set, which survives compaction); a
        # retry after PARTIAL writes rewrites its own output partition
        # (overwrite) and its own fold root (rmtree + rewrite) — never
        # a path any live plan reads, because the root joins the read
        # list only after its writes commit.
        if batch_id in state["folded"]:
            return
        delta_root = f"{state_root}_d{batch_id}"
        fr = _ll100_day_n_over(
            spark, batch_df, state["roots"], state["max_id"]
        )
        fr["out"].write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )
        shutil.rmtree(delta_root, ignore_errors=True)
        # six O(delta) artifact writes per batch — independent
        # directories, overlapped on driver threads (guide §2.6)
        write_frames(_ll100_fold_delta_frames(fr), delta_root)
        mx = batch_df.agg(F.max("doc_id")).collect()[0][0]
        state["roots"].append(delta_root)
        state["folded"].add(batch_id)
        if mx is not None:
            state["max_id"] = max(state["max_id"], int(mx))
        # compact-then-DELETE GC (VERDICT r11 item 2): when the root
        # list exceeds the policy, materialize the state view into ONE
        # fresh compaction root (never in place), swap the read list to
        # it, and delete the superseded roots — bounding both the root
        # list and the on-disk footprint. Safe inside foreachBatch: the
        # next batch builds its plan from state["roots"] AFTER the swap,
        # so no live plan reads a deleted directory.
        if compact_every and len(state["roots"]) > compact_every:
            c_root = f"{state_root}_c{batch_id}"
            shutil.rmtree(c_root, ignore_errors=True)
            _ll100_compact_state(spark, list(state["roots"]), c_root)
            superseded = list(state["roots"])
            state["roots"] = [c_root]
            _write_manifest()  # the new root is durable BEFORE the GC
            for r_ in superseded:
                shutil.rmtree(r_, ignore_errors=True)
                state["gone"].append(r_)
        _write_manifest()

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{feed}_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        "out": spark.read.parquet(out_path).drop("batch"),
        "state": state,
        "state_root": state_root,
        "out_path": out_path,
        "manifest": manifest,
        "fold": fold,
        "feed": feed,
    }


@query("ss21_streaming_incremental_curation", oracle=_ss21_oracle())
def ss21_streaming_incremental_curation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING day-N curation — ll100's incremental pipeline driven
    by the streaming runtime (VERDICT r9 item 7), completing the
    batch↔streaming symmetry the engine holds everywhere else
    (ss10/ss18/ss20 probe state; this one also FOLDS it): the day-N
    delta arrives as a file-source stream and each micro-batch runs
    the identical day-N code path (``_ll100_day_n_over``) against the
    current persisted state, emits its curated batch to a batch-keyed
    output partition, then appends ONLY its delta artifacts as a new
    fold root (``_ll100_fold_delta_frames`` — O(delta) writes, VERDICT
    r10 item 2; a root joins the multi-root read list only after its
    writes commit, so a batch never overwrites parquet any live plan
    reads, and a replayed batch_id is skipped whole — the ADVICE r10
    at-least-once fix, scoped to WITHIN-RUN retries by the in-memory
    folded set; across a RESTART with a preserved checkpoint the
    durable twin is the root MANIFEST written after every fold, which
    a resuming driver reads instead of replaying, ADVICE r11). The
    fold's compact-then-DELETE GC policy (``compact_every``, VERDICT
    r11 item 2) bounds the root list: the state view is materialized
    into one fresh compaction root, the read list swaps to it, and the
    superseded roots are DELETED — exercised at a multi-batch grain
    with equality-vs-uncompacted pinned in tests/test_streaming.py.
    This is the production daily shape: the "day" is just a
    Trigger.AvailableNow run of a standing stream, and the state the
    next day probes is already folded when the trigger drains.

    Determinism contract: under AvailableNow with no file cap the
    delta is ONE micro-batch, so the emitted rows equal ll100's day-N
    output exactly — the oracle IS ll100's from-scratch chain. Under
    finer batching the INDEX/COUNT artifacts (fps, band index, gram
    counts) remain exactly batching-invariant (set unions / additive
    counts over disjoint doc sets, given the monotone-id arrival order
    — pinned in tests), while verdict-bearing artifacts (n_kept,
    features) follow the arrival-order contract of the ss4/ss10
    family: from-scratch-equal at the daily-batch grain, the grain
    ll100 documents."""
    return _ss21_drain(spark, sf_dir)["out"]


def _ss22_oracle() -> str:
    from .llm_queries import _LL106_ORACLE

    return _LL106_ORACLE


@query("ss22_streaming_ann_ingest", oracle=_ss22_oracle())
def ss22_streaming_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ANN ingest — ll106's incremental index fold driven by
    the streaming runtime (the ss21 device for the vector side,
    completing batch↔streaming symmetry for the ANN tier): the daily
    vector batch arrives as a file-source stream, and each foreachBatch
    micro-batch folds into the persisted residual IVF-PQ index via the
    identical `residual_ann_index_update` code path (frozen
    quantizers, versioned codes-table writes so a batch never
    overwrites parquet it lazily reads). After the AvailableNow drain
    the index is probed for the registered top-k.

    Stronger determinism than ss21: because the fold is a pure
    per-vector function of the frozen quantizers and ASSOCIATIVE
    (ll106's pinned property), the folded index — hence the probe
    answer — is identical under ANY micro-batching, not just the
    single-batch daily grain. The oracle is ll106's verbatim.

    Write-amplification note (VERDICT r10 items 1-2): each
    codes_v{n} write here is a WHOLESALE rewrite of the codes table —
    O(state) per batch — and a superseded codes_v{n-1} is dead the
    moment the next version commits. Since r13 that retention rule is
    EXECUTED, not just documented (VERDICT r12 item 4): after the
    state swaps to codes_v{n}, the previous codes path (codes_v{n-1},
    or the base codes.parquet after the first swap) is deleted — at
    drain end exactly one codes table is on disk. A replayed batch is
    skipped WHOLE via the folded-id set BEFORE any write (ADVICE r12:
    the previous shape overwrote codes_v{batch_id+1} while the state
    lazily read that same path — ss21/ss23's skip-whole pattern; the
    lazy on_overlap='skip' anti-join still covers the partial-retry
    tail). The production path is ss23: trained fixed-k grain,
    batch-keyed O(delta) codes partitions, nothing superseded, nothing
    rewritten. This row stays registered for the closed-form mod-grain
    oracle contract."""
    import shutil

    from ..catalog import load
    from ..operators import similarity
    from .relational_queries import sink_path

    emb = load(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)
    n = next(_COUNTER)
    # mod 23: coprime with the %5 split (see ll106)
    frames = similarity.residual_ann_index_frames(
        base, centroid_mod=23, train_iters=0
    )
    root = sink_path(f"ss22_index_{n}", sf_dir)
    write_frames(frames, root)  # guide §2.6: overlapped independent writes
    index = {
        name_: spark.read.schema(df_.schema).parquet(
            f"{root}/{name_}.parquet"
        )
        for name_, df_ in frames.items()
    }
    feed = sink_path(f"ss22_feed_{n}", sf_dir)
    shutil.rmtree(f"{feed}_chk", ignore_errors=True)  # ss21's stale guard
    delta.write.mode("overwrite").parquet(feed)
    # the feed was written from `delta` (resume appends the same
    # shape), so its schema needs no footer-inference job (guide §1.2)
    schema = delta.schema
    stream = spark.readStream.schema(schema).parquet(feed)

    state = {
        "index": index,
        "folded": set(),
        "codes_path": f"{root}/codes.parquet",
        "gone": [],
    }

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # a replayed batch is skipped WHOLE before the codes_v write
        # (ADVICE r12: writing codes_v{batch_id+1} on replay would
        # overwrite the very path state['index']['codes'] lazily
        # reads — the ss21/ss23 skip-whole pattern)
        if batch_id in state["folded"]:
            return
        # on_overlap="skip" (ADVICE r11): batches are disjoint by
        # construction, and a PARTIAL earlier attempt's rows anti-join
        # to ZERO lazily — the default "error" mode's eager O(state)
        # id-scan per micro-batch would otherwise be silently absorbed
        # into this row's bench time while measuring nothing but the
        # guard
        updated = similarity.residual_ann_index_update(
            state["index"], batch_df, on_overlap="skip"
        )
        next_codes = f"{root}/codes_v{batch_id + 1}.parquet"
        updated["codes"].write.mode("overwrite").parquet(next_codes)
        prev_codes = state["codes_path"]
        state["index"] = dict(
            updated,
            codes=spark.read.schema(updated["codes"].schema).parquet(
                next_codes
            ),
        )
        state["codes_path"] = next_codes
        state["folded"].add(batch_id)
        # delete-after-swap (VERDICT r12 item 4): the superseded codes
        # table is dead the moment the state reads the new version —
        # no live plan references it (each fold's plan is built fresh
        # from state after the swap)
        shutil.rmtree(prev_codes, ignore_errors=True)
        state["gone"].append(prev_codes)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{feed}_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = similarity.residual_ann_index_topk(
        emb.where(F.col("vec_id") < 5), state["index"], k=10
    )
    return out.select(
        "query_id",
        "cand_id",
        F.col("sim").cast("double").alias("sim"),
        "rank",
    )


def _ss23_oracle() -> str:
    from .llm_queries import _LL107_ORACLE

    return _LL107_ORACLE


def _ss23_drain(
    spark: SparkSession,
    sf_dir: str,
    compact_every: int | None = None,
    feed_path: str | None = None,
    max_files_per_trigger: int | None = None,
    resume: bool = False,
    name: str = "ss23",
    delta_pred=None,
) -> dict:
    """ss23's build+drain, parameterized so tests can drive the SAME
    fold code path at a finer batching grain with compaction + GC on
    (VERDICT r11 item 2). ``compact_every``: when the codes-partition
    list exceeds this many paths, persist the current index view to a
    fresh versioned root (``residual_ann_index_persist`` — the
    enforced never-in-place device), swap the read list to it, and
    DELETE the entire superseded root. ``resume=True``: a RESTART —
    keep the checkpoint (committed batches are skipped) and rebuild
    the index/path state from the durable MANIFEST instead of
    re-training (ADVICE r11: the in-memory path list dies with the
    driver; the manifest is its durable twin, and this is the code
    path that READS it). ``name`` scopes the index/feed dirs so a
    resume pair shares them across two driver "lifetimes".
    ``delta_pred``: an alternative delta slice (a Column predicate;
    default vec_id % 5 == 0) so multi-day arcs can feed day-1 a
    sub-slice and land day-2's separately (ss25). ``resume`` also
    restores the manifest's ``index_version`` — the snapshot lineage
    the publish step (``_publish_retrained_snapshot``) advances.
    Returns {"state": live fold state
    (index/code_paths/root/folded/index_version/gone), "emb", "fold":
    the foreachBatch fn (for direct replay tests), "manifest",
    "feed"}."""
    import glob as _glob
    import json as _json
    import os as _os
    import shutil

    from ..catalog import load
    from ..operators import clustering, similarity
    from .relational_queries import sink_path

    emb = load(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(
        delta_pred if delta_pred is not None else F.col("vec_id") % 5 == 0
    )
    n = f"{next(_COUNTER)}" if name == "ss23" else "named"
    root = sink_path(f"{name}_index_{n}", sf_dir)
    feed = feed_path or sink_path(f"{name}_feed_{n}", sf_dir)
    manifest = f"{root}_manifest.json"
    if resume:
        # restart-with-preserved-checkpoint: the quantizers and every
        # committed batch's codes partition come back via the manifest
        # — nothing re-trains, nothing replays
        with open(manifest) as fh:
            man = _json.load(fh)
        cur_root = man["root"]
        index = {
            name_: spark.read.parquet(f"{cur_root}/{name_}.parquet")
            for name_ in ("cents", "codebook", "codes", "meta")
        }
        state = {
            "index": index,
            "code_paths": list(man["code_paths"]),
            "root": cur_root,
            "folded": set(man["folded"]),
            "index_version": int(man.get("index_version", 1)),
            "gone": [],
        }
    else:
        cents = clustering.kmeans_fit(base, k=8, iters=3).select(
            F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")
        )
        frames = similarity.residual_ann_index_frames(
            base, centroids=cents, train_iters=2, train_mod=4
        )
        # ss21's stale-run guard, extended to the batch partitions and
        # compaction roots: a previous process's codes_b* / _c* dirs
        # under a colliding root would otherwise be
        # invisible-but-present
        shutil.rmtree(root, ignore_errors=True)
        for stale in _glob.glob(f"{root}_c*"):
            shutil.rmtree(stale, ignore_errors=True)
        if _os.path.exists(manifest):
            _os.remove(manifest)
        shutil.rmtree(f"{feed}_chk", ignore_errors=True)
        write_frames(frames, root)  # §2.6: overlapped independent writes
        # read-back with the writer frames' schemas — no footer-
        # inference jobs (guide §1.2; the resume path keeps inference:
        # there the manifest's artifacts are the only schema source)
        index = {
            name_: spark.read.schema(df_.schema).parquet(
                f"{root}/{name_}.parquet"
            )
            for name_, df_ in frames.items()
        }
        state = {
            "index": index,
            "code_paths": [f"{root}/codes.parquet"],
            "root": root,
            "folded": set(),
            "index_version": 1,
            "gone": [],
        }
    if feed_path is None and not resume:
        # never on resume (ADVICE r12): overwriting the feed under the
        # preserved checkpoint produces NEW part filenames, so the
        # whole delta would replay as fresh batches; a day-2 caller
        # lands its new delta with mode("append") instead (ss25)
        delta.write.mode("overwrite").parquet(feed)
    # the feed was written from `delta` (resume appends the same
    # shape), so its schema needs no footer-inference job (guide §1.2)
    schema = delta.schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed)

    def _write_manifest() -> None:
        # durable twin of the in-memory path list (ADVICE r11): a
        # restart with a preserved checkpoint resumes by reading this
        # — committed batches are checkpoint-skipped, so without it
        # their codes partitions would silently drop out of the view.
        # 100 TB contract (VERDICT r12 item 7): this atomic-replace
        # local JSON is the pipeline's single point of coordination; at
        # scale it becomes a conditional-put (compare-and-swap) to an
        # object store / catalog entry. The invariants that must
        # survive that port: (a) the manifest is durable BEFORE any GC
        # deletes a superseded root, (b) exactly one writer per root
        # lineage (here: the single foreachBatch driver), (c) readers
        # resolve the index ONLY through the manifest (root,
        # code_paths, index_version), never by listing directories.
        tmp = f"{manifest}.tmp"
        with open(tmp, "w") as fh:
            _json.dump(
                {
                    "root": state["root"],
                    "code_paths": state["code_paths"],
                    "folded": sorted(state["folded"]),
                    "index_version": state["index_version"],
                },
                fh,
            )
        _os.replace(tmp, manifest)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # a replayed batch is skipped WHOLE (ADVICE/VERDICT r11 item
        # 3: the previous shape read the already-registered partition
        # in `cur` while overwriting the same path — a read-overwrite
        # hazard under foreachBatch retry; ss21's skip-whole pattern)
        if batch_id in state["folded"]:
            return
        cur = dict(
            state["index"],
            # the live index's codes schema IS the partitions' schema —
            # skips a footer-inference job per micro-batch (guide §1.2)
            codes=spark.read.schema(state["index"]["codes"].schema).parquet(
                *state["code_paths"]
            ),
        )
        # on_overlap="skip" covers the partial-retry tail: rows an
        # earlier attempt encoded but never registered anti-join away
        dc = similarity.residual_ann_index_encode_delta(
            cur, batch_df, train_iters=2, train_mod=4, on_overlap="skip"
        )
        path = f"{state['root']}/codes_b{batch_id}.parquet"
        dc.write.mode("overwrite").parquet(path)
        state["code_paths"].append(path)
        state["folded"].add(batch_id)
        # compact-then-DELETE GC (VERDICT r11 item 2): persist the
        # current view to a FRESH versioned root (never in place — the
        # enforced residual_ann_index_persist rule), swap reads to it,
        # then delete the whole superseded root. Probe answers are
        # layout-invariant (pinned by test), so compaction changes file
        # boundaries, never rows.
        if compact_every and len(state["code_paths"]) > compact_every:
            old_root = state["root"]
            c_root = f"{root}_c{batch_id}"
            shutil.rmtree(c_root, ignore_errors=True)
            compacted = similarity.residual_ann_index_persist(
                dict(
                    state["index"],
                    codes=spark.read.schema(
                        state["index"]["codes"].schema
                    ).parquet(*state["code_paths"]),
                ),
                c_root,
            )
            state["index"] = compacted
            state["root"] = c_root
            state["code_paths"] = [f"{c_root}/codes.parquet"]
            _write_manifest()  # the new root is durable BEFORE the GC
            shutil.rmtree(old_root, ignore_errors=True)
            state["gone"].append(old_root)
        _write_manifest()

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{feed}_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        "state": state,
        "emb": emb,
        "fold": fold,
        "manifest": manifest,
        "delta": delta,
        "feed": feed,
    }


def _publish_retrained_snapshot(
    state: dict, manifest: str, res: dict, new_root: str
) -> None:
    """PUBLISH the retrained index back into the streaming state —
    the snapshot-version handoff a standing pipeline needs (VERDICT
    r12 item 1: ll110/ss24 previously retrained into a fresh root but
    the drain's manifest kept pointing at the stale v1, so the NEXT
    day would fold new batches against superseded quantizers and
    nothing ever deleted the dead root).

    No-op when the retrain trigger did not fire (``res['retrained']``
    false — nothing was written, nothing to publish). Otherwise, in
    the GC-safe order ``_ss21_drain``'s compaction established:

      1. swap the live fold state to the retrained index (root,
         single fresh codes path, quantizer frames), bumping
         ``index_version`` — the lineage a catalog records;
      2. make the swap DURABLE: atomically replace the manifest so a
         restart resumes against v2 (the next drain's folds encode
         against the RETRAINED quantizers via the manifest read path);
      3. only then DELETE the superseded v1 root(s) from disk — the
         delete-after-swap retention rule, now executed at this tier
         too.

    The caller must materialize anything computed against v1 (the
    before-probe's report rows) BEFORE publishing: the report plan
    lazily reads v1 parquet, and step 3 removes it. ``folded`` batch
    ids carry over unchanged — the retrain re-encoded base ∪ every
    folded delta, so those batches' rows live inside the v2 codes
    table and a checkpoint-preserved resume must still skip them."""
    import json as _json
    import os as _os
    import shutil

    if not res.get("retrained"):
        return
    superseded = sorted(
        {_os.path.dirname(p) for p in state["code_paths"]}
        | {state["root"]}
    )
    state["index"] = res["index"]
    state["root"] = new_root
    state["code_paths"] = [f"{new_root}/codes.parquet"]
    state["index_version"] = int(state.get("index_version", 1)) + 1
    tmp = f"{manifest}.tmp"
    with open(tmp, "w") as fh:
        _json.dump(
            {
                "root": state["root"],
                "code_paths": state["code_paths"],
                "folded": sorted(state["folded"]),
                "index_version": state["index_version"],
            },
            fh,
        )
    _os.replace(tmp, manifest)  # durable BEFORE the GC
    new_abs = _os.path.abspath(new_root)
    for r_ in superseded:
        if _os.path.abspath(r_) != new_abs:
            shutil.rmtree(r_, ignore_errors=True)
            state.setdefault("gone", []).append(r_)


@query("ss23_streaming_ann_ingest_trained", oracle=_ss23_oracle())
def ss23_streaming_ann_ingest_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING ANN ingest at the PRODUCTION grain (VERDICT r10 items
    1+2): ss22's foreachBatch fold re-pointed at ll107's trained
    fixed-k artifacts, with the write path a daily pipeline can
    actually afford — each micro-batch encodes its vectors against the
    FROZEN quantizers (``residual_ann_index_encode_delta``) and writes
    ONLY those rows as a batch-keyed codes partition
    (codes_b{batch_id}.parquet); the index's codes table is the
    multi-path read of base + all batch partitions, so nothing
    corpus-sized is ever rewritten: O(delta·k) fold compute, O(delta)
    fold WRITE (ss22's versioned wholesale codes_v{n} rewrite is
    O(state) per batch — the documented contrast).

    Idempotent per batch_id: a replayed batch is skipped WHOLE via the
    in-memory folded set (VERDICT r11 item 3 — the previous shape
    overwrote a registered partition the current plan reads), and
    ``on_overlap='skip'`` anti-joins away rows a PARTIAL earlier
    attempt encoded but never registered. The folded set covers
    WITHIN-RUN retries; across a restart with a preserved checkpoint
    the durable twin is the manifest written after every fold (ADVICE
    r11). Partition-list growth is bounded by the fold's
    compact-then-DELETE GC policy (``compact_every``, VERDICT r11
    item 2): ``residual_ann_index_persist`` to a fresh versioned root,
    swap, then DELETE the superseded root — exercised at a multi-batch
    grain with equality-vs-uncompacted pinned in
    tests/test_streaming.py (probe answers are layout-invariant).

    Same determinism as ss22: the fold is a pure per-vector function
    of frozen quantizers and associative, so the folded index — hence
    the probe answer — is identical under ANY micro-batching. The
    oracle is ll107's verbatim."""
    from ..operators import similarity

    r = _ss23_drain(spark, sf_dir)
    state = r["state"]
    folded = dict(
        state["index"],
        codes=spark.read.schema(state["index"]["codes"].schema).parquet(
            *state["code_paths"]
        ),
    )
    out = similarity.residual_ann_index_topk(
        r["emb"].where(F.col("vec_id") < 5), folded, k=10,
        train_iters=2, train_mod=4,
    )
    return out.select(
        "query_id",
        "cand_id",
        F.col("sim").cast("double").alias("sim"),
        "rank",
    )


def _ss24_oracle() -> str:
    from .llm_queries import _LL110_ORACLE

    return _LL110_ORACLE


@query("ss24_streaming_ann_retrain_gate", oracle=_ss24_oracle())
def ss24_streaming_ann_retrain_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE DETECT→ACT LOOP IN THE STREAMING RUNTIME — the last cell of
    the matrix: batch detect (ll108) / batch act (ll110) / streaming
    fold (ss23) / and now streaming detect→act. After the day's
    AvailableNow drain folds the delta through ss23's per-batch
    O(delta) writes, the snapshot's recall@10 is probed against exact
    brute-force (ll108's detector over the STREAMING-folded index),
    and a breach of the production target triggers ll110's retrain:
    quantizers re-fit over base ∪ folded corpus, re-encoded into a
    fresh versioned root, re-probed — the post-drain step a standing
    ingest pipeline runs before publishing the day's snapshot version.

    The oracle is ll110's VERBATIM: the streaming fold is associative
    and a pure per-vector function of the frozen quantizers (ss23's
    pinned property), so the streaming-folded index — hence the
    detect probe, the retrain trigger, and the retrained index — is
    identical to the batch chain's at any micro-batching. One
    registered row value-checks the full stream-fold → detect →
    retrain → verify arc in composition.

    Since r13 the retrained snapshot is PUBLISHED, not just produced
    (VERDICT r12 item 1): the drain's manifest is atomically swapped
    to the v2 root (index_version bumped — the lineage a catalog
    records), so a restart-resume or the next day's drain folds new
    batches against the RETRAINED quantizers, and the superseded v1
    root is DELETED after the manifest commits — the delete-after-swap
    rule the fold-root GC already follows. The report is materialized
    BEFORE the publish (its before-probe plan lazily reads v1, which
    the publish removes). The two-day arc — day-2 resume folding a
    fresh delta against v2 with v1 gone — is ss25's registered row and
    the two-lifetime pytest.

    Scale: the drain is ss23's (O(delta·k) fold compute, O(delta)
    writes, compact-then-DELETE GC policy); the detect/verify probes
    are ll52's bounded-sample contract, once per snapshot version;
    the retrain is paid only on a recall breach — the rare
    distribution-shift event."""
    from ..operators import similarity
    from .relational_queries import sink_path

    r = _ss23_drain(spark, sf_dir, name="ss24")
    state = r["state"]
    folded = dict(
        state["index"],
        codes=spark.read.schema(state["index"]["codes"].schema).parquet(
            *state["code_paths"]
        ),
    )
    v2_root = sink_path("ss24_index_v2", sf_dir)
    res = similarity.ann_index_retrain_on_drift(
        r["emb"].where(F.col("vec_id") < 5), r["emb"], folded,
        root=v2_root,
        threshold=0.9, k=10, train_iters=2, train_mod=4,
    )
    report = res["report"].select(
        "query_id",
        "index_version",
        F.col("recall_before").cast("double").alias("recall_before"),
        F.col("recall_after").cast("double").alias("recall_after"),
        "retrained",
    )
    # materialize the report before the publish deletes the v1 root
    # its before-probe plan reads
    rep_path = sink_path("ss24_report", sf_dir)
    report.write.mode("overwrite").parquet(rep_path)
    _publish_retrained_snapshot(state, r["manifest"], res, v2_root)
    return spark.read.parquet(rep_path).select(
        "query_id",
        "index_version",
        "recall_before",
        "recall_after",
        "retrained",
    )


def _ss25_oracle() -> str:
    # the TWO-DAY publish arc in one from-scratch chain: quantizers
    # trained over the day-1 corpus (base ∪ delta1 = vec_id % 5 <> 0
    # OR vec_id % 10 = 0 — exactly what the end-of-day-1 retrain
    # re-fits over), EVERY candidate (incl. day-2's delta2) encoded
    # against them. Because assignment/encoding are pure per-vector
    # functions of frozen quantizers, "v2 retrain over day-1 corpus +
    # day-2 fold of delta2 against v2" equals this chain exactly — the
    # same base/delta relationship ll107's oracle pins, shifted one
    # day forward past the publish.
    from .llm_queries import _kmeans_ctes, _residual_ivfpq_body

    return (
        _kmeans_ctes(
            8, 3, where=" WHERE vec_id % 5 <> 0 OR vec_id % 10 = 0"
        )
        + " cents AS (SELECT cid AS centroid_id, cv AS centv FROM c3),"
        + _residual_ivfpq_body("({c} % 5 <> 0 OR {c} % 10 = 0)")
    )


@query("ss25_streaming_snapshot_publish", oracle=_ss25_oracle())
def ss25_streaming_snapshot_publish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE SNAPSHOT-VERSION HANDOFF (VERDICT r12 item 1) — the seam
    ss24 left open, closed as a registered row: a standing ingest
    pipeline's two-day arc where day 2 actually CONSUMES what day 1
    retrained.

      Day 1: ss23's drain folds delta1 (vec_id % 10 == 0) against the
        base-trained v1 snapshot; the detect probe breaches the
        production recall target (the synthetic corpus sits far below
        0.9 at every sf — ll110's documented always-act fixture), so
        the quantizers re-train over the day-1 corpus (base ∪ delta1)
        and the retrained index is PUBLISHED:
        ``_publish_retrained_snapshot`` swaps the drain's manifest to
        the v2 root (index_version 1 → 2), then deletes the
        superseded v1 root — manifest durable before the GC.
      Day 2: delta2 (vec_id % 5 == 0 AND % 10 != 0) lands in the SAME
        feed; the drain resumes with the preserved checkpoint (day-1
        batches skipped, nothing replayed — the resume path reads the
        manifest, so it folds delta2 against the RETRAINED v2
        quantizers into a batch-keyed O(delta) partition under the v2
        root). The registered output is day-2's top-10 probe over the
        published state.

    Oracle: the from-scratch chain with the TRAINING slice = the
    day-1 corpus and every candidate encoded
    (``_kmeans_ctes(where=...)`` + ``_residual_ivfpq_body(pred)``) —
    hash-equality proves the publish handoff end-to-end: wrong-root
    manifest, stale quantizers, a replayed day-1 batch, or a missing
    delta2 fold would each shift the values. The versioning/GC
    assertions (v1 gone from disk, index_version 2, two-lifetime ==
    one-shot) are pinned in tests/test_streaming.py.

    Scale: two ss23 drains (O(delta·k) compute, O(delta) writes) + one
    ll110 detect/act (bounded probes; retrain paid on breach only) —
    nothing here exceeds the audited per-day costs; the publish itself
    is one manifest CAS + one root delete."""
    from ..operators import similarity
    from .relational_queries import sink_path

    day1 = _ss23_drain(
        spark, sf_dir, name="ss25",
        delta_pred=F.col("vec_id") % 10 == 0,
    )
    state = day1["state"]
    folded = dict(
        state["index"],
        codes=spark.read.schema(state["index"]["codes"].schema).parquet(
            *state["code_paths"]
        ),
    )
    corpus1 = day1["emb"].where(
        (F.col("vec_id") % 5 != 0) | (F.col("vec_id") % 10 == 0)
    )
    v2_root = sink_path("ss25_index_v2", sf_dir)
    res = similarity.ann_index_retrain_on_drift(
        day1["emb"].where(F.col("vec_id") < 5), corpus1, folded,
        root=v2_root, threshold=0.9, k=10, train_iters=2, train_mod=4,
    )
    _publish_retrained_snapshot(state, day1["manifest"], res, v2_root)
    # day 2: fresh delta lands in the same feed (append — new files
    # only; the preserved checkpoint skips day-1's), drain resumes
    # from the manifest and folds against the published v2 quantizers
    delta2 = day1["emb"].where(
        (F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 10 != 0)
    )
    delta2.write.mode("append").parquet(day1["feed"])
    day2 = _ss23_drain(spark, sf_dir, name="ss25", resume=True)
    st2 = day2["state"]
    final = dict(
        st2["index"],
        codes=spark.read.schema(st2["index"]["codes"].schema).parquet(
            *st2["code_paths"]
        ),
    )
    out = similarity.residual_ann_index_topk(
        day1["emb"].where(F.col("vec_id") < 5), final, k=10,
        train_iters=2, train_mod=4,
    )
    return out.select(
        "query_id",
        "cand_id",
        F.col("sim").cast("double").alias("sim"),
        "rank",
    )


def ss21_components(spark: SparkSession, sf_dir: str) -> dict:
    """Bench decomposition of ss21 (the ss18/ll100 device): the
    headline row conflates the one-time DAY-0 state build with the
    recurring STREAM drain (day-N stages + the state fold inside
    foreachBatch). Times them separately and derives the per-delta-doc
    ingest throughput. Not a registered query (reports timings);
    bench.py records it next to ss21's headline row."""
    import shutil
    import time as _time

    from .llm_queries import (
        _ll100_build_state,
        _ll100_day_n_over,
        _ll100_fixture,
        _ll100_fold_delta_frames,
    )
    from .relational_queries import sink_path

    base, delta, t = _ll100_fixture(spark, sf_dir)
    n = next(_COUNTER)
    t0 = _time.perf_counter()
    state_root = _ll100_build_state(
        spark, base, sf_dir, root=sink_path(f"ss21c_state_{n}", sf_dir)
    )
    day0_build_s = _time.perf_counter() - t0

    feed = sink_path(f"ss21c_feed_{n}", sf_dir)
    out_path = sink_path(f"ss21c_out_{n}", sf_dir)
    for stale in (out_path, f"{feed}_chk"):
        shutil.rmtree(stale, ignore_errors=True)
    delta.write.mode("overwrite").parquet(feed)
    n_delta = spark.read.parquet(feed).count()
    # the feed was written from `delta` (resume appends the same
    # shape), so its schema needs no footer-inference job (guide §1.2)
    schema = delta.schema

    state = {"roots": [state_root], "max_id": t}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # ss21's O(delta) fold verbatim (the decomposition must time
        # the production write path, not a rewrite)
        delta_root = f"{state_root}_d{batch_id}"
        if delta_root in state["roots"]:
            return
        fr = _ll100_day_n_over(
            spark, batch_df, state["roots"], state["max_id"]
        )
        fr["out"].write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )
        shutil.rmtree(delta_root, ignore_errors=True)
        # six O(delta) artifact writes per batch — independent
        # directories, overlapped on driver threads (guide §2.6)
        write_frames(_ll100_fold_delta_frames(fr), delta_root)
        mx = batch_df.agg(F.max("doc_id")).collect()[0][0]
        state["roots"].append(delta_root)
        if mx is not None:
            state["max_id"] = max(state["max_id"], int(mx))

    t0 = _time.perf_counter()
    q = (
        spark.readStream.schema(schema)
        .parquet(feed)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{feed}_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drain_fold_s = _time.perf_counter() - t0
    return {
        "day0_build_s": round(day0_build_s, 4),
        "drain_fold_s": round(drain_fold_s, 4),
        "delta_docs_per_s": round(n_delta / drain_fold_s, 1),
    }
