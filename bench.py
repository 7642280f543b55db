#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md): warm SparkSession, each query timed end-to-end
(plan -> Arrow toPandas materialization), median of 3 runs after one warmup.

Headline set: one representative per operator family —
multi-join star agg, grouped moments, cross+anti missing-cells, in-group
vector assembly, shuffle join, semi join, explode symmetrize, top-k,
correlation self-join, iterative connected components, text stats,
exact dedup, cosine top-k, document chunking, n-gram vocabulary, CUBE,
bucketed co-located join (timing includes writing both bucketed tables),
streaming tumbling window.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_revenue_by_nation",
    "a3_probe_moments",
    "a4_missing_cells",
    "a7_vector_assemble",
    "j2_join_filter",
    "j6_semi_join",
    "p4_flatmap_symmetrize",
    "b1_topk",
    "c2_pearson_corr_edges",
    "i1_c3_connected_components",
    "ll1_text_stats",
    "ll4_dedup_exact",
    "ll8_cosine_topk",
    "ll13_chunk_documents",
    "ll16_ngram_vocab",
    "b4_cube_agg",
    "b21_scd2_dimension",
    "j10_interval_overlap_join",
    "s9_bucketed_colocated_join",
    "ss1_tumbling_window",
    # dedup / pipeline heavy tier (VERDICT r2 item 4): the LSH
    # candidate-generation path, the composed dedup materializer, the
    # end-to-end pretraining pipeline, and batch sessionization
    "ll6_minhash_lsh",
    "ll34_deduped_corpus",
    "ll40_pipeline_end2end",
    "b23_sessionize",
    # round 3: the embedding-space dedup tier (cluster-scoped pair
    # join over the full embeddings table) and the heaviest shared-text
    # TPC-H shape (Q5's six-table join)
    "ll42_semantic_dedup",
    "sql3_tpch_q5_shared_text",
    # round 3b: corpus-wide DSIR scoring, the train x eval embedding
    # decontamination pass, and the one-shuffle OHLC resample over the
    # full events table
    "ll53_dsir_weights",
    "ll55_semantic_decontaminate",
    "o6_ohlc_bars",
    "ll56_remove_repeated_segments",
    # round 4: the composed IVF-PQ ANN tier, BPE merge training, the
    # point-in-time feature join, and the NB classifier
    "ll60_ivfpq_ann_topk",
    "ll62_bpe_merges",
    "j12_pit_join",
    "c7_naive_bayes_langid",
    # round 5: the ExactSubstr cross-doc span tier, the BPE
    # train->apply composition, the quality-aware dedup decision, the
    # domain-graph SCC, and the ordered funnel
    "ll65_cross_doc_substrings",
    "ll66_bpe_encode",
    "ll67_cluster_quality_keeper",
    "g10_scc_event_types",
    "b26_funnel_stages",
    # round 5b: the per-doc duplication profile (ll65's scalar
    # companion), derived temperature mixture rates, the MinHash
    # estimator-calibration sweep over the LSH candidate population,
    # and interpolated bigram LM scoring
    "ll68_duplication_profile",
    "ll71_temperature_sample",
    "ll72_minhash_calibration",
    "ll73_bigram_lm_score",
    # round 5c: cross-video frame dedup (fingerprints shuffle, never
    # pixels), JL embedding compression (narrow map), the IVF cell-
    # quality silhouette (N^1.5 scoring), and distributed IRLS (4
    # map-side-combined corpus scans)
    "ll75_frame_dedup",
    "ll76_jl_projection",
    "ll77_cell_silhouette",
    "c8_logistic_irls",
    # round 6: the production ANN configuration (kmeans-trained coarse
    # quantizer composed with IVF-PQ — VERDICT r5 item 8), plus the
    # streaming surface beyond ss1 (VERDICT r5 item 6): arbitrary-
    # stateful running totals, data-driven session windows, and the
    # stream-vs-persisted-index near-dup probe — state-store and
    # AvailableNow drain regressions become bench-visible.
    "ll79_ivfpq_trained_topk",
    "ss5_stateful_totals",
    "ss17_dynamic_session_window",
    "ss18_streaming_neardup_probe",
    # round 6b: the ExactSubstr excision materializer (positions +
    # anti-join + reassembly), the first-occurrence novelty gram pass,
    # the dim^2 Gramian + power iteration, and the decode->aHash
    # perceptual dedup (Arrow boundary cost made bench-visible)
    "ll87_excise_repeated_spans",
    "ll82_ngram_novelty",
    "c9_pca_power_iteration",
    "ll90_image_ahash_dedup",
    # round 7: the engine's flagship — the complete curation recipe
    # (rules -> exact+near dedup -> span excision -> DSIR selection ->
    # packing) composed as ONE plan (VERDICT r6 item 1) — and the
    # recall-fixed 64x ANN tier (residual PQ + trained codebook,
    # VERDICT r6 item 2)
    "ll94_curation_pipeline",
    "ll95_residual_ivfpq_topk",
    # round 7b: paragraph-grain dedup and the composed streaming
    # ingest gate (rules -> snapshot dedup -> in-feed dedup -> DSIR)
    "ll98_paragraph_dedup",
    "ss20_streaming_curation_gate",
    # round 9: the funnel datacard over ll94's shared stages (records
    # the "report is free relative to the pipeline" claim — VERDICT r8
    # item 9), the day-N incremental curation pipeline, and the
    # weak-label learned quality scorer
    "ll99_curation_funnel",
    "ll100_incremental_curation",
    "ll101_learned_quality_scorer",
    # round 9b: the multimodal resize kernel (Arrow decode boundary)
    # and the cross-modality dedup gate
    "ll102_image_resize_pooled",
    "ll103_multimodal_dedup_gate",
    # round 10: the bridge detector (incremental curation's re-curate
    # trigger), the persisted ANN index (build + parquet round-trip +
    # probe), and the streaming form of day-N curation (foreachBatch
    # state fold)
    "ll104_component_bridges",
    "ll105_ann_index_persisted",
    "ss21_streaming_incremental_curation",
    # round 11 (VERDICT r10 item 1): the incremental-ANN bench rows
    # now measure the PRODUCTION grain — ll107/ss23 are the trained
    # fixed-k fold (O(delta·k) compute, O(delta) write) that replaced
    # ll106/ss22's closed-form mod-23 rows here (those stay registered
    # and correctness-checked; their N×M assignment grain is
    # superlinear by design and was dragging the sf1 growth factor —
    # 10.8×/8.6× per-row — while measuring a shape the docstrings
    # themselves route production away from). Plus the drift detector
    # and the bridge-triggered re-curation closing the detect→act
    # loops.
    "ll107_ann_index_delta_trained",
    "ss23_streaming_ann_ingest_trained",
    "ll108_ann_recall_drift",
    "ll109_bridge_recuration",
    # round 12 (VERDICT r11 item 1): the ACTION half of the ANN
    # detect→act loop — detect recall decay, re-train quantizers over
    # the union corpus, persist to a fresh versioned root, verify
    # recovery (decomposed in ll110_components: build/detect/act) —
    # and the same arc run against the STREAMING-folded index (the
    # post-drain snapshot-publish step of a standing ingest pipeline)
    "ll110_ann_retrain_on_drift",
    "ss24_streaming_ann_retrain_gate",
    # round 13 (VERDICT r12 item 1): the two-day snapshot-version
    # handoff — day-1 drain + detect + retrain + PUBLISH (manifest
    # swap to the v2 root, superseded v1 deleted), then day-2's drain
    # resumes from the manifest and folds a fresh delta against the
    # retrained quantizers. Costs = ss24's arc + one small second-day
    # drain + the publish (a manifest CAS + one root delete).
    "ss25_streaming_snapshot_publish",
]


def _calibration_query(spark, sf_dir):
    """Fixed trivial query timed FIRST and LAST in the headline pass
    (VERDICT r8 item 5): one narrow scan + 25-key aggregate whose plan
    never changes across rounds, so cross-round drift on it separates
    session/registry/host overhead from genuine query regressions —
    measured necessary in r08, where a -12% headline and a +10%
    r02-subset moved in opposite directions on byte-identical code."""
    from flink_luad_pipeline_spark import catalog

    return (
        catalog.load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .count()
    )


def _time_calibration(spark, sf_dir) -> float:
    _calibration_query(spark, sf_dir).toPandas()  # warmup
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _calibration_query(spark, sf_dir).toPandas()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 4)


def main() -> None:
    # Timed runs must exercise the real parquet scan every iteration —
    # disable the query-layer .cache() reuse (see llm_queries._augmented)
    os.environ["SPARK_GRAFT_NO_CACHE"] = "1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_luad_pipeline_spark import catalog, plans
    from flink_luad_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    queries = plans.all_queries()

    # warm the session (JVM, parquet footers, codegen) outside timing;
    # catalog.load handles the events TIMESTAMP(NANOS) column
    for t in ("lineitem", "events", "documents", "embeddings"):
        catalog.load(spark, sf_dir, t).count()

    calibration_first = _time_calibration(spark, sf_dir)
    calibration_mid = None
    mid_at = len(HEADLINE) // 2
    # Per-window canary samples (VERDICT r12 item 3): the r12 driver
    # run read a 2.30x subset while the first/mid/last triplet looked
    # coupled — load arrived INSIDE subset positions 13-20, where no
    # canary could see it. Sampling the fixed plan after every 10
    # headline queries (~1 s each against a ~6-min sweep) brackets the
    # r02 subset (samples at i=10 and i=20) and every later window, so
    # the decoupled-run discard rule below covers load that arrives
    # mid-sweep, not just before/after it.
    canary_window: list[dict] = []

    per_query: dict[str, float | None] = {}
    failed: list[str] = []
    for qi, name in enumerate(HEADLINE):
        if qi and qi % 10 == 0:
            canary_window.append(
                {"i": qi, "s": _time_calibration(spark, sf_dir)}
            )
        if qi == mid_at:
            # third canary sample (VERDICT r11 item 7): host load is
            # not constant across the ~20-minute sweep, so the
            # normalization uses the MEDIAN of first/mid/last instead
            # of the single first observation
            calibration_mid = _time_calibration(spark, sf_dir)
        fn = queries[name]
        # full driver materialization via Arrow (toPandas): same
        # end-to-end semantics as collect() but batch-columnar transfer
        # instead of py4j row-at-a-time pickling, which would otherwise
        # dominate timings for queries returning ~1M rows
        try:
            fn(spark, sf_dir).toPandas()  # warmup run (not timed)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                runs.append(time.perf_counter() - t0)
            per_query[name] = round(statistics.median(runs), 4)
        except Exception as exc:  # one bad query must not kill the metric
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            per_query[name] = None
            failed.append(name)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # A failed query must not shrink the headline number: with any
    # failure the total is null (incomparable), never a better-looking
    # partial sum.
    total = (
        None
        if failed
        else round(sum(v for v in per_query.values() if v is not None), 4)
    )
    calibration_last = _time_calibration(spark, sf_dir)
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # same fixed plan measured before and after the sweep: _first
        # drift across rounds = host/session baseline moved; _last >>
        # _first within a round = the session aged during the sweep
        "calibration_first_s": calibration_first,
        "calibration_mid_s": calibration_mid,
        "calibration_last_s": calibration_last,
    }
    # Round-over-round comparability (VERDICT r3 item 5): the set grew
    # 20 -> 30 queries across rounds, so also report the original
    # 20-query subtotal alongside the full total.
    r02_subset = HEADLINE[:20]
    if not any(per_query.get(n) is None for n in r02_subset):
        out["r02_subset_total"] = round(
            sum(per_query[n] for n in r02_subset), 4
        )
        # Mechanized host-load normalization (VERDICT r10 item 8): the
        # r8/r9/r10 cross-round adjudications all used the same rule —
        # when the fixed-plan calibration canary and the r02 subset
        # move together, the common factor is host/session load, not a
        # code regression. Emit the normalized comparator as a recorded
        # number instead of SCALE.md prose: subset scaled by
        # (reference canary / this run's canary). Reference = 0.293 s,
        # the r9 DRIVER run's calibration_first (the earliest
        # driver-recorded canary on this host class; idle runs read
        # 0.216-0.344). Unclamped on purpose: an idle-fast host scales
        # the subset UP the same way a loaded host scales it down.
        # The canary is now sampled FIRST/MID/LAST (VERDICT r11 item
        # 7) and the triplet is recorded — but the normalization keeps
        # the FIRST sample, not the median: the three samples are not
        # exchangeable (mid/last run on a sweep-aged session and read
        # a structurally faster ~0.13 s vs first's ~0.27 s on the same
        # idle host — measured in two r12 runs), while the 0.293
        # reference IS a first-sample, so a median-normalized number
        # silently overcorrects ~2x (observed: 32.8 "normalized" from
        # a 14.6 s subset). The median is emitted alongside as a pure
        # observable, and canary_decoupled mechanizes the discard
        # rule: when the triplet spreads beyond the aged-session band,
        # load moved DURING the sweep and no normalization claim
        # applies to this run.
        samples = [
            c
            for c in (calibration_first, calibration_mid, calibration_last)
            if c is not None
        ]
        out["calibration_median_s"] = round(statistics.median(samples), 4)
        # Decoupled-run rule, two phenomena separated (VERDICT r12
        # item 3; the naive all-samples spread false-positives on an
        # idle host because the FIRST sample is structurally ~2.1-2.3x
        # the aged floor — fresh-session vs sweep-aged, measured
        # 0.275/0.130 r12 and 0.342/0.150 r13 on idle runs):
        #   (a) spread WITHIN the aged samples (mid/last + every
        #       in-window sample, all on the aged session — idle
        #       spread reads ~1.6x) > 2.6x => load moved DURING the
        #       sweep; the i=10/i=20 samples bracket the r02 subset
        #       specifically, the window the r12 driver's 2.30x
        #       reading fell into unobserved;
        #   (b) first / median(aged) outside [1.4, 2.6] => the first
        #       sample (the normalization denominator) is itself off:
        #       > 2.6 = startup load inflated it (the flagged d620bfc
        #       run read 3.03); < 1.4 = the aged sweep ran under load
        #       the idle first sample never saw.
        aged = [c for c in (calibration_mid, calibration_last) if c is not None]
        aged += [c["s"] for c in canary_window]
        out["canary_window"] = canary_window
        if aged:
            aged_spread = max(aged) / max(min(aged), 1e-9)
            first_ratio = calibration_first / max(
                statistics.median(aged), 1e-9
            )
            out["canary_aged_spread"] = round(aged_spread, 3)
            out["canary_first_over_aged"] = round(first_ratio, 3)
            out["canary_decoupled"] = bool(
                aged_spread > 2.6
                or first_ratio > 2.6
                or first_ratio < 1.4
            )
        else:
            out["canary_decoupled"] = False
        out["r02_subset_normalized"] = round(
            out["r02_subset_total"] * (0.293 / calibration_first), 4
        )
    if failed:
        out["failed"] = failed

    # sf1 scaling probe (VERDICT r3 item 7): rerun the headline set on
    # the 10x key-shifted replica so the sf0.1 -> sf1 scale factor is a
    # driver-reproducible artifact, not just a SCALE.md note. Runs only
    # for the default sf0.1 bench; SPARK_GRAFT_SKIP_SF1=1 opts out.
    # Protocol: replica materialized once under /tmp, ONE warm run per
    # query (the session/codegen are already hot from the sf0.1 pass) —
    # the section exists to measure the sf0.1 -> sf1 growth FACTOR, and
    # bounding its wall-time keeps the whole bench inside any driver
    # budget.
    is_default_sf = False
    try:
        is_default_sf = float(sf) == 0.1
    except ValueError:
        pass
    # ss18's headline row conflates the one-time snapshot index build
    # with the streaming drain (VERDICT r6 item 5) — record the
    # decomposition + micro-batch throughput next to it.
    if "ss18_streaming_neardup_probe" in HEADLINE and not failed:
        try:
            from flink_luad_pipeline_spark.plans.streaming_queries import (
                ss18_components,
            )

            out["ss18_components"] = ss18_components(spark, sf_dir)
        except Exception as exc:
            print(f"bench: ss18 decomposition FAILED: {exc}", file=sys.stderr)
    # ll100's headline row times day-0 state build + day-N probe
    # together; the recurring 100 TB cost is day-N alone — record the
    # decomposition next to it (the ss18_components device)
    if "ll100_incremental_curation" in HEADLINE and not failed:
        try:
            from flink_luad_pipeline_spark.plans.llm_queries import (
                ll100_components,
            )

            out["ll100_components"] = ll100_components(spark, sf_dir)
        except Exception as exc:
            print(f"bench: ll100 decomposition FAILED: {exc}", file=sys.stderr)
    # ll101's sf10 growth was attributed to the hashed-feature pass
    # without a measurement (VERDICT r9 item 8) — record the
    # feature/train/score split next to the headline row
    if "ll101_learned_quality_scorer" in HEADLINE and not failed:
        try:
            from flink_luad_pipeline_spark.plans.llm_queries import (
                ll101_components,
            )

            out["ll101_components"] = ll101_components(spark, sf_dir)
        except Exception as exc:
            print(f"bench: ll101 decomposition FAILED: {exc}", file=sys.stderr)
    # ll104's headline row conflates the day-0 artifact build with the
    # recurring detector probe; ss21's conflates the day-0 state build
    # with the stream drain+fold — decompose both (the ss18 device)
    if "ll104_component_bridges" in HEADLINE and not failed:
        try:
            from flink_luad_pipeline_spark.plans.llm_queries import (
                ll104_components,
            )

            out["ll104_components"] = ll104_components(spark, sf_dir)
        except Exception as exc:
            print(f"bench: ll104 decomposition FAILED: {exc}", file=sys.stderr)
    if "ss21_streaming_incremental_curation" in HEADLINE and not failed:
        try:
            from flink_luad_pipeline_spark.plans.streaming_queries import (
                ss21_components,
            )

            out["ss21_components"] = ss21_components(spark, sf_dir)
        except Exception as exc:
            print(f"bench: ss21 decomposition FAILED: {exc}", file=sys.stderr)
    # ll107's headline row conflates the once-per-snapshot trained
    # BUILD (ll105's cost, the sf1 cap-knee term) with the recurring
    # O(delta) fold and the probe — decompose so the production costs
    # (fold_s, probe_s) are recorded numbers
    if "ll107_ann_index_delta_trained" in HEADLINE and not failed:
        try:
            from flink_luad_pipeline_spark.plans.llm_queries import (
                ll107_components,
            )

            out["ll107_components"] = ll107_components(spark, sf_dir)
        except Exception as exc:
            print(f"bench: ll107 decomposition FAILED: {exc}", file=sys.stderr)
    # ll110's headline row conflates the day-0 build it shares with
    # ll107/ll108, the recurring DETECT probe, and the rare ACT path
    # (retrain + persist + verify) — decompose so the per-snapshot
    # detect cost and the on-trigger act cost are recorded numbers
    if "ll110_ann_retrain_on_drift" in HEADLINE and not failed:
        try:
            from flink_luad_pipeline_spark.plans.llm_queries import (
                ll110_components,
            )

            out["ll110_components"] = ll110_components(spark, sf_dir)
        except Exception as exc:
            print(f"bench: ll110 decomposition FAILED: {exc}", file=sys.stderr)
    if is_default_sf and not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        try:
            # _sf1_section stops the aged session and runs on a fresh
            # one; reassigning keeps main()'s handle live (ADVICE r7 —
            # the old handle was dead after the sf1 block)
            out["sf1"], spark = _sf1_section(spark, queries, per_query)
        except Exception as exc:  # the probe must not kill the metric
            print(f"bench: sf1 probe FAILED: {exc}", file=sys.stderr)
            out["sf1"] = {"error": str(exc)[:200]}
    # Full-detail artifact to a file; stdout gets ONE compact line.
    # The driver tail-captures stdout with a bounded buffer — r04's
    # line overflowed it and the recorded artifact had parsed:null —
    # so the printed line is shrunk (2-decimal times, no sf1 per-query
    # dict, compact separators) to fit any plausible tail window,
    # while bench_full.json keeps full precision and the sf1
    # per-query breakdown.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_full.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)
    # Key layout (VERDICT r13 item 7): scalars/totals/canaries FIRST,
    # the per-query dict and the sf1 section LAST — BENCH_r12's stored
    # tail was truncated mid-way through the per-query dict and the
    # whole round-over-round comparison was lost; with this order a
    # truncated capture still carries every headline scalar up front.
    # Same keys, same values, same one-line contract — layout only.
    compact = {
        k: v for k, v in out.items() if k not in ("queries", "sf1")
    }
    compact["queries"] = {
        k: (round(v, 2) if v is not None else None)
        for k, v in out["queries"].items()
    }
    if isinstance(out.get("sf1"), dict):
        compact["sf1"] = {
            k: v
            for k, v in out["sf1"].items()
            if k not in ("queries", "queries_cold")
        }
    print(json.dumps(compact, separators=(",", ":")))


def _sf1_section(spark, queries, sf01_per_query) -> tuple[dict, object]:
    # The sf0.1 pass leaves the JVM aged — 59 queries x 4 runs of
    # accumulated broadcast/codegen/checkpoint state inflated several
    # sf1 rows 2-7x (ll42: 81.7 s aged vs 12.1 s fresh, measured r7).
    # The sf1 probe is a separate protocol section, so it runs on a
    # FRESH session; the first queries re-warm footers/codegen, which
    # is the same one-warm-run contract the section always had.
    from flink_luad_pipeline_spark.session import get_spark

    spark.stop()
    spark = get_spark("bench_sf1")
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    # _SUCCESS sentinel, written only after materialize() returns: a
    # crashed prior run leaves table dirs (even lineitem's) behind, and
    # reusing a partial replica would silently time queries over wrong
    # data. No sentinel -> rebuild from scratch.
    sentinel = os.path.join(sf1_dir, "_SUCCESS")
    if not os.path.isfile(sentinel):
        from scripts.make_scale_data import materialize

        materialize(spark, sf1_dir)
        with open(sentinel, "w") as fh:
            fh.write("ok\n")
    # Queries whose single sf1 run exceeds the probe's per-query budget
    # are skipped HERE (their sf1/sf10 factors are measured and
    # explained in SCALE.md's sf10 table instead): ll95's trained
    # residual-PQ path runs ~10 driver-synchronized training stages
    # (~156 s at sf1 — constant-dominated, growth 5.4x), which would
    # double this section's wall time for a number SCALE.md already
    # carries.
    # ll105 shares ll95's constant-dominated trained-residual path and
    # adds the full-corpus encode + parquet round-trip — its scale
    # shape is carried by the SCALE.md sf10 probe instead.
    sf1_skip = {
        "ll95_residual_ivfpq_topk",
        "ll105_ann_index_persisted",
        # The ll107 family carries ll105's trained-residual BUILD in
        # every registered row (the once-per-snapshot cost; decomposed
        # in ll107_components): the PQ code count grows as N/64 until
        # the 256-code cap binds at N=16384 — between sf0.1 and sf1 —
        # so sf0.1→sf1 measures the cap-knee's one-time 10-15×, not an
        # asymptotic shape (above the knee, training is sample-bounded
        # and encode is O(N·m·256), linear; SCALE.md's sf10 probe
        # carries that measurement, same protocol as ll95/ll105).
        "ll107_ann_index_delta_trained",
        "ss23_streaming_ann_ingest_trained",
        "ll108_ann_recall_drift",
        # ll110 = ll108's build+detect plus a retrain that REBUILDS
        # the trained index over the union corpus — two cap-knee
        # builds in one row; same sf10-probe protocol as the family.
        # ss24 is the same arc against the streaming-folded index;
        # ss25 adds the publish + a second-day drain on top of it.
        "ll110_ann_retrain_on_drift",
        "ss24_streaming_ann_retrain_gate",
        "ss25_streaming_snapshot_publish",
    }
    # warm the FRESH session the same way the sf0.1 section warms its
    # session (JVM, parquet footers, codegen) — without this the first
    # timed sf1 rows absorb the session warmup and report phantom
    # ratios (p4 read 11x in a round-11 run; it is a projection)
    from flink_luad_pipeline_spark import catalog

    for t in ("lineitem", "events", "documents", "embeddings"):
        catalog.load(spark, sf1_dir, t).count()
    # s9's bucketed tables are created on first touch per (session,
    # sf_dir); the sf0.1 iterations reuse warm tables but this fresh
    # sf1 dir would pay the one-time write INSIDE the timed run —
    # r06's 13.7x "growth" was that measurement artifact (VERDICT r6
    # item 5). Stage the write outside timing and report it as its own
    # prep metric so the timed row measures the zero-shuffle join.
    prep: dict[str, float] = {}
    if "s9_bucketed_colocated_join" in HEADLINE:
        try:
            t0 = time.perf_counter()
            queries["s9_bucketed_colocated_join"](spark, sf1_dir).toPandas()
            prep["s9_bucketed_write_s"] = round(time.perf_counter() - t0, 4)
        except Exception as exc:
            print(f"bench: sf1 s9 staging FAILED: {exc}", file=sys.stderr)
    # Two timed runs per query (VERDICT r11 item 4 — "factor computed
    # over warmed rows"): the sf0.1 side times a median-of-3 AFTER a
    # warmup run, but this section's historical one-COLD-run protocol
    # let per-query first-run effects read as scale growth — p4
    # materializes 11.8M rows at sf1 and its first Arrow transfer pays
    # allocator/JIT warmup (measured 11.6 -> 7.0 -> 2.4 -> 2.1 s on an
    # idle fresh session; the committed r11 artifact carried that 11x
    # phantom). The WARM (second) run is the headline number and feeds
    # the factor; the cold (first) run is kept per-query for
    # cross-round continuity with the pre-r12 protocol.
    per_query: dict[str, float | None] = {}
    per_query_cold: dict[str, float | None] = {}
    failed = []
    for name in HEADLINE:
        if name in sf1_skip:
            continue
        try:
            t0 = time.perf_counter()
            queries[name](spark, sf1_dir).toPandas()
            per_query_cold[name] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            queries[name](spark, sf1_dir).toPandas()
            per_query[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:
            print(f"bench: sf1 {name} FAILED: {exc}", file=sys.stderr)
            per_query[name] = None
            per_query_cold.setdefault(name, None)
            failed.append(name)
    total = (
        None
        if failed
        else round(sum(v for v in per_query.values() if v is not None), 4)
    )
    section = {
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "queries_cold": per_query_cold,
        "sf": 1.0,
    }
    if prep:
        section["prep"] = prep
    if sf1_skip:
        section["skipped"] = sorted(sf1_skip)
    if failed:
        section["failed"] = failed
    # growth factor over the COMMON query set (skipped queries excluded
    # from BOTH sides, else the ratio is distorted); _cold is the
    # pre-r12 one-cold-run protocol's number for cross-round continuity
    common = [
        n
        for n in per_query
        if per_query[n] is not None and sf01_per_query.get(n) is not None
    ]
    base = sum(sf01_per_query[n] for n in common)
    if total is not None and base:
        section["scale_factor_vs_sf0.1"] = round(
            sum(per_query[n] for n in common) / base, 2
        )
        section["scale_factor_cold"] = round(
            sum(per_query_cold[n] for n in common) / base, 2
        )
    return section, spark


if __name__ == "__main__":
    main()
