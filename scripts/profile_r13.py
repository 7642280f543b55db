#!/usr/bin/env python
"""Round-13 measurement harness (guide §1: measure first).

Times selected headline queries with the bench protocol (warmup +
median of 3 Arrow toPandas materializations) and captures
explain("formatted") of the returned frame to plans/r13/<name>_<tag>.txt.

Usage: python scripts/profile_r13.py <tag> [query ...]
  tag: "before" / "after" (file suffix)
  no queries -> the default heavy set.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "ll105_ann_index_persisted",
    "ll107_ann_index_delta_trained",
    "ll108_ann_recall_drift",
    "ll110_ann_retrain_on_drift",
    "ss23_streaming_ann_ingest_trained",
    "ss24_streaming_ann_retrain_gate",
    "ss25_streaming_snapshot_publish",
    "ll100_incremental_curation",
    "ss21_streaming_incremental_curation",
    "ll104_component_bridges",
    "ll109_bridge_recuration",
    "ll99_curation_funnel",
    "ll94_curation_pipeline",
    "ll95_residual_ivfpq_topk",
    "ss18_streaming_neardup_probe",
    "ss20_streaming_curation_gate",
    "ll6_minhash_lsh",
    "ll34_deduped_corpus",
    "ll40_pipeline_end2end",
    "ss1_tumbling_window",
]


def main() -> None:
    os.environ["SPARK_GRAFT_NO_CACHE"] = "1"
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    from flink_luad_pipeline_spark import catalog, plans
    from flink_luad_pipeline_spark.session import get_spark

    spark = get_spark("profile_r13")
    queries = plans.all_queries()
    for t in ("lineitem", "events", "documents", "embeddings"):
        catalog.load(spark, sf_dir, t).count()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    results: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        df.toPandas()  # finish the warmup invocation
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            runs.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(runs), 3)
        print(f"{name}: {results[name]}s  (runs: {[round(r,2) for r in runs]})",
              flush=True)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": results}))


if __name__ == "__main__":
    main()
