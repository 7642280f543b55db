#!/usr/bin/env python
"""Sub-step timing of the trained-ANN build path (guide §1) —
where do ll105/ll107/ll110/ss23's seconds actually go?"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ["SPARK_GRAFT_NO_CACHE"] = "1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from flink_luad_pipeline_spark import catalog
    from flink_luad_pipeline_spark.operators import clustering, similarity
    from flink_luad_pipeline_spark.plans.relational_queries import sink_path
    from flink_luad_pipeline_spark.session import get_spark

    spark = get_spark("profile_ann")
    emb = catalog.load(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"embeddings rows: {n}")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)

    def t(label, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)
        return r

    # warm
    emb.toPandas()

    cents = t("kmeans_fit(base,k=8,iters=3)", lambda: clustering.kmeans_fit(
        base, k=8, iters=3
    ).select(F.col("cid").alias("centroid_id"), F.col("cv").alias("centv")))

    frames = t("index_frames(lazy-build)", lambda: (
        similarity.residual_ann_index_frames(
            base, centroids=cents, train_iters=2, train_mod=4
        )
    ))
    root = sink_path("prof_ann_index", sf_dir)

    def persist_all():
        for name_, df_ in frames.items():
            df_.write.mode("overwrite").parquet(f"{root}/{name_}.parquet")
    t("persist 4 frames (incl. full encode)", persist_all)
    index = {
        name_: spark.read.parquet(f"{root}/{name_}.parquet")
        for name_ in frames
    }
    dc = t("encode_delta (lazy)", lambda: similarity.residual_ann_index_encode_delta(
        index, delta, train_iters=2, train_mod=4
    ))
    t("delta write", lambda: dc.write.mode("overwrite").parquet(
        f"{root}/codes_d1.parquet"))
    folded = dict(index, codes=spark.read.parquet(
        f"{root}/codes.parquet", f"{root}/codes_d1.parquet"))
    qv = emb.where(F.col("vec_id") < 5)
    t("probe topk", lambda: similarity.residual_ann_index_topk(
        qv, folded, k=10, train_iters=2, train_mod=4).toPandas())
    t("recall_probe (exact+approx)", lambda: similarity.ann_index_recall_probe(
        qv, emb, folded, k=10, train_iters=2, train_mod=4).toPandas())
    t("exact brute_force alone", lambda: similarity.brute_force_topk(
        qv, emb, k=10).toPandas())
    t("kmeans_fit FULL corpus (retrain half)", lambda: clustering.kmeans_fit(
        emb, k=8, iters=3).collect())


if __name__ == "__main__":
    main()
