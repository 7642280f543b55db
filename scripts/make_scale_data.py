#!/usr/bin/env python
"""Materialize a 10x replica of /root/testdata/sf0.1 for scale probing.

The driver ships sf{0.001,0.01,0.1}; proving the "would this plan
survive a 10x scale-up" claims empirically needs an sf1-equivalent
input. This derives one FROM the driver's own sf0.1 tables (no new
synthesis): each fact/dim table is the union of 10 key-shifted copies,
with every foreign key shifted by the same stride so referential
integrity — and therefore join selectivity per key — is preserved
exactly. Dimension tables with enumerated domains (region, nation) are
kept as-is so group-by cardinalities on their attributes stay fixed,
matching how TPC-H itself scales.

Per-key group sizes stay constant (keys are disjoint across copies);
global counts grow 10x — the same shape a real corpus 10x grows.

Usage: python scripts/make_scale_data.py [out_dir]   (default
/tmp/spark_graft_sf1). Writes one parquet dir per table; bench then
runs with SPARK_GRAFT_SF_DIR=<out_dir>.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
COPIES = 10
STRIDE = 10_000_000  # larger than any sf0.1 key domain

# key columns to shift per table; non-key columns copied verbatim
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]


def materialize(
    spark,
    out: str,
    src: str = SRC,
    copies_n: int = COPIES,
    stride: int = STRIDE,
    tag: str = "r",
) -> None:
    """Write the ``copies_n``x replica tables under ``out`` using an
    existing session (bench.py calls this in-process to build its sf1
    input). ``src``/``stride``/``tag`` generalize the derivation so a
    second decade can be stacked on top of a replica (sf1 -> sf10:
    src=<sf1 dir>, stride larger than the sf1 key domain, a distinct
    ``tag`` so re-tagged words stay globally unique)."""
    from flink_luad_pipeline_spark.catalog import load

    os.makedirs(out, exist_ok=True)
    for table in VERBATIM:
        load(spark, src, table).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        print(f"{table}: copied")
    for table, keys in SHIFT.items():
        df = load(spark, src, table)
        copies = []
        for i in range(copies_n):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * stride))
            if table == "documents" and i > 0:
                # Replica texts must NOT be near-duplicates of each
                # other (a real 10x corpus has 10x distinct documents,
                # not 10 copies) — identical texts would inflate dedup
                # pair counts quadratically, measuring a replication
                # artifact instead of the operator. Tagging every word
                # leaves zero shared shingles across replicas while
                # keeping each replica's internal dup structure intact.
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"{tag}{i}$1")
                ).withColumn("n_chars", F.length("text"))
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionAll(c)
        scaled.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        n = spark.read.parquet(f"{out}/{table}.parquet").count()
        print(f"{table}: {n} rows")
    print(f"done -> {out}")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    from flink_luad_pipeline_spark.session import get_spark

    materialize(get_spark("make_scale_data"), out)


if __name__ == "__main__":
    main()
