"""Connected components — the reference's delta iteration (I1/C3).

Reference: ``vertices.iterateDelta(vertices, 100, Array("_1"))`` running
min-label propagation (PreProcess.scala:179-197, itself adapted from
Flink's connected-components example; max 100 supersteps per Report.pdf
p.3 §3.3.2). Spark has no Catalyst iteration primitive, so this is a
driver-side loop over DataFrames that preserves the delta-iteration
*incrementality*: only vertices whose label changed last round (the
workset) send messages, so per-iteration work shrinks as components
converge — same asymptotics as Flink's workset/solution-set plan.

Scale notes:
- ``localCheckpoint`` every superstep truncates lineage; without it the
  plan doubles per iteration and the job dies on plan size long before
  data size matters.
- Iterations = graph diameter. For social-graph-like data at 100 TB,
  swap in the large-star/small-star algorithm (O(log n) rounds) behind
  the same signature; co-expression graphs (the reference workload) have
  tiny diameter so min-label is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Label every vertex with the min vertex id in its component.

    ``edges`` is treated as undirected (symmetrized here, matching
    PreProcess.scala:168). ``vertices`` (single column ``vertex``)
    defaults to the edge endpoints; pass it explicitly to include
    isolated vertices (the reference seeds from the full probe set,
    PreProcess.scala:171).

    Returns ``DataFrame[vertex, component]``.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("w")))
        .distinct()
        # materialized once: every superstep joins against sym, and
        # without this the union+distinct (a full shuffle) re-executes
        # per iteration
        .localCheckpoint()
    )
    if vertices is None:
        vertices = sym.select(F.col("u").alias("vertex")).distinct()
    else:
        vertices = vertices.select(F.col(vertices.columns[0]).alias("vertex")).distinct()

    # solution set: (vertex, component); workset: vertices changed last round
    labels = vertices.select("vertex", F.col("vertex").alias("component"))
    labels = labels.localCheckpoint()
    workset = labels

    for _ in range(max_iterations):
        # J1: propagate workset labels to neighbors
        msgs = workset.join(sym, workset.vertex == sym.u).select(
            F.col("w").alias("vertex"), "component"
        )
        # A5: min candidate label per neighbor
        cand = msgs.groupBy("vertex").agg(F.min("component").alias("cand"))
        # J2 fused with the solution-set update: one left join computes
        # both the new label (min of old and candidate) and the changed
        # flag, so each superstep runs TWO jobs (checkpoint + isEmpty)
        # instead of three — at small scale the per-job latency, not the
        # data, dominates superstep cost.
        improved = F.col("cand") < F.col("component")
        labels = (
            labels.join(cand, "vertex", "left")
            .select(
                "vertex",
                F.when(improved, F.col("cand"))
                .otherwise(F.col("component"))
                .alias("component"),
                F.coalesce(improved, F.lit(False)).alias("changed"),
            )
            .localCheckpoint()  # truncate lineage per superstep
        )
        workset = labels.where("changed").select("vertex", "component")
        labels = labels.select("vertex", "component")
        if workset.isEmpty():  # cheap: scans the checkpointed RDD
            break
    return labels


def component_representatives(components: DataFrame) -> DataFrame:
    """A6 — one vertex per component. Reference picks the arbitrary
    first group member (PreProcess.scala:203-209); we pick min vertex —
    deterministic, same intent (Report.pdf p.4 §4.2)."""
    return components.groupBy("component").agg(
        F.min("vertex").alias("representative")
    )
