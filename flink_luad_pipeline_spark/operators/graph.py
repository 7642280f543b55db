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


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank with a fixed iteration count.

    The second iterative operator next to connected_components, same
    driver-loop shape: rank_{i+1}(v) = (1-d)/N + d * Σ_{u→v} rank_i(u)
    / outdeg(u), dangling mass not redistributed (documented choice —
    keeps the recurrence a pure join+agg, exactly reproducible in SQL).

    Scale: per iteration one shuffle for the (src-keyed) contribution
    join and one for the dst-keyed sum; edges and out-degrees are
    computed once and localCheckpoint'd. Lineage is truncated per
    iteration, so 10 or 100 iterations hold the same plan size.

    Returns ``DataFrame[vertex, rank]``.
    """
    v_col = vertices.columns[0]
    nodes = vertices.select(F.col(v_col).alias("vertex")).distinct().localCheckpoint()
    n_total = nodes.count()
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # pre-divide later ranks by out-degree: join edges with degrees once
    e_deg = e.join(outdeg, "src").localCheckpoint()

    base = F.lit((1.0 - damping) / n_total)
    ranks = nodes.select("vertex", F.lit(1.0 / n_total).alias("rank"))
    for _ in range(iterations):
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.vertex)
            .select(
                F.col("dst").alias("vertex"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("vertex")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(contrib, "vertex", "left")
            .select(
                "vertex",
                (base + F.lit(damping) * F.coalesce("mass", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
    return ranks


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle counts on an undirected graph.

    Standard oriented-wedge enumeration: canonicalize every edge to
    (lo, hi), dedup, then wedge-join (lo→mid→hi) and close each wedge
    against the edge set. Orientation means each triangle {u<v<w} is
    enumerated exactly once as u→v→w, so no over-count correction is
    needed; the per-vertex attribution explodes each triangle to its
    three corners and group-counts.

    Scale: three equi-joins on vertex keys — no cartesian. Orienting by
    vertex id is deterministic and SQL-reproducible; at 100 TB with
    power-law degrees, orient by (degree, id) instead so high-degree
    hubs become wedge *endpoints* rather than centers, which bounds
    per-key wedge fan-out (the classic arboricity argument) — same
    plan, one extra degree join.

    Returns ``DataFrame[vertex, n_triangles]`` (vertices in ≥1 triangle).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    ab = e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    bc = e.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    ac = e.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    tri = ab.join(bc, "v").join(ac, ["u", "w"])
    corners = tri.select(
        F.explode(F.array("u", "v", "w")).alias("vertex")
    )
    return corners.groupBy("vertex").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
