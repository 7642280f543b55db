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

import warnings

from pyspark.sql import DataFrame, Window
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


def connected_components_star(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 50,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the high-diameter scale path promised in the module docstring.

    Where min-label propagation needs diameter-many rounds (a 100-hop
    chain costs 100 supersteps), this converges in O(log n) rounds for
    ANY graph shape, each round two grouped-min joins:

    - large-star: every node points its larger neighbors at the
      minimum of its neighborhood (incl. itself);
    - small-star: every node re-points its smaller-or-equal neighbors
      (and itself) at that minimum.

    Both are (min-per-key + equi-join) — shuffle-partitionable, no
    driver data. Fixed point: every component is a star rooted at its
    minimum id. Convergence is detected exactly: equal edge counts plus
    an empty one-sided ``exceptAll`` between the two checkpointed
    canonical edge sets proves set equality (no hash-collision risk).

    Same contract as ``connected_components``: DataFrame[vertex,
    component], isolated vertices included via ``vertices``.
    """
    pairs = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    if vertices is None:
        all_vertices = (
            pairs.select(F.col("u").alias("vertex"))
            .union(pairs.select(F.col("v").alias("vertex")))
            .distinct()
        )
    else:
        all_vertices = vertices.select(
            F.col(vertices.columns[0]).alias("vertex")
        ).distinct()
    all_vertices = all_vertices.localCheckpoint()

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _mins(nbr: DataFrame) -> DataFrame:
        # m(u) = min over N(u) ∪ {u}
        return nbr.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    def _canon(e: DataFrame) -> DataFrame:
        return (
            e.where(F.col("u") != F.col("v"))
            .select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .distinct()
        )

    cur = _canon(pairs).localCheckpoint()
    for _ in range(max_rounds):
        prev = cur
        nbr = _sym(cur)
        mins = _mins(nbr)
        # large-star: larger neighbors -> neighborhood min
        large = _canon(
            nbr.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        nbr2 = _sym(large)
        mins2 = _mins(nbr2)
        # small-star: smaller-or-equal neighbors AND self -> min
        small = _canon(
            nbr2.where(F.col("v") <= F.col("u"))
            .join(mins2, "u")
            .select("v", "m")
            .union(mins2.select(F.col("u").alias("v"), F.col("m")))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        cur = small.localCheckpoint()
        # Exact stability check on the two materialized canonical edge
        # sets (both distinct()'d): equal counts + empty one-sided
        # difference <=> set equality. Two cheap jobs over checkpointed
        # data, and no checksum-collision early-termination risk.
        if cur.count() == prev.count() and prev.exceptAll(cur).isEmpty():
            break
    # fixed point: stars rooted at component minimum -> (root=u, member=v)
    labels = cur.select(
        F.col("v").alias("vertex"), F.col("u").alias("component")
    )
    return (
        all_vertices.join(labels, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("component", "vertex").alias("component"),
        )
    )


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


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_iterations: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Single-source(-set) unweighted shortest paths (BFS) — the
    distance-semiring sibling of min-label connected components: the
    per-superstep recurrence is min(dist) over (frontier ⋈ edges)+1
    instead of min(label), with the identical workset/solution-set
    driver loop (frontier = vertices whose distance improved, shrinking
    every round; localCheckpoint bounds lineage).

    ``sources`` (single column) start at distance 0. Unreached vertices
    are absent from the output (join back against a vertex table for
    NULL-distance semantics). Iterations = eccentricity of the source
    set, NOT graph size; for high-diameter graphs the same caveat as
    min-label applies.

    Returns ``DataFrame[vertex, dist]``.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("w")))
        .distinct()
        .localCheckpoint()
    )
    dist = (
        sources.select(F.col(sources.columns[0]).alias("vertex"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint()
    )
    frontier = dist
    for _ in range(max_iterations):
        cand = (
            frontier.join(sym, frontier.vertex == sym.u)
            .select(
                F.col("w").alias("vertex"),
                (F.col("dist") + F.lit(1)).alias("cand"),
            )
            .groupBy("vertex")
            .agg(F.min("cand").alias("cand"))
        )
        improved = F.col("cand") < F.coalesce(
            F.col("dist"), F.lit((1 << 62))
        )
        merged = (
            dist.join(cand, "vertex", "full_outer")
            .select(
                "vertex",
                F.when(improved, F.col("cand"))
                .otherwise(F.col("dist"))
                .alias("dist"),
                F.coalesce(improved, F.lit(False)).alias("changed"),
            )
            .localCheckpoint()
        )
        frontier = merged.where("changed").select("vertex", "dist")
        dist = merged.select("vertex", "dist")
        if frontier.isEmpty():
            break
    return dist


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (community detection): every
    vertex starts with its own id as label; each superstep, every
    vertex adopts the most frequent label among its neighbors, ties
    broken by the SMALLEST label. Fully deterministic — unlike
    textbook LPA (random order, random ties), which is the point:
    synchronous LPA can oscillate on 2-cycles and need not converge,
    so the contract is a FIXED number of supersteps, exactly what an
    unrolled SQL oracle can replay.

    Per superstep: one join (neighbor labels), one count aggregation,
    one argmax window — all keyed on vertex ids, every shuffle
    hash-partitioned; localCheckpoint bounds lineage like the other
    iterative operators. Vertices are the edge endpoints (an isolated
    vertex has no neighbors and no row here).

    Returns ``DataFrame[vertex, label]`` after ``iterations`` steps.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("w")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint()
    )
    rk_w = Window.partitionBy("vertex").orderBy(
        F.col("n").desc(), F.col("label")
    )
    for _ in range(iterations):
        nbr = sym.join(
            labels.withColumnRenamed("vertex", "w"), "w"
        ).select(F.col("u").alias("vertex"), "label")
        counts = nbr.groupBy("vertex", "label").agg(
            F.count(F.lit(1)).alias("n")
        )
        labels = (
            counts.withColumn("rk", F.row_number().over(rk_w))
            .where(F.col("rk") == 1)
            .select("vertex", "label")
            .localCheckpoint()
        )
    return labels


def core_numbers(
    edges: DataFrame,
    k_max: int = 3,
    max_rounds: int = 50,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition by iterative peeling: every edge endpoint
    gets its core number, capped at ``k_max`` (core = max k such that
    the vertex survives in the k-core, the maximal subgraph where every
    vertex has degree >= k).

    Completes the iterative-graph semiring family (CC min-label, BFS
    min-distance, PageRank weighted-sum, LPA argmax) with the
    *subgraph-fixpoint* shape: each peel round is one grouped degree
    count plus two left-semi joins that keep only edges whose BOTH
    endpoints still clear the bar — all vertex-keyed hash shuffles, no
    driver data beyond the convergence counter. Cores are nested, so
    the (k+1)-peel starts from the k-core edge set rather than the full
    graph; total work decreases monotonically with k.

    Convergence per k is exact and cheap: the edge set shrinks
    monotonically, so an unchanged count IS the fixed point (no
    set-difference pass needed, unlike star-CC where edges are
    rewritten rather than only deleted). ``localCheckpoint`` per round
    truncates lineage like the other loops.

    If a peel cascade is still shrinking after ``max_rounds`` rounds the
    k-level is taken from the truncated edge set, which can only
    OVER-credit core numbers (vertices that would eventually be peeled
    are kept); a ``RuntimeWarning`` is emitted so the caller can raise
    ``max_rounds`` (the worst-case cascade length is |V|, e.g. a path
    graph peeling one endpoint pair per round).

    Returns ``DataFrame[vertex, core]`` (BIGINT core, >= 1; isolated
    vertices have no edges and no row).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("w")))
        .where(F.col("u") != F.col("w"))
        .distinct()
        .localCheckpoint()
    )
    levels = sym.select(F.col("u").alias("vertex")).distinct().withColumn(
        "core", F.lit(1).cast("bigint")
    )
    cur, cur_count = sym, sym.count()
    for k in range(2, k_max + 1):
        for _ in range(max_rounds):
            keep = (
                cur.groupBy("u")
                .agg(F.count(F.lit(1)).alias("deg"))
                .where(F.col("deg") >= k)
                .select("u")
            )
            nxt = (
                cur.join(keep, "u", "left_semi")
                .join(keep.withColumnRenamed("u", "w"), "w", "left_semi")
                .select("u", "w")
                .localCheckpoint()
            )
            nxt_count = nxt.count()
            if nxt_count == cur_count:
                break
            cur, cur_count = nxt, nxt_count
            if cur_count == 0:
                break
        else:
            warnings.warn(
                f"core_numbers: {k}-core peel still shrinking after "
                f"max_rounds={max_rounds}; reported cores may be "
                "over-credited — raise max_rounds",
                RuntimeWarning,
                stacklevel=2,
            )
        if cur_count == 0:
            break
        levels = levels.union(
            cur.select(F.col("u").alias("vertex"))
            .distinct()
            .withColumn("core", F.lit(k).cast("bigint"))
        )
    return levels.groupBy("vertex").agg(F.max("core").alias("core"))


def weighted_shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_iterations: int = 100,
    src: str = "src",
    dst: str = "dst",
    weight: str = "wt",
) -> DataFrame:
    """Weighted single-source(-set) shortest paths — frontier-pruned
    Bellman-Ford, the weighted-distance semiring next to BFS's hop
    count: the recurrence is min(dist + edge weight) over
    (frontier ⋈ edges), and only vertices whose distance improved
    relax their edges next round. Non-negative weights required (the
    convergence bound is rounds <= longest shortest path in EDGES, and
    a negative cycle would never settle). Same workset/solution-set
    driver loop, localCheckpoint lineage bound, exact integer
    distances.

    Returns ``DataFrame[vertex, dist]`` (unreached vertices absent).
    """
    sym = (
        edges.select(
            F.col(src).alias("u"), F.col(dst).alias("w"), F.col(weight).alias("wt")
        )
        .union(
            edges.select(
                F.col(dst).alias("u"), F.col(src).alias("w"), F.col(weight).alias("wt")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    dist = (
        sources.select(F.col(sources.columns[0]).alias("vertex"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint()
    )
    frontier = dist
    for _ in range(max_iterations):
        cand = (
            frontier.join(sym, frontier.vertex == sym.u)
            .select(
                F.col("w").alias("vertex"),
                (F.col("dist") + F.col("wt")).alias("cand"),
            )
            .groupBy("vertex")
            .agg(F.min("cand").alias("cand"))
        )
        improved = F.col("cand") < F.coalesce(F.col("dist"), F.lit(1 << 62))
        merged = (
            dist.join(cand, "vertex", "full_outer")
            .select(
                "vertex",
                F.when(improved, F.col("cand"))
                .otherwise(F.col("dist"))
                .alias("dist"),
                F.coalesce(improved, F.lit(False)).alias("changed"),
            )
            .localCheckpoint()
        )
        frontier = merged.where("changed").select("vertex", "dist")
        dist = merged.select("vertex", "dist")
        if frontier.isEmpty():
            break
    else:
        warnings.warn(
            "weighted_shortest_paths: frontier still improving after "
            f"max_iterations={max_iterations}; distances may be stale "
            "upper bounds — raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return dist


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    steps: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic random walks — the graph-embedding training-data
    generator (DeepWalk/node2vec corpora): from every start vertex,
    take ``steps`` hops where hop i from vertex v picks neighbor number
    ``portable_hash40(walk_id:i:v) % degree(v)`` among the ascending-
    sorted neighbors. Hash-driven choice instead of an RNG for the same
    reason as the mixture sampler (ll35): the walk corpus is exactly
    reproducible by any engine, so the whole generator is value-
    checkable rather than rows-only.

    Per hop: one equi-join of the frontier against the ranked adjacency
    (precomputed once: row_number + degree over a single vertex-keyed
    shuffle, then localCheckpoint'd — the loop never re-sorts).
    Dead-ends (isolated starts) stop early and emit no further rows.

    Returns ``DataFrame[walk_id, step, vertex]`` — step 0 is the start.
    """
    from .dedup import portable_hash40

    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("w")))
        .where(F.col("u") != F.col("w"))
        .distinct()
    )
    rk_w = Window.partitionBy("u").orderBy("w")
    deg_w = Window.partitionBy("u")
    adj = (
        sym.withColumn("rk", F.row_number().over(rk_w))
        .withColumn("deg", F.count(F.lit(1)).over(deg_w))
        .localCheckpoint()
    )
    cur = (
        starts.select(F.col(starts.columns[0]).alias("walk_id"))
        .distinct()
        .select("walk_id", F.lit(0).alias("step"), F.col("walk_id").alias("vertex"))
        .localCheckpoint()
    )
    out = cur
    for i in range(1, steps + 1):
        pick = F.pmod(
            portable_hash40(
                F.concat_ws(
                    ":",
                    F.col("walk_id").cast("string"),
                    F.lit(str(i)),
                    F.col("vertex").cast("string"),
                )
            ),
            F.col("deg"),
        ) + 1
        cur = (
            cur.join(adj, cur.vertex == adj.u)
            .where(F.col("rk") == pick)
            .select(
                "walk_id",
                F.lit(i).alias("step"),
                F.col("w").alias("vertex"),
            )
            .localCheckpoint()
        )
        out = out.union(cur)
    return out.select(
        "walk_id", F.col("step").cast("bigint").alias("step"), "vertex"
    )


def two_hop_reach(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Distinct vertices within <= 2 hops of each vertex (self
    excluded) — the friend-of-friend reach metric behind audience
    estimation and graph-sampling fanout budgets, and the smallest
    member of the neighborhood-aggregation family (1 self-join, no
    iteration; contrast g4's frontier loop which answers the same
    question for unbounded depth).

    Dataflow: symmetrize + distinct once, then ONE vertex-keyed
    equi-self-join for the 2-hop closure, union the 1-hop edges,
    drop self-reaches, count distinct per vertex. Every shuffle is
    hash-partitioned on a vertex id. At 100 TB the self-join's output
    is Σ deg(v)² — the classic hub blowup — so a production run caps
    or samples hub adjacency first (the same df-cutoff idea as the
    shingle index); the operator itself stays shuffle-bounded.

    Returns ``DataFrame[vertex, reach]`` (BIGINT; isolated vertices
    have no edges and no row).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("w")))
        .where(F.col("u") != F.col("w"))
        .distinct()
    )
    hop2 = sym.join(
        sym.select(F.col("u").alias("w"), F.col("w").alias("x")), "w"
    ).select("u", F.col("x").alias("w"))
    return (
        sym.unionAll(hop2)
        .where(F.col("u") != F.col("w"))
        .distinct()
        .groupBy(F.col("u").alias("vertex"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("reach"))
    )


def personalized_pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    sources: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank: same power iteration as ``pagerank`` but
    the restart mass teleports to the SOURCE SET instead of uniformly —
    rank_{i+1}(v) = (1-d)·r(v) + d·Σ_{u→v} rank_i(u)/outdeg(u) with
    r(v) = 1/|S| for v ∈ S else 0 — the proximity-to-seed measure
    behind recommendation ("nodes relevant to THESE users"), trust
    propagation, and local community scoring. Dangling mass is not
    redistributed (same documented choice as g1: keeps the recurrence
    a pure join+agg a SQL oracle can replay exactly).

    Same scale shape as g1: restart vector built once (a broadcast-able
    |S|-row table), two vertex-keyed shuffles per iteration, lineage
    truncated per iteration.

    Returns ``DataFrame[vertex, rank]`` (restart-set vertices outside
    ``vertices`` are ignored).
    """
    v_col = vertices.columns[0]
    nodes = (
        vertices.select(F.col(v_col).alias("vertex")).distinct().localCheckpoint()
    )
    s_col = sources.columns[0]
    seeds = (
        sources.select(F.col(s_col).alias("vertex"))
        .distinct()
        .join(nodes, "vertex", "left_semi")
        .localCheckpoint()
    )
    n_seeds = seeds.count()
    if n_seeds == 0:
        raise ValueError(
            "personalized_pagerank: no seeds overlap the vertex set —"
            " the restart distribution would be undefined (ADVICE r4)"
        )
    restart = nodes.join(
        seeds.withColumn("r", F.lit(1.0 / n_seeds)), "vertex", "left"
    ).select("vertex", F.coalesce("r", F.lit(0.0)).alias("r")).localCheckpoint()

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(outdeg, "src").localCheckpoint()

    ranks = restart.select("vertex", F.col("r").alias("rank"))
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
            restart.join(contrib, "vertex", "left")
            .select(
                "vertex",
                (
                    F.lit(1.0 - damping) * F.col("r")
                    + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """Strongly connected components by transitive-closure intersection:
    compute the reachability closure R (iterated relational join to a
    fixpoint — the driver-loop/localCheckpoint contract of the other
    graph operators), then u,v share an SCC iff (u,v) AND (v,u) are in
    R; scc_id = min mutual-reachable vertex.

    Scale contract — this is the DOMAIN-GRAPH tier, deliberately: the
    closure is O(V·E) rows, so it is the right tool when the vertex
    set is a small derived domain (event types, categories, languages,
    shard labels) distilled from a corpus-scale table — the distill
    step (window + distinct) is what touches 100 TB, not the closure.
    For corpus-scale vertex sets an FW-BW decomposition replaces this;
    the closure tier stays because it is exact, oracle-replayable
    (WITH RECURSIVE twin), and converges in diameter rounds with
    doubling — each round joins R to itself, so round k covers paths
    of length 2^k.

    Returns (vertex, scc_id, scc_size) for every vertex appearing in
    the edge set.
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).distinct().localCheckpoint(eager=True)
    verts = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    r = e
    n = r.count()
    for i in range(max_rounds):
        # path doubling: R <- R ∪ (R ⋈ R), diameter halves per round
        grown = (
            r.unionAll(
                r.alias("a")
                .join(r.alias("b"), F.col("a.v") == F.col("b.u"))
                .select(F.col("a.u").alias("u"), F.col("b.v").alias("v"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        m = grown.count()
        r = grown
        if m == n:
            break
        n = m
    else:
        warnings.warn(
            "strongly_connected_components: closure not at fixpoint after"
            f" max_rounds={max_rounds} doubling rounds (graph diameter"
            " > 2^max_rounds?) — results may split SCCs",
            RuntimeWarning,
            stacklevel=2,
        )
    mutual = (
        r.alias("f")
        .join(
            r.alias("g"),
            (F.col("f.u") == F.col("g.v")) & (F.col("f.v") == F.col("g.u")),
        )
        .select(F.col("f.u").alias("x"), F.col("f.v").alias("y"))
    )
    # every vertex is mutually reachable with itself
    mutual = mutual.unionAll(
        verts.select(F.col("x"), F.col("x").alias("y"))
    ).distinct()
    comp = mutual.groupBy("x").agg(F.min("y").alias("scc_id"))
    sizes = comp.groupBy("scc_id").agg(F.count(F.lit(1)).alias("scc_size"))
    return comp.join(sizes, "scc_id").select(
        F.col("x").alias("vertex"), "scc_id", "scc_size"
    )


def harmonic_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """Directed harmonic centrality: for every vertex u,
    H(u) = Σ_{v reachable, v≠u} 1/d(u, v) with d = BFS hop distance —
    the centrality that stays defined on disconnected graphs (closeness
    blows up there), answering "which state is nearest to everything
    else" on a transition graph.

    Distances by iterated min-plus relaxation over the edge relation
    (D ← min(D, D ⋈ E + 1)) to a fixpoint — the driver-loop /
    localCheckpoint contract of the other graph operators; round k
    covers paths of length k+1, so rounds = diameter. Same DOMAIN-GRAPH
    scale contract as strongly_connected_components: the closure is
    O(V·E) rows, the right tool when vertices are a small derived
    domain (event types, categories) distilled from the corpus-scale
    table — the distill pass is what touches 100 TB, never this.

    Per-pair terms 1/d are quantized to DECIMAL(18,9) before the sum
    (the c6/c7 exact-sum discipline) so H is row-order-free and
    oracle-exact. Returns (vertex, n_reachable, harmonic) for every
    vertex in the edge set; vertices reaching nothing score 0.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col(src) != F.col(dst))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    d = e.select("u", "v", F.lit(1).alias("d"))
    n = d.count()
    stable = False
    for _ in range(max_rounds):
        grown = (
            d.unionAll(
                d.alias("a")
                .join(e.alias("b"), F.col("a.v") == F.col("b.u"))
                .where(F.col("a.u") != F.col("b.v"))
                .select(
                    F.col("a.u").alias("u"),
                    F.col("b.v").alias("v"),
                    (F.col("a.d") + F.lit(1)).alias("d"),
                )
            )
            .groupBy("u", "v")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
        m = grown.count()
        stable = (
            m == n
            and grown.join(
                d, ["u", "v", "d"], "left_anti"
            ).isEmpty()
        )
        d = grown
        n = m
        if stable:
            break
    if not stable:
        # a hop diameter > max_rounds+1 would silently undercount
        # n_reachable / deflate the scores — fail loudly instead, the
        # same discipline as the dedup hasher-mismatch guard (ADVICE r6)
        raise RuntimeError(
            "harmonic_centrality: distance relaxation did not reach a "
            f"fixpoint within max_rounds={max_rounds} (graph hop "
            "diameter exceeds the round budget); raise max_rounds"
        )
    terms = d.select(
        "u",
        (F.lit(1.0) / F.col("d").cast("double"))
        .cast("decimal(18,9)")
        .alias("t"),
    )
    h = terms.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reachable"),
        F.round(F.sum("t").cast("double"), 6).alias("harmonic"),
    )
    return verts.join(h, verts["x"] == h["u"], "left").select(
        F.col("x").alias("vertex"),
        F.coalesce("n_reachable", F.lit(0)).cast("bigint").alias(
            "n_reachable"
        ),
        F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
    )


def component_bridges(
    cross_pairs: DataFrame,
    base_labels: DataFrame,
    delta_col: str = "doc_id",
    base_col: str = "base_id",
) -> DataFrame:
    """BRIDGE DETECTOR for incremental curation (VERDICT r9 item 3):
    per delta document, how many DISTINCT base components its base-side
    near-dup neighbors span. ``>= 2`` is the production trigger ll100's
    incremental contract documents but until now nothing emitted — a
    delta doc adjacent to two base components means absorbing it would
    MERGE components the frozen base dedup decided independently, so
    the frozen verdicts are no longer what a from-scratch run would
    produce and the affected slice must be re-curated (the
    incremental path never retro-edits state; it detects and escalates).

    Inputs: ``cross_pairs`` — the delta→base rows of the incremental
    pair list (``minhash_incremental_pairs`` output filtered to base
    neighbors), columns (delta_col, base_col); ``base_labels`` — the
    day-0 component labels (vertex, component) over the base near-dup
    graph (``connected_components`` output, a persistable day-0
    artifact like ll63's band index). Base docs in no base-side pair
    are singleton components — the left join + coalesce(component,
    base_id) gives them their own id, so they count correctly without
    materializing singleton labels.

    Plan shape at 100 TB: one shuffle equi-join of the (already
    candidate-bounded) pair list against the doc-keyed label table,
    then a partial-aggregated count-distinct keyed by delta doc —
    no corpus-sized pass, no pair×pair work.

    Returns (doc_id, n_base_components, is_bridge) for every delta doc
    with at least one base neighbor.
    """
    lab = base_labels.select(
        F.col(base_labels.columns[0]).alias("_v"),
        F.col(base_labels.columns[1]).alias("_comp"),
    )
    joined = cross_pairs.select(
        F.col(delta_col).alias("doc_id"), F.col(base_col).alias("_b")
    ).join(lab, F.col("_b") == F.col("_v"), "left")
    agg = joined.groupBy("doc_id").agg(
        F.countDistinct(F.coalesce("_comp", "_b"))
        .cast("bigint")
        .alias("n_base_components")
    )
    return agg.select(
        "doc_id",
        "n_base_components",
        (F.col("n_base_components") >= 2).alias("is_bridge"),
    )


def recurate_bridged_components(
    base_pairs: DataFrame,
    base_labels: DataFrame,
    cross_pairs: DataFrame,
    delta_pairs: DataFrame,
) -> DataFrame:
    """BRIDGE-TRIGGERED RE-CURATION (VERDICT r10 item 7 — the action
    half of ``component_bridges``' detect→escalate loop): recompute
    the near-dup verdicts of every base component a day-N delta TOUCHES
    by running connected components from scratch over the touched
    slice's full union subgraph, and emit the corrected base verdicts.
    The incremental day-N path (ll100) never retro-edits base state —
    correct while no delta doc bridges two base components, but a
    bridge MERGES components the frozen base dedup sentenced
    independently: from-scratch over the union keeps only ONE of the
    two day-0 keepers, while the frozen state keeps both. Re-curation
    is the documented repair: scoped from-scratch, never an in-place
    patch.

    The slice is CLOSED under union-graph connectivity, so the scoped
    labels equal the full from-scratch union labels on every emitted
    doc (the ll100 equality device, scoped — pinned in tests):
      - base-base edges leaving a touched component cannot exist (they
        would have merged the components on day 0);
      - any union path exits base only through a cross edge, whose
        delta endpoint is linked — and a linked delta doc's ENTIRE
        delta-delta component is in the slice, so pure-delta detours
        re-enter base only through cross edges also in the slice.

    Inputs (all already-computed day-0/day-N artifacts — nothing here
    re-reads text): ``base_pairs`` (doc_a, doc_b) day-0 base pair
    list (persistable next to the band index), ``base_labels``
    (vertex, component) day-0 CC labels, ``cross_pairs``
    (doc_id=delta, base_id) the day-N probe's delta→base rows,
    ``delta_pairs`` (doc_a, doc_b) the day-N delta-delta rows.

    Plan shape at 100 TB: everything is keyed equi-joins on the
    already-bounded pair lists plus one CC loop over the touched
    slice — O(touched + delta) per day, never O(base). Re-curating
    every TOUCHED component (not only detected bridges) costs the
    same order and makes the output a complete audit table: a row per
    touched base doc with (component_day0, component_recurated,
    kept_day0, kept_recurated) — bridged components are exactly the
    rows where the two labels differ.

    Returns (doc_id, component_day0, component_recurated, kept_day0,
    kept_recurated) for every base doc in a touched component."""
    lab = base_labels.select(
        F.col(base_labels.columns[0]).alias("b_v"),
        F.col(base_labels.columns[1]).alias("b_comp"),
    )
    cross = cross_pairs.select(
        F.col("doc_id").alias("d_id"), F.col("base_id").alias("b_id")
    )
    # touched components: day-0 label of every cross edge's base
    # endpoint (singletons label themselves — the component_bridges
    # convention)
    touched = (
        cross.join(lab, F.col("b_id") == F.col("b_v"), "left")
        .select(F.coalesce("b_comp", "b_id").alias("comp"))
        .distinct()
    )
    # touched base docs: labeled members of touched components, plus
    # cross-edge singletons (no day-0 pair, hence no label row)
    tdocs = (
        lab.join(touched, F.col("b_comp") == F.col("comp"), "left_semi")
        .select(F.col("b_v").alias("doc_id"), F.col("b_comp").alias("comp0"))
        .unionByName(
            cross.select(F.col("b_id").alias("doc_id"))
            .distinct()
            .join(lab, F.col("doc_id") == F.col("b_v"), "left_anti")
            .select("doc_id", F.col("doc_id").alias("comp0"))
        )
    )
    # slice edges — base-base edges inside touched components ...
    bedge = (
        base_pairs.select("doc_a", "doc_b")
        .join(lab, F.col("doc_a") == F.col("b_v"))
        .join(touched, F.col("b_comp") == F.col("comp"), "left_semi")
        .select("doc_a", "doc_b")
    )
    # ... every cross edge (its base endpoint is touched by
    # definition) ...
    xedge = cross.select(
        F.col("b_id").alias("doc_a"), F.col("d_id").alias("doc_b")
    )
    # ... and the delta-delta edges of every LINKED delta component
    # (whole components, so pure-delta detours stay inside the slice)
    dd_cc = connected_components(delta_pairs, src="doc_a", dst="doc_b")
    linked = cross.select(F.col("d_id").alias("vertex")).distinct()
    slice_comps = (
        dd_cc.join(linked, "vertex").select("component").distinct()
    )
    slice_v = (
        dd_cc.join(slice_comps, "component", "left_semi")
        .select(F.col("vertex").alias("doc_a"))
    )
    dedge = delta_pairs.select("doc_a", "doc_b").join(
        slice_v, "doc_a", "left_semi"
    )
    merged = connected_components(
        bedge.unionByName(xedge).unionByName(dedge),
        src="doc_a",
        dst="doc_b",
    )
    return (
        tdocs.join(merged, tdocs["doc_id"] == merged["vertex"])
        .select(
            "doc_id",
            F.col("comp0").cast("bigint").alias("component_day0"),
            F.col("component").cast("bigint").alias("component_recurated"),
            (F.col("doc_id") == F.col("comp0")).alias("kept_day0"),
            (F.col("doc_id") == F.col("component")).alias("kept_recurated"),
        )
    )
