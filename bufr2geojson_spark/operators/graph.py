"""Distributed graph analytics over entity-relation edge tables.

The co-location / contact graphs the trajectory operators produce
(``contact_events``, ``co_dwells``, shared-cell pairs) are graphs; this
module adds the two classic MapReduce graph kernels beyond the connected
components already in ``textops``:

* ``triangle_count`` — degree-ordered wedge counting (Suri &
  Vassilvitskii, WWW'11): orienting every edge from its lower-(degree,
  id) endpoint to the higher bounds wedge generation by O(m^{3/2})
  total work regardless of skew — the "curse of the last reducer" fix —
  while a naive orientation lets one hub node generate deg² wedges.
* ``pagerank`` — fixed-iteration PageRank in EXACT INTEGER fixed-point:
  ranks are scaled longs, per-edge contributions use integer floor
  division, and the damping step is integer (``15*S DIV 100 +
  85*sum DIV 100``), so every iteration is bit-identical under any
  partitioning, aggregation order, or engine — a DuckDB recursive CTE
  reproduces the ranks exactly. (Float PageRank sums in shuffle order
  and can never be compared value-for-value across engines.)

Both are pure DataFrame programs: self-joins keyed on vertex ids,
map-side-combinable aggregations, no driver-side state. No analogue in
the reference (`/root/reference/bufr2geojson/__init__.py` is a
single-station ETL).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bufr2geojson_spark.operators._iterate import (
    materialize_round,
    require_checkpoint_dir,
)


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set canonicalized to (u < v), self-loops dropped,
    duplicates removed."""
    u, v = F.col(src), F.col(dst)
    return (
        edges.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )


def degrees(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """(node, deg) over the canonical undirected edge set."""
    e = _canonical_edges(edges, src, dst)
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def triangle_count(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Per-node triangle counts (nodes in no triangle report 0).

    Degree-ordered orientation: edge {a,b} points a→b iff (deg(a),a) <
    (deg(b),b). Wedges are generated only at each triangle's LOWEST-
    ordered corner, so a hub of degree d in a skewed graph generates
    wedges only among its few higher-ordered neighbors — total wedge
    count is O(m^{3/2}) (Suri & Vassilvitskii) instead of Σ deg² —
    and each triangle is found exactly once (its two other edges close
    it in one direction only). Plan: two joins on vertex keys + an
    explode of the 3 corners + one groupBy; AQE broadcasts the degree
    table when small.
    """
    e = _canonical_edges(edges, src, dst)
    d = degrees(e)
    da = d.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    db = d.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient: lo -> hi by (deg, id)
    withdeg = e.join(da, "u").join(db, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )
    # wedges at the lowest corner: (lo, hi1 < hi2 by orientation order)
    a = oriented.select(F.col("lo"), F.col("hi").alias("x"))
    b = oriented.select(F.col("lo"), F.col("hi").alias("y"))
    wedges = a.join(b, "lo").filter(F.col("x") < F.col("y"))
    # close the wedge: the (x,y) edge exists in the canonical set
    closing = e.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("lo", "x", "y")
    corners = tri.select(
        F.explode(F.array("lo", "x", "y")).alias("node")
    )
    counts = corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return (
        d.select("node").join(counts, "node", "left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
    )


PR_SCALE = 1_000_000_000  # integer fixed-point: 1.0 rank == 1e9


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    src: str = "u",
    dst: str = "v",
    checkpoint_every: int = 4,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected graph (each edge walks
    both ways) in exact integer fixed-point: (node, rank_scaled) with
    rank 1.0 == ``PR_SCALE``.

    Update rule (all integer, bit-exact on any engine/partitioning):

        contrib(u→v) = r(u) DIV deg(u)
        r'(v) = (15 * PR_SCALE) DIV 100 + (85 * Σ contrib) DIV 100

    The graph is connected-or-not irrelevant: every node has deg >= 1 by
    construction (nodes come from edges), so there are no dangling
    nodes. Truncation loses < 1e-7 of mass per step — the price of
    cross-engine bit-equality (float PageRank depends on summation
    order and can never hash-match an oracle).

    Plan per iteration: ranks ⋈ out-edges (key u) → groupBy(v) with
    map-side partial sums — the classic two-shuffle PageRank round; the
    static degree table rides broadcast when small. The rank table is
    materialized every ``checkpoint_every`` rounds (0 disables) so the
    plan stays O(checkpoint_every) deep instead of a linear chain of
    ``iters`` join-agg rounds; materialization cannot move the result —
    the update is exact integer arithmetic, a pure function of the
    input. ``reliable_checkpoint=True`` routes that through HDFS-backed
    ``checkpoint()`` for lossy-executor clusters (operators/_iterate.py).
    """
    if reliable_checkpoint:
        require_checkpoint_dir(edges.sparkSession)
    e = _canonical_edges(edges, src, dst)
    # both directions: undirected walk
    dir_edges = (
        e.select(F.col("u").alias("s"), F.col("v").alias("t"))
        .unionAll(e.select(F.col("v").alias("s"), F.col("u").alias("t")))
    )
    deg = dir_edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = dir_edges.join(deg, "s")  # (s, t, deg)
    ranks = deg.select(
        F.col("s").alias("node"), F.lit(int(PR_SCALE)).alias("r")
    )
    base = int(15 * PR_SCALE) // 100
    for i in range(int(iters)):
        contribs = (
            out_edges.join(
                ranks.select(F.col("node").alias("s"), "r"), "s"
            )
            .select(
                F.col("t").alias("node"),
                F.expr("r DIV deg").alias("c"),
            )
        )
        ranks = contribs.groupBy("node").agg(
            (F.lit(base) + F.expr("85 * sum(c) DIV 100")).alias("r")
        )
        if checkpoint_every and (i + 1) % int(checkpoint_every) == 0 \
                and i + 1 < int(iters):
            ranks = materialize_round(ranks, reliable_checkpoint)
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def kcore(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 20,
    src: str = "u",
    dst: str = "v",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """The k-core: the maximal subgraph where every node has degree >= k
    — the standard dense-subgroup extraction on contact graphs. Returns
    (node, deg_in_core) for members of the core.

    Iterative peeling: drop every edge with an endpoint of current
    degree < k, repeat. Peeling is CONFLUENT (the k-core is unique), so
    early-exit on convergence and a fixed-round oracle agree on the
    final subgraph; ``max_rounds`` bounds the driver loop (each round
    strictly removes nodes, so rounds <= peeling depth — typically
    O(log n) on real graphs, n worst case for a path; raise it for
    pathological chains).

    Plan per round: one degree aggregation + one semi-join, both keyed
    on vertex ids, map-side combinable; the edge set only shrinks.
    ``reliable_checkpoint=True`` materializes rounds via HDFS-backed
    ``checkpoint()`` on real clusters (operators/_iterate.py).
    """
    if reliable_checkpoint:
        require_checkpoint_dir(edges.sparkSession)
    e = _canonical_edges(edges, src, dst)
    cur = (
        e.select(F.col("u").alias("s"), F.col("v").alias("t"))
        .unionAll(e.select(F.col("v").alias("s"), F.col("u").alias("t")))
    )
    n_prev = cur.count()
    for _ in range(int(max_rounds)):
        if n_prev == 0:
            break
        deg = cur.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        good = deg.filter(F.col("d") >= int(k)).select("s")
        cur = materialize_round(
            cur.join(good, "s", "left_semi")
            .join(good.withColumnRenamed("s", "t"), "t", "left_semi"),
            reliable_checkpoint,
        )
        n_now = cur.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return cur.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("deg_in_core")
    )


def common_neighbor_pairs(
    edges: DataFrame,
    min_common: int = 2,
    max_center_degree: int | None = None,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """Link prediction by common-neighbor counting: for every NON-adjacent
    pair {a, b} sharing at least ``min_common`` neighbors, emit
    (u, v, n_common, deg_u, deg_v, jaccard_e6) with u < v and jaccard =
    |N(u) ∩ N(v)| / |N(u) ∪ N(v)| in integer millionths (floor) so the
    result is bit-exact across engines — the classic candidate generator
    for edge recommendation on contact / co-location graphs.

    Plan: wedge enumeration at the shared neighbor (one self-join of the
    symmetrized adjacency keyed on the center vertex), map-side-combined
    groupBy on the candidate pair, then an anti-join against the existing
    edge set and a broadcast-able degree join. Cost is Σ_n C(deg(n), 2)
    — a hub of degree d contributes d² wedges, the "curse of the last
    reducer". ``max_center_degree`` is the published mitigation (drop
    super-hub centers before wedging; hubs connect everyone and carry no
    predictive signal), turning the bound into Σ min(deg, cap)² which is
    linear in m for fixed cap. Pass None only when the degree
    distribution is known to be flat.
    """
    e = _canonical_edges(edges, src, dst)
    sym = (
        e.select(F.col("u").alias("n"), F.col("v").alias("x"))
        .unionAll(e.select(F.col("v").alias("n"), F.col("u").alias("x")))
    )
    deg = sym.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    centers = sym.join(deg, "n")
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= int(max_center_degree))
    a = centers.select("n", F.col("x").alias("cu"))
    b = centers.select("n", F.col("x").alias("cv"))
    cand = (
        a.join(b, "n")
        .filter(F.col("cu") < F.col("cv"))
        .groupBy("cu", "cv")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= int(min_common))
        # keep only non-adjacent pairs: adjacent ones are not predictions
        .join(
            e.select(F.col("u").alias("cu"), F.col("v").alias("cv")),
            ["cu", "cv"],
            "left_anti",
        )
    )
    du = deg.select(F.col("n").alias("cu"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("n").alias("cv"), F.col("deg").alias("deg_v"))
    return (
        cand.join(du, "cu").join(dv, "cv")
        .select(
            F.col("cu").alias("u"),
            F.col("cv").alias("v"),
            "n_common",
            "deg_u",
            "deg_v",
            F.floor(
                F.col("n_common") * F.lit(1_000_000)
                / (F.col("deg_u") + F.col("deg_v") - F.col("n_common"))
            ).cast("long").alias("jaccard_e6"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 12,
    src: str = "u",
    dst: str = "v",
    node_col: str = "node",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Multi-source BFS on the undirected graph: for every node reachable
    within ``max_hops`` of ANY source, the exact shortest hop count —
    single-source shortest paths for unit weights, the reachability /
    blast-radius primitive on contact and co-location graphs.

    Frontier expansion: each round joins the CURRENT FRONTIER (only the
    nodes first reached last round — never the whole distance table)
    against the symmetrized edge list, anti-joins out already-settled
    nodes, and settles the rest at hop h. A node is settled the first
    time it is seen, which in BFS order IS its shortest distance, so no
    relaxation or re-visits happen — per round the shuffle is
    O(frontier-degree sum), and the loop runs min(eccentricity,
    max_hops) rounds. Round materialization truncates the per-round plan
    (``reliable_checkpoint=True`` for HDFS-backed ``checkpoint()`` on a
    real cluster — operators/_iterate.py). Rounds are inherently
    sequential (each needs the previous frontier), the same shape as the
    published Pregel/GraphX BFS.

    Returns (node, hops), hops ∈ [0, max_hops]; unreachable-within-bound
    nodes are absent.
    """
    if reliable_checkpoint:
        require_checkpoint_dir(edges.sparkSession)
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    settled = materialize_round(
        sources.select(
            F.col(sources.columns[0]).alias("node"), F.lit(0).alias("hops")
        ).distinct(),
        reliable_checkpoint,
    )
    frontier = settled.select("node")
    for h in range(1, int(max_hops) + 1):
        nxt = materialize_round(
            frontier.join(sym, frontier["node"] == sym["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h)),
            reliable_checkpoint,
        )
        if nxt.isEmpty():
            break
        settled = materialize_round(
            settled.unionAll(nxt), reliable_checkpoint
        )
        frontier = nxt.select("node")
    return settled.withColumnRenamed("node", node_col)


def sssp_weighted(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 30,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    node_col: str = "node",
    reliable_checkpoint: bool = False,
    strict: bool = False,
) -> DataFrame:
    """Multi-source weighted shortest paths (non-negative INTEGER
    weights) on the undirected graph — the weighted generalization of
    ``bfs_hops``: routing cost over a road/route network, weighted
    blast-radius.

    Distributed Bellman-Ford with a delta-frontier: each round relaxes
    only edges out of nodes whose distance IMPROVED last round (never
    the whole distance table), takes the map-side-combinable min per
    target, and joins against current distances to keep genuine
    improvements. With non-negative integer weights the fixpoint is
    unique and every intermediate distance is exact — bit-equal to a
    recursive-CTE oracle under any partitioning. Rounds are bounded by
    the longest shortest-path hop count (<= V worst case; ``max_rounds``
    caps the driver loop, raise for high-diameter graphs). If the bound
    is hit while the frontier is still non-empty the returned distances
    are OVERESTIMATES for the unsettled region — the loop warns (or
    raises with ``strict=True``) instead of returning them silently.
    Round materialization truncates per-round lineage
    (``reliable_checkpoint=True`` for HDFS-backed ``checkpoint()`` on a
    real cluster — operators/_iterate.py). Returns (node, dist).
    """
    if reliable_checkpoint:
        require_checkpoint_dir(edges.sparkSession)
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"),
                     F.col(weight).alias("w"))
        .unionAll(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b"),
                               F.col(weight).alias("w")))
    )
    dist = materialize_round(
        sources.select(
            F.col(sources.columns[0]).alias("node"),
            F.lit(0).cast("long").alias("dist"),
        ).distinct(),
        reliable_checkpoint,
    )
    frontier = dist
    converged = False
    for _ in range(int(max_rounds)):
        cand = (
            frontier.join(sym, frontier["node"] == sym["a"])
            .select(F.col("b").alias("node"),
                    (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        improved = materialize_round(
            cand.join(dist, "node", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("node", F.col("nd").alias("dist")),
            reliable_checkpoint,
        )
        if improved.isEmpty():
            converged = True
            break
        dist = materialize_round(
            dist.join(improved.select("node"), "node", "left_anti")
            .unionAll(improved),
            reliable_checkpoint,
        )
        frontier = improved
    if not converged:
        msg = (
            f"sssp_weighted exhausted max_rounds={max_rounds} with a "
            "non-empty frontier: returned distances are overestimates for "
            "the unsettled region — raise max_rounds for this graph's "
            "diameter"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return dist.withColumnRenamed("node", node_col)
