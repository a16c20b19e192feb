"""Iterative graph algorithms over the triple/adjacency tables.

The reference stops at lookups and BGP matching; a KG at 100 TB also
needs whole-graph analytics — node importance for entity ranking and
bounded neighborhood expansion for context assembly.  Both are built as
DataFrame-iterative plans (joins + aggregations per round, lineage
truncated with ``localCheckpoint`` like ``kg.canonicalize``'s connected
components), no RDD, no driver-side row loops.

Determinism note: PageRank is computed in FIXED-POINT INTEGER arithmetic
(ranks in units of 1e-9, integer ``div`` for the per-edge split).  Float
PageRank is not reproducible across engines or even across partitionings
(``sum`` fold order), which would break the repo-wide value-hash oracle
discipline; the integer variant is bit-identical everywhere at the cost
of ≤1e-9 per-edge rounding — document it, don't paper over it.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000_000  # rank fixed-point unit = 1e-9


def _nodes(edges: DataFrame) -> DataFrame:
    return (edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct())


def pagerank(edges: DataFrame, iterations: int = 10,
             damping_pct: int = 85,
             checkpoint_every: int = 4) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list
    (columns ``src``, ``dst``; parallel edges count once each).

    Per iteration: ``rank' = (1-d)*SCALE + Σ_in (rank*d) div outdeg``
    with everything in BIGINT (``d`` as the integer percentage
    ``damping_pct``).  Dangling nodes (no out-edges) keep contributing
    nothing — the plain "mass leaks" variant; ranks are importance
    ORDER-statistics here, not a normalized distribution.

    Scale shape: one shuffle per iteration — contributions re-key the
    rank relation from ``node`` to ``dst`` (the aggregation is partial /
    map-side combined); the edge relation with its precomputed
    ``outdeg`` is computed once, cached, and reused every round, so the
    per-iteration cost is O(edges) shuffle of (dst, contrib) LONG pairs
    only, independent of iteration count.  Lineage is truncated every
    ``checkpoint_every`` rounds (localCheckpoint, same policy as
    ``kg/canonicalize.py::connected_components``) so the plan does not
    grow unboundedly with iterations.

    Returns ``(node, rank)`` with rank in SCALE units (BIGINT, exact).
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    out = (edges.groupBy("src").agg(F.count("*").alias("outdeg")))
    fan = (edges.join(out, "src")
           .select("src", "dst", "outdeg")
           .persist())
    nodes = _nodes(edges).persist()
    base = F.lit((100 - damping_pct) * SCALE // 100).cast("long")

    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for i in range(iterations):
        contribs = (
            fan.join(ranks, fan["src"] == ranks["node"])
            .select(F.col("dst"),
                    F.expr("(rank * %d) div (100 * outdeg)" % damping_pct)
                    .cast("long").alias("contrib"))
            .groupBy("dst").agg(F.sum("contrib").alias("inflow")))
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(F.col("node"),
                    (base + F.coalesce(F.col("inflow"), F.lit(0)))
                    .cast("long").alias("rank")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def k_hop(edges: DataFrame, seeds: DataFrame, k: int,
          direction: str = "out") -> DataFrame:
    """Bounded BFS: every node reachable from ``seeds`` within ``k``
    hops, with its minimum hop distance (seeds themselves at hop 0).

    ``seeds``: one-column DataFrame ``node``.  ``direction``: ``out``
    follows src->dst, ``in`` follows dst->src, ``both`` follows either.

    Scale shape: per round, the FRONTIER (only the nodes newly reached
    last round — not the whole visited set) joins the edge relation and
    anti-joins the visited set; frontier size is bounded by the k-hop
    ball, so cost tracks result size, not graph size.  The visited set
    is localCheckpoint-ed each round to keep lineage flat.  k is a small
    constant (context assembly uses 2-3), so the loop is bounded.
    """
    if direction == "out":
        step = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    elif direction == "in":
        step = edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    elif direction == "both":
        step = (edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
                .unionByName(
                    edges.select(F.col("dst").alias("a"),
                                 F.col("src").alias("b"))))
    else:
        raise ValueError("direction must be out/in/both")
    step = step.distinct().persist()

    visited = seeds.select(F.col("node"),
                           F.lit(0).cast("int").alias("hops")).distinct()
    frontier = visited.select("node")
    for hop in range(1, k + 1):
        reached = (
            step.join(frontier, step["a"] == frontier["node"])
            .select(F.col("b").alias("node")).distinct())
        new = (reached.join(visited.select("node").alias("v"),
                            reached["node"] == F.col("v.node"), "left_anti")
               .select(F.col("node"), F.lit(hop).cast("int").alias("hops")))
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            break
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new.select("node")
    return visited


def triangle_participation(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED view of the edge list
    (direction and parallel edges ignored; self-loops dropped).

    Returns ``(node, n_triangles)`` — how many distinct triangles each
    node participates in; nodes in no triangle are absent.

    Plan shape: the classic order-the-endpoints formulation.  Canonicalize
    every edge to ``a < b`` and dedup, so each triangle {x,y,z} (x<y<z) is
    found EXACTLY once as the join (x,y)⋈(y,z)⋈(x,z) — two equi-joins, no
    combinatorial double counting and no post-hoc distinct over wedge
    results.  Cost is the wedge count Σ deg², the proven lower bound for
    exact triangle enumeration; at 100 TB the mitigations are the standard
    ones (degree-ordered orientation already halves wedges vs naive;
    skewed hubs spread via AQE skew-join on the shared ``y`` key).
    """
    und = (edges.filter(F.col("src") != F.col("dst"))
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .distinct())
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    per_node = (tri.select(F.col("x").alias("node"))
                .unionByName(tri.select(F.col("y").alias("node")))
                .unionByName(tri.select(F.col("z").alias("node"))))
    return per_node.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles"))
