"""Graph analytics over relational edge sets — PageRank (fixed-point)
and degree statistics. Complements the label-propagation connected
components in operators/dedup.py.

Why FIXED-POINT integer arithmetic: distributed float summation is
order-dependent (Spark's partial aggregates sum in partition order, an
oracle engine in another), so float PageRank is not bit-reproducible
across engines or even across retries at the ULP level. Scaling ranks
to integers (1e12 fixed-point) makes every operation — integer division
by degree, damped sum — EXACT and associative: Spark, DuckDB, and a
pure-Python loop produce identical longs, so the registry oracle can
unroll the same iterations in plain SQL. The truncation introduced by
integer division is part of the (deterministic) algorithm definition,
bounded by n_nodes/SCALE per step — immaterial at SCALE = 1e12.

Scale shape: each iteration is one groupBy-sum over the edge relation
(map-side combinable, shuffling on the destination node key) plus a
broadcast of nothing — no driver loops over nodes, no global windows.
n_iter is a fixed small constant (PageRank converges geometrically;
production runs 10-50 iterations of exactly this plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Fixed-point scale: ranks are longs in units of 1e-12.
PR_SCALE = 10**12


def undirected_degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) over the symmetrized edge set. `edges` carries
    (src, dst); each distinct undirected pair contributes 1 to both
    endpoints' degrees."""
    sym = symmetrize(edges)
    return sym.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).select(F.col("src").alias("node"), "deg")


def symmetrize(edges: DataFrame) -> DataFrame:
    """Distinct undirected edge set as both directions: (src, dst) rows
    with each pair appearing exactly once per direction."""
    e = edges.select("src", "dst").distinct()
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def pagerank_fixed(
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank over the UNDIRECTED graph of `edges` (src, dst) in
    fixed-point integer arithmetic (see module docstring).

    Returns (node, rank) with rank a long in PR_SCALE units after
    `n_iter` iterations from the uniform start. Update rule (integers
    throughout, `div` = truncating division):

        contrib(v)  = rank(v) div deg(v)            per neighbor
        rank'(u)    = ((100 - d) * (SCALE div n)) div 100
                      + (d * sum_{v~u} contrib(v)) div 100

    Symmetrization removes dangling nodes (every node has deg >= 1), so
    no leaked-mass correction is needed.
    """
    sym = symmetrize(edges).persist()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg").persist()
    n_nodes = nodes.count()
    if n_nodes == 0:
        empty = nodes.select("node", F.lit(0).cast("long").alias("rank"))
        sym.unpersist()
        nodes.unpersist()
        return empty
    base = ((100 - damping_pct) * (PR_SCALE // n_nodes)) // 100

    ranks = nodes.select(
        "node", F.lit(PR_SCALE // n_nodes).cast("long").alias("rank")
    )
    prev = None
    for _ in range(n_iter):
        contribs = (
            sym.join(
                ranks.join(nodes, "node").select(
                    F.col("node").alias("src"),
                    F.expr("rank div deg").cast("long").alias("c"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").cast("long").alias("s"))
        )
        nxt = nodes.select("node").join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_pct} * coalesce(s, 0L)) div 100"
                ).cast("long")
            ).alias("rank"),
        )
        # persist + materialize per iteration: lineage stays one step
        # deep (n_iter chained joins would otherwise re-plan from the
        # scan each round)
        nxt = nxt.persist()
        nxt.count()
        if prev is not None:
            prev.unpersist()
        prev = nxt
        ranks = nxt
    # the FINAL ranks frame stays persisted (it is materialized and the
    # caller consumes it next); the iteration scaffolding does not
    sym.unpersist()
    nodes.unpersist()
    return ranks


def copurchase_edges(
    pairs: DataFrame, min_shared: int = 2
) -> DataFrame:
    """Project a bipartite (customer, supplier) relation onto the
    supplier–supplier CO-PURCHASE graph: an (a, b) edge (a < b) exists
    iff at least `min_shared` customers bought from both. The self-join
    fans out per customer as C(k, 2) over their k suppliers — bounded by
    the per-customer supplier count (small in practice; cap or sample
    per customer upstream for heavy hitters, the same discipline as
    LSH's max_bucket)."""
    left = pairs.select(F.col("cust").alias("c"), F.col("supp").alias("a"))
    right = pairs.select(F.col("cust").alias("c"), F.col("supp").alias("b"))
    return (
        left.join(right, "c")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Triangle count over an undirected edge set given as (a, b) with
    a < b per edge: two equi-joins enumerate ordered wedges a<b<c and
    close them against the edge set — the standard compact-forward
    shape, shuffling only on edge endpoints (the degree-ordered variant
    drops the worst-case skew at production scale; same plan).
    Returns one row (n_nodes, n_edges, n_triangles) — exact integers.
    """
    e = edges.select("a", "b").distinct().persist()
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    wedges = ab.join(
        e.select(F.col("a").alias("y"), F.col("b").alias("z")), "y"
    )
    tri = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    nodes = e.select(F.col("a").alias("n")).unionByName(
        e.select(F.col("b").alias("n"))
    ).distinct()
    return (
        tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .crossJoin(
            F.broadcast(
                nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            )
        )
        .crossJoin(
            F.broadcast(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        )
        .select("n_nodes", "n_edges", "n_triangles")
    )
