"""Link-graph analytics over a (src, dst) edge table.

Web-curation pipelines score pages by their position in the link graph
(in-degree and PageRank-style centrality are standard crawl-seed quality
signals, cf. Page et al. 1999, "The PageRank citation ranking").  This
module gives that family the same engine treatment as the rest of the
repo: pure DataFrame expressions, deterministic integer arithmetic, a
DuckDB oracle twin per query.

Integer-lattice PageRank
------------------------
Classic PageRank is float-valued, and float sums are addition-order-
dependent — two engines (or two partitionings) can disagree in the last
ulp and break bit-equality.  Same cure as ``similarity.KMEANS_SCALE``:
work on an integer lattice.  Ranks start at ``scale`` (default 10^6);
one iteration is

    pr'(v) = (3 * scale) // 20  +  (17 * inflow(v)) // 20
    inflow(v) = SUM over edges (u, v) of  pr(u) // out_degree(u)

i.e. damping 0.85 = 17/20 as exact rational arithmetic with floor
division.  Every operation is integer add / floor-div, so the result is
bit-identical in any engine at any parallelism.  By default dangling
nodes (no out-links) simply leak their mass — the standard simplified
variant; ranking quality is unaffected for curation purposes and the
semantics stay one-line explainable.  With
``redistribute_dangling=True`` the leaked mass is returned uniformly
per iteration (Page et al.'s teleport treatment of dangling nodes):

    pr'(v) = (3 * scale) // 20
             + (17 * (inflow(v) + dangling_sum // n_nodes)) // 20

where ``dangling_sum`` is the total rank of out-linkless nodes — ONE
broadcast scalar per iteration (a one-row anti-join aggregate), so the
exact-integer property is preserved; only the floor-division remainder
``dangling_sum mod n_nodes`` (< n_nodes lattice units, i.e. < n/scale
of one unit of mass) still leaks, which keeps every engine
bit-identical where a rational share would reintroduce float drift.

Scale (10^12 edges): each iteration is one (src) join to carry ranks
onto edges plus one (dst) partial-aggregate shuffle — the canonical
distributed PR shape.  Partition (bucket) the edge table by ``src`` and
the rank carry join needs no exchange; the inflow aggregate shuffles
k <= n_nodes rows per partition after map-side combine.  Iterations are
unrolled lazily into one plan (no driver-side loop state beyond the
DataFrame reference); checkpoint every few iterations at cluster scale
via ``plans.checkpoint`` exactly like the CC dedup loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point grid for rank mass — integer arithmetic end-to-end.
PR_SCALE = 1_000_000


def out_degrees(edges: DataFrame, src_col: str = "src",
                dst_col: str = "dst") -> DataFrame:
    """(src, out_deg) for every node with at least one out-link."""
    return (edges.groupBy(F.col(src_col).alias("src"))
            .agg(F.count(F.lit(1)).alias("out_deg")))


def degree_census(nodes: DataFrame, edges: DataFrame,
                  id_col: str = "node_id", src_col: str = "src",
                  dst_col: str = "dst") -> DataFrame:
    """In-degree histogram over ALL nodes — (in_degree, n_nodes) with a
    row for in_degree 0 when isolated/source-only nodes exist.

    The link-graph shape diagnostic: a healthy crawl frontier has a
    long-tailed in-degree histogram; a scraped mirror farm shows up as a
    spike.  One (dst) aggregate + one left join + one tiny histogram
    aggregate — no row ever carries more than two integers."""
    indeg = (edges.groupBy(F.col(dst_col).alias(id_col))
             .agg(F.count(F.lit(1)).alias("in_degree")))
    return (nodes.select(id_col)
            .join(indeg, id_col, "left")
            .select(F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
            .groupBy("in_degree")
            .agg(F.count(F.lit(1)).alias("n_nodes")))


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 2,
             scale: int = PR_SCALE, id_col: str = "node_id",
             src_col: str = "src", dst_col: str = "dst",
             redistribute_dangling: bool = False) -> DataFrame:
    """Integer-lattice PageRank — (node_id, pr) after ``iters`` unrolled
    iterations; see the module docstring for the exact recurrence and
    why it is bit-identical across engines.

    Deterministic by construction: integer sums commute, floor division
    is exact, and the iteration count is fixed — no convergence test, no
    float epsilon.  ``redistribute_dangling=True`` returns out-linkless
    nodes' rank mass uniformly each iteration (module docstring: the
    per-iteration cost is one anti-join one-row aggregate, broadcast
    back as a scalar) — use it when ranks must approximate a
    distribution; the default leaky variant is cheaper and ranks
    identically for curation."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1; got {iters}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = out_degrees(e)
    pr = nodes.select(F.col(id_col).alias("node_id"),
                      F.lit(scale).cast("long").alias("pr"))
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    base = (3 * scale) // 20  # (1 - d) * scale with d = 17/20
    for _ in range(iters):
        # `div` is exact integer division on longs (no double quotient
        # whose rounding could cross an integer boundary) — the oracle's
        # BIGINT `//` matches it bit-for-bit on the positive lattice
        contrib = (e.join(pr.withColumnRenamed("node_id", "src"), "src")
                   .join(deg, "src")
                   .select(F.col("dst").alias("node_id"),
                           F.expr("pr div out_deg").cast("long").alias("c")))
        inflow = contrib.groupBy("node_id").agg(F.sum("c").alias("inflow"))
        carried = (nodes.select(F.col(id_col).alias("node_id"))
                   .join(inflow, "node_id", "left"))
        if redistribute_dangling:
            # total rank sitting on out-linkless nodes: one-row
            # aggregate (anti-join against the degree table), crossed
            # back in as a broadcast scalar — exact integers throughout
            dang = (pr.join(deg, pr["node_id"] == deg["src"], "left_anti")
                    .agg(F.coalesce(F.sum("pr"), F.lit(0).cast("long"))
                         .alias("dang_sum")))
            share = (dang.crossJoin(n_nodes)
                     .select(F.expr("dang_sum div n_nodes").cast("long")
                             .alias("dang_share")))
            carried = carried.crossJoin(F.broadcast(share))
            inflow_expr = "coalesce(inflow, 0L) + dang_share"
        else:
            inflow_expr = "coalesce(inflow, 0L)"
        pr = carried.select(
            "node_id",
            F.expr(f"{base}L + ((17 * ({inflow_expr})) div 20)")
            .cast("long").alias("pr"))
    return pr
