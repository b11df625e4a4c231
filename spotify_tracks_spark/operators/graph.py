"""Distributed graph algebra over DataFrame joins.

The dedup family already covers connected components (union-find +
label propagation + a recursive-CTE twin, operators/dedup.py); this
module holds the other classic scale-out graph primitive: TRIANGLE
COUNTING with degree orientation — the standard MapReduce/Spark
formulation (count each triangle exactly once by orienting every edge
from its lower-(degree, id) endpoint to the higher one, then join
wedges with the closing edge).

Why orientation is the scale story: a naive wedge enumeration fans out
Σ deg(v)² — quadratic at hub nodes.  Orienting by (degree, id) caps
every node's OUT-degree at O(√E) on any graph, so the wedge join is
bounded by Σ dout² ≤ E^1.5 — the classic bound — and hub nodes stop
being the bottleneck.  All arithmetic is integer, so the DuckDB oracle
is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import read_table

# drop items from abnormally large orders before pairing: a W-item order
# contributes W·(W−1)/2 edges (same quadratic-block hazard as the dedup
# blockers; TPC-H orders hold ≤7 items, so this only guards pathologies)
TRI_MAX_ORDER_ITEMS = 16


def parts_copurchase_triangles(
    spark: SparkSession, sf_dir: str, max_order_items: int = TRI_MAX_ORDER_ITEMS
) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph.

    Graph: parts are nodes; an edge connects two parts that appear in
    the same order (distinct pairs over lineitem — the co-occurrence
    join every market-basket analysis starts from).  A triangle is
    three parts that pairwise co-occur — the tightly-coupled product
    triple a recommender mines.

    Plan: per-order distinct item lists pair within the order (bounded
    by ``max_order_items``²), dedup to the edge set [one shuffle]; the
    degree table joins back to orient each edge low→high by
    (degree, part); the wedge self-join on the shared LOW endpoint
    [bounded Σ dout² by orientation] left-semi-joins the closing edge;
    each triangle then credits its three corners.

    Output: (part_id, n_triangles), parts in ≥1 triangle."""
    li = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    sized = li.groupBy("o").agg(F.count("*").alias("w"))
    li = li.join(
        F.broadcast(sized.filter(F.col("w") > max_order_items).select("o")),
        "o",
        "left_anti",
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .distinct()
        .persist()
    )
    edges.count()  # pin before the degree join + wedge self-join fan-out

    deg = (
        edges.select(F.col("x").alias("n"))
        .unionByName(edges.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # orient each edge from the lower (degree, id) endpoint; carry the
    # target's key so the wedge join can order its two far endpoints
    keyed = (
        edges.join(deg.select(F.col("n").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("n").alias("y"), F.col("d").alias("dy")), "y")
    )
    fwd = F.struct(F.col("dx").alias("d"), F.col("x").alias("n")) < F.struct(
        F.col("dy").alias("d"), F.col("y").alias("n")
    )
    oriented = keyed.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(fwd, F.struct(F.col("dy").alias("d"), F.col("y").alias("n")))
        .otherwise(F.struct(F.col("dx").alias("d"), F.col("x").alias("n")))
        .alias("kv"),
    ).persist()
    oriented.count()

    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.kv") < F.col("e2.kv")),
    ).select(
        F.col("e1.u").alias("u"), F.col("e1.v").alias("v"), F.col("e2.v").alias("w")
    )
    # the closing-edge probe is the hot path: the wedge stream (Σ dout²
    # rows) must NOT shuffle — broadcast the edge list (2 longs per edge;
    # E·16 bytes, far under any broadcast limit for graphs whose edge set
    # fits an index, and at larger E a bloom-pruned shuffle join replaces
    # it) so the semi-join stays map-side over the wedges.
    closing = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tris = wedges.join(F.broadcast(closing), ["v", "w"], "left_semi")
    return (
        tris.select(F.explode(F.array("u", "v", "w")).alias("part_id"))
        .groupBy("part_id")
        .agg(F.count("*").alias("n_triangles"))
    )
