"""Property-graph operators over the (vertices, edges) tables.

The reference stores edges as in_/out_ rid lists on vertices and
supports ``neighbors: n`` expansion on queries
(src/graphkb.js:341-372) plus edge-existence checks (``edgeExists``
src/graphkb.js:719-729). Here edges are one DataFrame
(out_rid, in_rid, edge_class, source_rid) — GraphFrames-compatible —
and n-hop expansion is n self-joins (each broadcastable when the
frontier is small; at scale the join keys are co-partitionable by rid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_neighbors(
    seeds: DataFrame,
    edges: DataFrame,
    id_col: str,
    n: int = 1,
    edge_classes: list[str] | None = None,
    directed: bool = False,
) -> DataFrame:
    """Return the ids within ``n`` hops of ``seeds`` (including seeds),
    with the hop distance. BFS via iterative joins — the frontier
    stays a DataFrame throughout (no driver collect).
    """
    e = edges
    if edge_classes:
        e = e.filter(F.col("edge_class").isin(edge_classes))
    fwd = e.select(F.col("out_rid").alias("src"), F.col("in_rid").alias("dst"))
    if not directed:
        fwd = fwd.unionByName(
            e.select(F.col("in_rid").alias("src"), F.col("out_rid").alias("dst"))
        )

    visited = seeds.select(F.col(id_col).alias("rid")).distinct().withColumn(
        "hop", F.lit(0)
    )
    frontier = visited
    for hop in range(1, n + 1):
        nxt = (
            frontier.join(fwd, frontier["rid"] == fwd["src"])
            .select(F.col("dst").alias("rid"))
            .distinct()
            .join(visited.select("rid"), "rid", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        # truncate lineage each hop: without this the plan doubles per
        # iteration (hop k re-embeds every earlier hop's joins) — the
        # standard checkpoint step of any iterative DataFrame algorithm
        nxt = nxt.localCheckpoint(eager=False)
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def edge_exists(
    pairs: DataFrame, edges: DataFrame, out_col: str, in_col: str, edge_class: str
) -> DataFrame:
    """Annotate (out, in) candidate pairs with whether the edge already
    exists (left_semi shape, reference ``edgeExists``)."""
    e = edges.filter(F.col("edge_class") == edge_class).select(
        F.col("out_rid").alias(out_col), F.col("in_rid").alias(in_col)
    ).withColumn("__exists", F.lit(True)).dropDuplicates([out_col, in_col])
    return pairs.join(e, [out_col, in_col], "left").withColumn(
        "edge_exists", F.coalesce(F.col("__exists"), F.lit(False))
    ).drop("__exists")
