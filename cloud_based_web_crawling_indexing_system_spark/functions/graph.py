"""Distributed connected components for near-duplicate clustering.

A dedup pipeline's last step turns pairwise/bucket relations (exact
hash groups, minhash-band buckets, simhash values) into CLUSTERS and
picks one survivor per cluster.  At 100 TB that is a graph problem:
components over a pair graph that no single machine holds.

The operator here is hash-min label propagation: every node starts
labeled with its own id; each iteration every node takes the min
label over itself and its neighbors (one join + one aggregation per
step — the standard Pregel-style shape as DataFrame ops).  After k
iterations a node's label is the min node id within its k-hop
neighborhood, so k >= graph diameter gives exact components.

Determinism/oracle story: the iteration count is FIXED (not
converge-and-stop), so k steps are exactly expressible as k unrolled
SQL CTEs — the DuckDB gate proves step-for-step equality regardless
of whether the graph converged, and a separate fixpoint test pins
that the chosen k suffices on the fixture (step k+1 == step k).

Scale notes: plain hash-min needs O(diameter) rounds; production
graphs with long chains use the large-star/small-star alternation
(Kiveris et al., "Connected Components in MapReduce and Beyond") to
square path lengths per round — the per-round dataflow (join +
min-aggregate) is identical, so this module is the building block
either way.  Near-dup graphs from banded LSH are unions of bucket
cliques, whose diameter grows only through chained overlaps —
small k covers them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "star_edges"]


def star_edges(df: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """(src, dst) edges linking every row to the MIN id of its
    ``key_col`` group — the star form of "these rows are duplicates
    of each other".  O(N) edges instead of the O(N²) clique, same
    components.  Shuffle shape: one groupBy(key) for the mins +
    one co-partitioned join back."""
    mins = df.groupBy(key_col).agg(F.min(id_col).alias("_root"))
    return (
        df.join(mins, key_col)
        .where(F.col(id_col) != F.col("_root"))
        .select(F.col(id_col).alias("src"), F.col("_root").alias("dst"))
    )


def connected_components(
    edges: DataFrame, iters: int = 6, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(v, lbl) after ``iters`` rounds of hash-min propagation over
    the undirected graph; lbl = min node id within the iters-hop
    neighborhood (= the component id when iters >= diameter).

    Per round: one shuffle join of labels to edge endpoints + one
    min-aggregate — both partition on the node id, so a production
    run pre-partitions labels once and every round reuses the
    co-location.  Each round's labels are materialized with
    ``localCheckpoint(eager=True)``: the new plan embeds TWO copies
    of the previous round's (the join and the aggregate), so without
    lineage TRUNCATION the logical plan grows 2^iters and analysis
    itself OOMs — the textbook iterative-algorithm failure mode.  A
    cluster run would use reliable ``checkpoint()`` instead (survives
    executor loss); the dataflow is identical."""
    sym = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)  # shared by every round
    nodes = sym.select(F.col("a").alias("v")).distinct()
    lbl = nodes.withColumn("lbl", F.col("v")).localCheckpoint(eager=True)
    for _ in range(iters):
        nbr = (
            sym.join(lbl.withColumnRenamed("v", "b").withColumnRenamed("lbl", "nlbl"), "b")
            .groupBy("a")
            .agg(F.min("nlbl").alias("nbr_min"))
            .withColumnRenamed("a", "v")
        )
        new = (
            lbl.join(nbr, "v", "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.coalesce(F.col("nbr_min"), F.col("lbl"))).alias("lbl"),
            )
        )
        lbl = new.localCheckpoint(eager=True)
    return lbl
