"""Iterative graph algorithms — connected components for duplicate
clustering.

The reference has no graph operators (its only dataflow is a single
map -> shuffle -> reduce pass, `src/mr/worker.go:76-190`); this module is
north-star surface: near-dup PAIRS (from dedup.py) become duplicate
CLUSTERS, which is what a curation pipeline actually deletes from.

The algorithm is the two-phase large-star/small-star method (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14): both
phases are a groupBy-min + re-emit, so each round is two shuffles on the
node id, and the edge set contracts toward a star per component in
O(log^2 n) rounds — unlike naive min-label propagation, whose round
count is the graph DIAMETER (a 1M-node chain needs 1M rounds; this
needs ~40). That difference is the whole ballgame at 100 TB.

Spark-specific posture for iterative algorithms:
- `localCheckpoint(eager=True)` every round truncates the lineage —
  without it the plan doubles per iteration and the driver dies in
  analysis long before the data is the bottleneck.
- convergence is detected by an order-insensitive edge-set checksum
  (sum of xxhash64(u,v)), one tiny aggregate per round — not a
  subtract/except, which would be an extra full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Orient every edge (big, small), drop self-loops, dedup."""
    u, v = F.col("u"), F.col("v")
    return (
        edges.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) sum: long would overflow under ANSI mode
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], int(row["h"])


def connected_components(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(node, component) for every node appearing in `edges` (u, v);
    component = smallest node id reachable. Two-phase star contraction,
    driver loop with per-round lineage truncation.
    """
    e = _canon(edges).localCheckpoint(eager=True)
    prev = None
    for _ in range(max_rounds):
        # large-star: for each node, link every LARGER neighbor to the
        # smallest node seen in its neighborhood (incl. itself)
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("minv"))
        m = F.least(F.col("u"), F.col("minv"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
        )
        # small-star: orient (big, small); link all smaller neighbors
        # AND the center itself to the neighborhood min
        o = _canon(large)
        mins2 = o.groupBy("u").agg(F.min("v").alias("minv"))
        withm = o.join(mins2, "u")
        small = withm.select(F.col("v").alias("u"), F.col("minv").alias("v")).union(
            withm.select("u", F.col("minv").alias("v"))
        )
        e = _canon(small).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    # converged edge set is a star per component: (member, root). Roots
    # appear only on the right — give them their own row.
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return members.union(roots).distinct()


def cluster_stats(components: DataFrame) -> DataFrame:
    """Attach per-component size: (node, component, cluster_size)."""
    w = Window.partitionBy("component")
    return components.withColumn("cluster_size", F.count(F.lit(1)).over(w))
