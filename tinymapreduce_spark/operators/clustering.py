"""K-means clustering over the ``embeddings`` table — the iterative-ML
representative (the same driver-loop + bounded-shuffle shape as
operators/graph.py's PageRank / connected components).

The reference has no iterative dataflow at all (its only loop is the
coordinator's scheduling loop, /root/reference/src/mr/coordinator.go:123-156);
this is pure new-engine surface, required by every embedding-pipeline
stage that buckets vectors (IVF coarse quantizers, semantic dedup
sharding, topic assignment).

Scale shape per iteration:
- assignment: centroids are K rows — ALWAYS broadcast; the scan of N
  vectors never shuffles for assignment.
- update: element-wise centroid means via posexplode -> groupBy
  (cluster, dim) — one bounded shuffle of N*D skinny rows with map-side
  partial aggregation; never a collect of vectors to the driver. The
  K*D result is collected (tiny) to seed the next round's broadcast.
- lineage: each round's centroids are plain Python literals, so the plan
  does not grow with iterations (no checkpoint needed, unlike the
  edge-relabeling loops in graph.py).

Determinism: init = the K lowest vec_ids; ties in assignment break to
the lowest cluster id. Float means make exact cross-engine SQL parity
impractical -> rows-only driver check + invariant tests (inertia
monotonically non-increasing, all clusters nonempty, assignment
idempotent at convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymapreduce_spark.sources.loaders import load_table

K_CLUSTERS = 8
KMEANS_ITERS = 5


def _sq_dist_to(centroid: list[float]):
    """Squared L2 distance from the row's ``a`` (array<double>) to a
    centroid literal — a zip_with/aggregate fold, JVM-side."""
    c = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(F.col("a"), c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add (cluster, sq_dist): argmin over the K broadcast centroid
    literals via one least() expression — no join, no shuffle."""
    dists = [_sq_dist_to(c).alias(f"d{i}") for i, c in enumerate(centroids)]
    with_d = vecs.select("vec_id", "a", *dists)
    best = F.least(*[F.col(f"d{i}") for i in range(len(centroids))])
    cluster = None
    for i in reversed(range(len(centroids))):
        cond = F.col(f"d{i}") == best
        cluster = F.when(cond, i) if cluster is None else F.when(cond, i).otherwise(cluster)
    return with_d.select("vec_id", "a", cluster.alias("cluster"), best.alias("sq_dist"))


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=8 Lloyd's iterations (fixed 5 rounds) over the embedding
    vectors; returns per-cluster population and mean squared distance.
    See module docstring for the 100 TB shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    # the vectors are loop-invariant: persist once so the K iterations
    # re-read memory, not parquet (at 100 TB: MEMORY_AND_DISK, or a
    # pre-materialized decoded table)
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("a")
    ).persist()
    try:
        init = vecs.orderBy("vec_id").limit(K_CLUSTERS).collect()
        centroids = [list(r["a"]) for r in init]

        for _ in range(KMEANS_ITERS):
            assigned = _assign(vecs, centroids)
            new_rows = (
                assigned.select("cluster", F.posexplode("a").alias("dim", "v"))
                .groupBy("cluster", "dim")
                .agg(F.avg("v").alias("m"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
                .select("cluster", F.transform("dm", lambda s: s["m"]).alias("c"))
                .collect()
            )
            by_id = {r["cluster"]: list(r["c"]) for r in new_rows}
            centroids = [by_id.get(i, centroids[i]) for i in range(K_CLUSTERS)]

        final = _assign(vecs, centroids)
        return (
            final.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n_vecs"),
                F.round(F.avg("sq_dist"), 6).alias("mean_sq_dist"),
            )
            .orderBy("cluster")
            .localCheckpoint(eager=True)
        )
    finally:
        vecs.unpersist()


def kmeans_inertia_per_round(spark: SparkSession, sf_dir: str) -> list[float]:
    """Total inertia after each update round — test hook for the
    monotonicity invariant (Lloyd's never increases inertia)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("a")
    ).persist()
    try:
        init = vecs.orderBy("vec_id").limit(K_CLUSTERS).collect()
        centroids = [list(r["a"]) for r in init]
        inertias: list[float] = []
        for _ in range(KMEANS_ITERS):
            assigned = _assign(vecs, centroids)
            inertias.append(assigned.agg(F.sum("sq_dist")).collect()[0][0])
            new_rows = (
                assigned.select("cluster", F.posexplode("a").alias("dim", "v"))
                .groupBy("cluster", "dim")
                .agg(F.avg("v").alias("m"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
                .select("cluster", F.transform("dm", lambda s: s["m"]).alias("c"))
                .collect()
            )
            by_id = {r["cluster"]: list(r["c"]) for r in new_rows}
            centroids = [by_id.get(i, centroids[i]) for i in range(K_CLUSTERS)]
        return inertias
    finally:
        vecs.unpersist()
