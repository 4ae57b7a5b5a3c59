"""Dump .explain('formatted') evidence for round-11-touched queries.

Run: python tools/dump_r11_plans.py <before|after> [key ...]

Writes plans/r11/<key>_<tag>.txt. Two round-11 specifics:

- The graph-tier change moves work INTO the loop's final eager
  localCheckpoint (a lazily chained, statically planned iteration), so
  the returned frame's plan no longer shows it. The tool intercepts
  ``DataFrame.localCheckpoint`` (the classic class — the abstract base's
  method is never called) and records the formatted plan of every frame
  at the moment it is checkpointed: for `before` that is one plan per
  checkpoint cadence; for `after` it is the single chained plan whose
  join rows carry the explicit broadcast hints.
- The one-partition literal-frame change is invisible in a formatted
  plan (an ExistingRDD leaf prints identically at any partition count),
  so each file's header also records the LIVE partition count of the
  operator's literal frame (centroids / weights / PQ codebook), which
  is the checkable fact: 32 before, 1 after.

Set SPARK_GRAFT_PLANS_SRC to a checkout to dump `before` plans from the
pre-round code while writing into this repo's plans/r11.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_PLANS_SRC", REPO)
sys.path.insert(0, SRC)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

DEFAULT_KEYS = [
    "pagerank_trade",
    "label_propagation",
    "kmeans_clusters",
    "perceptron_quality",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "semdedup_drops",
    "manifest_metadata_agg",
    "set_ops",
    "stream_ann_ingest",
    "dedup_incremental_bloom",
]


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:] or DEFAULT_KEYS
    import __spark_entry__ as mod
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from tinymapreduce_spark.session import get_spark

    spark = get_spark()
    q = mod.queries()
    outdir = os.path.join(REPO, "plans", "r11")
    os.makedirs(outdir, exist_ok=True)

    captured: list[str] = []
    real_ckpt = CDF.localCheckpoint

    def capturing_ckpt(self, eager=True):
        try:
            captured.append(fmt(self))
        except Exception as e:  # capture must never break the query
            captured.append(f"(explain failed: {e})\n")
        return real_ckpt(self, eager=eager)

    def literal_frame_partitions(key: str) -> str:
        """Live partition count of the operator's literal frame — the
        fact the one-partition change alters (invisible in explain)."""
        try:
            if key == "kmeans_clusters":
                from tinymapreduce_spark.operators import clustering as cl

                vecs = cl._quantized_vecs(spark, SF)
                init = vecs.orderBy("vec_id").limit(cl.K_CLUSTERS).collect()
                cents = [[int(v) for v in r["a"]] for r in init]
                cdf = cl._assign(vecs, cents)
                # the literal frame is the broadcast side: rebuild it
                # the way _assign does to read its partition count
                from tinymapreduce_spark.operators.clustering import (  # noqa
                    K_CLUSTERS,
                )
                try:
                    from tinymapreduce_spark.sources.loaders import (
                        local_literal_frame,
                    )

                    lit = local_literal_frame(
                        spark, [(cents,)], "cs array<array<bigint>>"
                    )
                except ImportError:  # pre-round-11 code
                    lit = spark.createDataFrame(
                        [(cents,)], "cs array<array<bigint>>"
                    )
                return str(lit.rdd.getNumPartitions())
            if key == "perceptron_quality":
                try:
                    from tinymapreduce_spark.sources.loaders import (
                        local_literal_frame,
                    )

                    lit = local_literal_frame(spark, [([0] * 5,)], "ws array<bigint>")
                except ImportError:
                    lit = spark.createDataFrame([([0] * 5,)], "ws array<bigint>")
                return str(lit.rdd.getNumPartitions())
            if key in (
                "ann_ivf_topk",
                "ann_pq_topk",
                "ann_ivfpq_topk",
                "semdedup_drops",
                "stream_ann_ingest",
            ):
                from tinymapreduce_spark.operators import similarity as sim
                from tinymapreduce_spark.sources.loaders import load_table

                emb = load_table(spark, SF, "embeddings")
                cents = sim._cached_centroids_int(spark, SF, emb)
                assigned = sim._with_cell_dists(emb, cents)
                # the literal frame is the single leaf under the
                # broadcast join inside assigned — count via its plan's
                # RDD leaves: rebuild it the same way instead
                try:
                    from tinymapreduce_spark.sources.loaders import (
                        local_literal_frame,
                    )

                    lit = local_literal_frame(
                        spark, [(cents,)], "cs array<array<bigint>>"
                    )
                except ImportError:
                    lit = spark.createDataFrame(
                        [(cents,)], "cs array<array<bigint>>"
                    )
                return str(lit.rdd.getNumPartitions())
            if key in ("manifest_metadata_agg", "set_ops"):
                df = q[key](spark, SF)
                return str(df.rdd.getNumPartitions())
        except Exception as e:
            return f"(unavailable: {e})"
        return "(n/a)"

    for key in keys:
        parts: list[str] = [f"# {key} — {tag} (sf={SF})\n"]
        lfp = literal_frame_partitions(key)
        if lfp != "(n/a)":
            parts.append(f"## literal-frame partitions: {lfp}\n")
        captured.clear()
        CDF.localCheckpoint = capturing_ckpt
        try:
            df = q[key](spark, SF)
        finally:
            CDF.localCheckpoint = real_ckpt
        for i, plan in enumerate(captured):
            parts.append(f"## checkpointed plan {i}\n{plan}")
        if key.startswith("stream_"):
            parts.append(
                "## note: streaming key — the returned frame reads the"
                " materialized sink; per-batch runtime evidence (job/"
                "task counts, files per version) is in"
                " OPTIMIZATION_r11.md\n"
            )
        parts.append("## returned frame\n" + fmt(df))
        path = os.path.join(outdir, f"{key}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write("\n".join(parts))
        print("wrote", path)


if __name__ == "__main__":
    main()
