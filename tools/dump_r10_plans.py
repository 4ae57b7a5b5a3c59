"""Dump .explain('formatted') for round-10-touched queries.

Run: python tools/dump_r10_plans.py <before|after> [key ...]

Writes plans/r10/<key>_<tag>.txt for each key (default: the round-10
touched set). For `kmeans_clusters` the file additionally carries the
centroid-update aggregate's plan (the loop-internal shape the round-10
change targets — the returned frame's plan does not show it).
For streaming keys the returned frame is a materialized sink read, so
the file carries the pre-start streaming plan where constructible plus
a header noting which runtime evidence applies.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

DEFAULT_KEYS = [
    "kmeans_clusters",
    "ann_ivf_topk",
    "semdedup_drops",
    "semdedup_recall",
    "stream_pack_nextfit",
    "stream_cdc_upsert",
    "stream_cdc_apply_changes",
    "stream_dv_erasure",
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
    from tinymapreduce_spark.session import get_spark

    spark = get_spark()
    q = mod.queries()
    outdir = os.path.join(REPO, "plans", "r10")
    os.makedirs(outdir, exist_ok=True)
    for key in keys:
        parts: list[str] = [f"# {key} — {tag} (sf={SF})\n"]
        if key == "kmeans_clusters":
            # the round-10 change is inside the Lloyd's iteration:
            # dump the centroid-update aggregate's plan explicitly
            from tinymapreduce_spark.operators import clustering as cl
            from pyspark.sql import functions as F

            vecs = cl._quantized_vecs(spark, SF)
            init = vecs.orderBy("vec_id").limit(cl.K_CLUSTERS).collect()
            cents = [[int(v) for v in r["a"]] for r in init]
            assigned = cl._assign(vecs, cents)
            dims = len(cents[0])
            try:
                upd = assigned.groupBy("cluster").agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(F.element_at("a", d + 1)).alias(f"s{d}")
                        for d in range(dims)
                    ],
                )
                parts.append(
                    "## centroid-update aggregate (current code shape)\n"
                    + fmt(upd)
                )
            except Exception:
                pass
            upd_old = (
                assigned.select(
                    "cluster", F.posexplode("a").alias("dim", "v")
                )
                .groupBy("cluster", "dim")
                .agg(F.expr("SUM(v) DIV COUNT(1)").alias("m"))
                .groupBy("cluster")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "m"))
                    ).alias("dm")
                )
                .select(
                    "cluster", F.transform("dm", lambda s: s["m"]).alias("c")
                )
            )
            parts.append(
                "## posexplode + double-groupBy shape (pre-r10), for"
                " comparison\n" + fmt(upd_old)
            )
        if key.startswith("stream_"):
            parts.append(
                "## note: streaming key — the returned frame below reads"
                " the materialized sink; runtime evidence (state"
                " partition count / per-batch job count) is in"
                " OPTIMIZATION_r10.md\n"
            )
        df = q[key](spark, SF)
        parts.append("## returned frame\n" + fmt(df))
        path = os.path.join(outdir, f"{key}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write("\n".join(parts))
        print("wrote", path)


if __name__ == "__main__":
    main()
