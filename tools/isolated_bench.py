"""Isolated-session per-query timing — the noise adjudicator.

BASELINE.md documents that this container shows episodic host co-load
with per-query swings up to 3x in BOTH directions inside a shared
session. This tool times each query in its OWN fresh process (fresh
JVM, fresh Python, cold codegen) so cross-round regression calls can be
made against numbers that no concurrent query perturbs. The per-round
procedure (VERDICT r4 #8): run this over the round's top-10 most
expensive bench queries and record the table next to BENCH_r{N} in
BASELINE.md; judge regressions against THESE walls, not the shared-run
ones.

Run:  python tools/isolated_bench.py [query ...]
      (defaults to the round-5 top-10 set; sf dir from
      $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)

Prints one `name wall_seconds` line per query plus a JSON summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# round-8 default: the warm-lap top-10 of the r8 seeding bench (the
# keys the regression gate is most likely to flag on a noisy host)
DEFAULT = [
    "hybrid_rrf_ndcg",
    "pagerank_trade",
    "stream_perplexity_buckets",
    "stream_dv_erasure",
    "stream_pack_nextfit",
    "ann_ivfpq_topk",
    "stream_cdc_upsert",
    "winnow_neardup_pairs",
    "semdedup_recall",
    "stream_cdc_apply_changes",
]

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
from tinymapreduce_spark.session import get_spark
spark = get_spark(app_name="tms-isolated", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
# same warmup as bench.py so the wall measures the query, not first-touch JIT
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.read.parquet(os.path.join({sf!r}, "lineitem.parquet")).limit(1).collect()
q = entrymod.queries()[{name!r}]
t0 = time.monotonic()
n = q(spark, {sf!r}).count()
cold = round(time.monotonic() - t0, 2)
t0 = time.monotonic()
n = q(spark, {sf!r}).count()
warm = round(time.monotonic() - t0, 2)
print("ISOLATED", {name!r}, cold, warm, n, flush=True)
"""


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results: dict[str, float] = {}
    for name in names:
        code = _CHILD.format(repo=REPO, sf=sf, name=name)
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd="/tmp",  # foreign cwd, like the driver
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("ISOLATED")),
            None,
        )
        if line is None:
            print(f"{name} FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        _, _, cold, warm, nrows = line.split()
        results[name] = {"cold": float(cold), "warm": float(warm)}
        print(f"{name} cold {cold} s / warm {warm} s ({nrows} rows)", flush=True)
    print(json.dumps({"metric": "isolated_query_seconds", "sf": sf, "queries": results}))


if __name__ == "__main__":
    main()
