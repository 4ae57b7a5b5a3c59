"""Per-job timeline profiler for one headline query (guide §1.1/§7.1).

Runs a single query in a fresh child session with the Spark event log
enabled, then parses the log into a job-level timeline: job id, wall
seconds, description/call site, stage task counts. With the UI disabled
in this container, the event log is the only way to see where a
multi-job operator (streaming foreachBatch loops, iterative graph
algorithms, manifest RMW commits) actually spends its wall clock.

Run: python tools/phase_profile.py <query> [<query> ...]
     (sf dir from $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1;
      set PROFILE_LAP=cold to profile the first execution instead of
      the warm second one)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
from tinymapreduce_spark.session import get_spark
os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = {evdir!r}
spark = get_spark(app_name="tms-profile", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.read.parquet(os.path.join({sf!r}, "lineitem.parquet")).limit(1).collect()
spark.range(256, numPartitions=32).mapInPandas(lambda it: it, "id long").count()
q = entrymod.queries()[{name!r}]
lap = os.environ.get("PROFILE_LAP", "warm")
t0 = time.monotonic()
n = q(spark, {sf!r}).count()
cold = round(time.monotonic() - t0, 2)
spark.sparkContext.setJobDescription("===LAP2 START===")
spark.range(1).count()
# clear the marker or every subsequent job inherits it and the per-job
# call-site descriptions are lost
spark.sparkContext.setJobDescription(None)
t0 = time.monotonic()
if lap != "cold":
    n = q(spark, {sf!r}).count()
warm = round(time.monotonic() - t0, 2)
print("PROFILED", {name!r}, cold, warm, n, flush=True)
spark.stop()
"""


def profile(name: str, sf: str) -> None:
    evdir = tempfile.mkdtemp(prefix="spark-ev-")
    try:
        code = _CHILD.format(repo=REPO, sf=sf, name=name, evdir=evdir)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("PROFILED")), None
        )
        if line is None:
            print(f"{name}: FAILED\n{proc.stderr[-3000:]}")
            return
        _, _, cold, warm, n = line.split()
        print(f"\n=== {name}: cold {cold}s warm {warm}s ({n} rows) ===")
        logs = [f for f in os.listdir(evdir) if not f.startswith(".")]
        if not logs:
            print("  (no event log)")
            return
        path = os.path.join(evdir, logs[0])
        # Spark 4 writes a rolling-event-log DIRECTORY (eventlog_v2_*)
        parts = (
            sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.startswith("events_")
            )
            if os.path.isdir(path)
            else [path]
        )
        jobs: dict[int, dict] = {}
        import itertools

        if True:
            lines = itertools.chain.from_iterable(open(p) for p in parts)
            for raw in lines:
                try:
                    ev = json.loads(raw)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    desc = props.get("spark.job.description") or props.get(
                        "callSite.short", ""
                    )
                    jobs[ev["Job ID"]] = {
                        "t0": ev["Submission Time"],
                        "desc": " | ".join(desc.split("\n"))[:120],
                        "stages": len(ev.get("Stage IDs", [])),
                        "tasks": sum(
                            s.get("Number of Tasks", 0)
                            for s in ev.get("Stage Infos", [])
                        ),
                    }
                elif e == "SparkListenerJobEnd":
                    j = jobs.get(ev["Job ID"])
                    if j is not None:
                        j["t1"] = ev["Completion Time"]
        done = [(jid, j) for jid, j in sorted(jobs.items()) if "t1" in j]
        if not done:
            return
        # find the warm-lap marker job; print only jobs after it
        marker = next(
            (jid for jid, j in done if "LAP2 START" in (j["desc"] or "")), None
        )
        lap2 = [(jid, j) for jid, j in done if marker is None or jid > marker]
        total = sum(j["t1"] - j["t0"] for _, j in lap2) / 1000.0
        t_base = lap2[0][1]["t0"] if lap2 else 0
        print(f"  warm-lap jobs: {len(lap2)}, sum of job walls {total:.2f}s")
        for jid, j in lap2:
            wall = (j["t1"] - j["t0"]) / 1000.0
            rel = (j["t0"] - t_base) / 1000.0
            gap = ""
            print(
                f"  job {jid:3d} @{rel:7.2f}s  {wall:6.2f}s"
                f"  stages={j['stages']:2d} tasks={j['tasks']:4d}"
                f"  {(j['desc'] or '')[:90]}{gap}"
            )
        # gaps between consecutive jobs (driver-side work, guide §7.3)
        gaps = []
        for (a_id, a), (b_id, b) in zip(lap2, lap2[1:]):
            g = (b["t0"] - a["t1"]) / 1000.0
            if g > 0.15:
                gaps.append((a_id, b_id, g))
        if gaps:
            print("  gaps >0.15s between jobs (driver-side work):")
            for a_id, b_id, g in gaps:
                print(f"    job {a_id} -> job {b_id}: {g:.2f}s")
    finally:
        shutil.rmtree(evdir, ignore_errors=True)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in sys.argv[1:]:
        profile(name, sf)


if __name__ == "__main__":
    main()
