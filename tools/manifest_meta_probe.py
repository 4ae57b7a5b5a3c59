"""Manifest metadata posture at large file counts (VERDICT r8 #5).

The lakehouse tier's 100 TB story rests on O(#files) driver-side
manifest entries. This probe measures that claim with numbers instead
of assertions: synthesize manifests of N hash-distributed file entries
(every file's [min, max] spans the key domain — bloom's home turf, the
worst case for metadata size because every entry carries a bitmap),
committed through the REAL ``_write_manifest_locked`` path, then time
the three metadata consumers:

  - ``snapshot()``            (manifest json load — every reader pays it)
  - ``point_lookup_files``    (range + bloom scan planning, driver-side)
  - ``_split_files_by_key_frame`` (MERGE/DELETE planning, Spark-side)

Bitmaps are synthetic (~1/8 fill, deterministic bytes — the planners do
identical work regardless of which bits are set; correctness of real
bitmaps is pinned by tests/test_manifest_model.py). Two postures:

  - inline:  bits hex-inlined in the manifest entry (the pre-r9 shape;
             probed at 10^3 / 10^4 — at 10^5 the manifest alone would
             be ~1.6 GB JSON, which is the point)
  - sidecar: packed per-version .bin with {ref, off, len} entries (the
             r9 cutover, BLOOM_INLINE_BUDGET) at 10^3 / 10^4 / 10^5

Run: python tools/manifest_meta_probe.py [N ...]   (defaults below;
results recorded in BASELINE.md round-9 notes).
"""

from __future__ import annotations

import json
import os
import random
import resource
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEY_LO, KEY_HI = 0, 1_000_000
ROWS_PER_FILE = 1000


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build(table_dir: str, n_files: int, inline: bool) -> dict:
    from tinymapreduce_spark.sources import manifest_sink as ms

    shutil.rmtree(table_dir, ignore_errors=True)
    t = ms.ManifestTable(table_dir)
    rng = random.Random(42)
    m = ms.BLOOM_M
    stats, files = {}, []
    for i in range(n_files):
        f = os.path.join(table_dir, "data", f"f{i:06d}", "part-000.parquet")
        files.append(f)
        # ~1/8 fill: AND of three uniform byte strings -> fpp ~ (1/8)^K
        raw = bytes(
            a & b & c
            for a, b, c in zip(
                rng.randbytes(m // 8), rng.randbytes(m // 8), rng.randbytes(m // 8)
            )
        )
        stats[f] = {
            "rows": ROWS_PER_FILE,
            "min": {"k": KEY_LO},
            "max": {"k": KEY_HI},
            "bloom": {"k": {"k": ms.BLOOM_K, "m": m, "bits": ms._bloom_unpack(raw)}},
        }
    # Set the INSTANCE attribute: ManifestTable snapshots the module
    # default into self.bloom_inline_budget at __init__, and
    # _externalize_blooms reads only the instance value — patching the
    # module global after construction silently left BOTH postures on
    # the 4 MB default (ADVICE r9 #1), so every probed size >= 10^3
    # files externalized even in the "inline" runs.
    t.bloom_inline_budget = 10**12 if inline else 0
    t0 = time.time()
    with t._commit_lock():
        t._write_manifest_locked(
            files, n_files * ROWS_PER_FILE, "k BIGINT", "probe", stats
        )
    commit_s = time.time() - t0

    man = t._manifest_path(t.current_version())
    man_mb = os.path.getsize(man) / 1e6
    side_mb = sum(
        os.path.getsize(os.path.join(t.manifest_dir, f))
        for f in os.listdir(t.manifest_dir)
        if f.endswith(".bin")
    ) / 1e6

    t0 = time.time()
    snap = t.snapshot(t.current_version())
    load_s = time.time() - t0

    t0 = time.time()
    kept = t.point_lookup_files("k", 123_457, snap=snap)
    lookup_s = time.time() - t0

    return {
        "n_files": n_files,
        "posture": "inline" if inline else "sidecar",
        "commit_s": round(commit_s, 2),
        "manifest_mb": round(man_mb, 1),
        "sidecar_mb": round(side_mb, 1),
        "snapshot_load_s": round(load_s, 3),
        "point_lookup_s": round(lookup_s, 3),
        "point_lookup_kept": len(kept),
        "rss_peak_mb": round(_rss_mb(), 0),
        "_table": t,
        "_snap": snap,
    }


def merge_plan(spark, row: dict) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from tinymapreduce_spark.sources.manifest_sink import _split_files_by_key_frame

    keys_df = spark.createDataFrame(
        [(k,) for k in (3, 77, 123457, 999999, 500000)], "k long"
    )
    t0 = time.time()
    unt, cand = _split_files_by_key_frame(
        spark, row["_snap"], "k", keys_df, KEY_LO, KEY_HI
    )
    row["merge_plan_s"] = round(time.time() - t0, 2)
    row["merge_candidates"] = len(cand)
    row["rss_peak_mb"] = round(_rss_mb(), 0)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000, 10_000, 100_000]
    from tinymapreduce_spark.session import get_spark

    spark = get_spark(app_name="manifest-meta-probe")
    base = os.path.join(REPO, ".tmp", "manifest_meta_probe")
    os.makedirs(base, exist_ok=True)
    print(
        f"{'posture':8s} {'files':>7s} {'commit':>7s} {'man MB':>8s}"
        f" {'side MB':>8s} {'load s':>7s} {'lookup s':>8s} {'kept':>5s}"
        f" {'merge s':>8s} {'cand':>5s} {'rssMB':>6s}"
    )
    for n in sizes:
        for inline in (True, False):
            if inline and n > 10_000:
                print(
                    f"{'inline':8s} {n:7d}   (skipped: projected"
                    f" ~{n * 16.4 / 1000:.0f} MB manifest JSON — the bend)"
                )
                continue
            row = build(os.path.join(base, f"t{n}_{int(inline)}"), n, inline)
            merge_plan(spark, row)
            print(
                f"{row['posture']:8s} {row['n_files']:7d} {row['commit_s']:6.1f}s"
                f" {row['manifest_mb']:8.1f} {row['sidecar_mb']:8.1f}"
                f" {row['snapshot_load_s']:7.3f} {row['point_lookup_s']:8.3f}"
                f" {row['point_lookup_kept']:5d} {row['merge_plan_s']:7.2f}s"
                f" {row['merge_candidates']:5d} {row['rss_peak_mb']:6.0f}"
            )
            shutil.rmtree(os.path.join(base, f"t{n}_{int(inline)}"), ignore_errors=True)


if __name__ == "__main__":
    main()
