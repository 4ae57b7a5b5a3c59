"""Concurrent query submission on ONE shared SparkSession.

A 1000-executor deployment serves many queries at once from a shared
session/context (notebook users, a query service, scheduled jobs) —
Spark's scheduler interleaves their jobs. Engine-level property pinned
here: registry operators are safe to run CONCURRENTLY — no shared
mutable driver state (temp-view name collisions, session-conf
mutations, cached-plan cross-talk) corrupts results — and every
concurrent result is bit-identical to its sequential run.

Representatives span the risk surface: view-registering SQL queries,
decimal-fold aggregation, md5-tie-break sampling, Arrow/pandas UDF
stages, and the iterative perceptron (driver-loop + collect during
other queries' jobs).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

CONCURRENT = [
    "word_count",
    "q1_pricing_summary",
    "sql_interface",
    "sorted_group_concat",
    "deterministic_sample",
    "token_stats",
    "arrow_text_stats",
    "perceptron_quality",
    # fourth-session surface: register-table sketch algebra, manifest
    # commits under overlapping load (idempotent snapshot ids + the
    # commit lock make the same-table race safe), integer window quotas
    "hll_overlap",
    "manifest_skipping_scan",
    "token_budget_mix",
]


def _rows(spark, name):
    return sorted(
        tuple(r) for r in entrymod.queries()[name](spark, SF_DIR).collect()
    )


def test_concurrent_results_equal_sequential(spark):
    sequential = {n: _rows(spark, n) for n in CONCURRENT}
    with ThreadPoolExecutor(max_workers=len(CONCURRENT)) as pool:
        futures = {n: pool.submit(_rows, spark, n) for n in CONCURRENT}
        concurrent = {n: f.result(timeout=600) for n, f in futures.items()}
    for n in CONCURRENT:
        assert concurrent[n] == sequential[n], f"{n} diverged under concurrency"
