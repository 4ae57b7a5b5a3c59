"""Explicit partition/sort operators — SURVEY.md §2.2 D2/D3 as
first-class, composable surface.

The reference hard-wires hash-partition (FNV-1a mod R,
``/root/reference/src/mr/worker.go:38-42,98-101``) and a full per-partition
sort (``worker.go:19-24,158``). Spark's equivalents are planner
primitives; these wrappers exist so a reference user has the explicit
operators, and so tests can certify their guarantees (bucket = hash mod
R, runs sorted within every partition).

FNV-1a itself is intentionally NOT reproduced: no reference test observes
bucket layout (outputs are unioned before compare,
``/root/reference/src/main/test-mr.sh:93``), and Murmur3 inside the JVM
avoids a Python round-trip per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_partition(df: DataFrame, num_partitions: int, *cols: str) -> DataFrame:
    """D2 — shuffle ``df`` into ``num_partitions`` buckets by hash of
    ``cols``. All rows with equal keys land in the same partition
    (certified by tests/test_partitioning.py)."""
    return df.repartition(num_partitions, *[F.col(c) for c in cols])


def sorted_runs(df: DataFrame, num_partitions: int, *cols: str) -> DataFrame:
    """D2+D3 — hash-partition then sort within each partition, the
    reference's reduce-input layout (sorted runs per bucket). This is
    Spark's ``repartition(...).sortWithinPartitions(...)``, which plans a
    single exchange + per-partition sort (no global sort barrier)."""
    return hash_partition(df, num_partitions, *cols).sortWithinPartitions(*cols)
