"""Generic MapReduce compatibility surface — the reference's whole engine
is one UDTF (Map) + one UDAF (Reduce) over (key, value) string pairs
(``/root/reference/src/mr/worker.go:47-48``; SURVEY.md §2.2 D1-D5).

``run_mapreduce`` reproduces that contract on Spark:

  map stage    -> ``mapInPandas``   (Arrow-batched UDTF: 0..n KV pairs out)
  shuffle      -> ``repartition(R, "key")``   (D2; Murmur3 replaces FNV-1a —
                  output-equivalent, see functions/hashing.py)
  sort+group   -> ``applyInPandas`` grouped map (D3+D4; Spark sorts/groups
                  shuffle-side, the pandas group IS the (key, [values]) unit)
  reduce stage -> user ``reducef(key, values) -> str`` (D5)

The phase barrier (D6, ``/root/reference/src/mr/coordinator.go:88-95``) is
the shuffle stage boundary; straggler re-execution and exactly-once output
(D7) are Spark's speculation + task-commit protocol.

Scale notes: ``collect_list``-free — values for one key materialize only
inside the Arrow batch of that group, same memory shape as the reference's
reduce call. Skewed keys are the known limit (documented in SURVEY.md
§7.5 item 1); built-in aggregations (operators/reference_queries.py) are
the fast path and this shim exists for UDF parity.
"""

from __future__ import annotations

import sys
from collections.abc import Callable, Iterable, Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame

# UDFs defined here must work even when the executor Python can't import
# this package (the driver may run us via sys.path, which workers don't
# inherit) — serialize this module's functions by value, not reference.
cloudpickle.register_pickle_by_value(sys.modules[__name__])

MapF = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceF = Callable[[str, list[str]], str]

KV_SCHEMA = "key string, value string"


def run_mapreduce(
    df: DataFrame,
    mapf: MapF,
    reducef: ReduceF,
    num_partitions: int | None = None,
    key_col: str = "filename",
    value_col: str = "contents",
) -> DataFrame:
    """Run a classic (mapf, reducef) job over a 2-column DataFrame.

    ``df`` rows play the role of input splits: ``mapf(key, value)`` is
    called once per row and may emit any number of (key, value) pairs,
    exactly like ``Map(filename, contents)``
    (``/root/reference/src/mrapps/wc.go:21``).
    """

    def map_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_k: list[str] = []
            out_v: list[str] = []
            for k, v in zip(pdf[key_col], pdf[value_col]):
                for ok, ov in mapf(k, v):
                    out_k.append(ok)
                    out_v.append(ov)
            yield pd.DataFrame({"key": out_k, "value": out_v})

    kv = df.select(key_col, value_col).mapInPandas(map_stage, schema=KV_SCHEMA)

    if num_partitions:
        # Explicit R, mirroring nReduce (/root/reference/src/main/mrcoordinator.go:23).
        # Left unset, AQE sizes the shuffle — the right default at scale.
        kv = kv.repartition(num_partitions, "key")

    def reduce_stage(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        # Reference sorts the whole partition then scans groups
        # (worker.go:158-183); sorting values here gives reducef the same
        # deterministic value order the sequential oracle sees.
        values = sorted(pdf["value"].tolist())
        return pd.DataFrame({"key": [key], "value": [reducef(key, values)]})

    return kv.groupBy("key").applyInPandas(reduce_stage, schema=KV_SCHEMA)


# --- The reference's bundled MR applications, as (mapf, reducef) pairs ----


def wc_map(_filename: str, contents: str) -> Iterable[tuple[str, str]]:
    """Tokenize on non-letter runs (``/root/reference/src/mrapps/wc.go:21-34``)."""
    import re

    for w in re.split(r"[^A-Za-z]+", contents):
        if w:
            yield (w, "1")


def wc_reduce(_key: str, values: list[str]) -> str:
    """Count occurrences (``/root/reference/src/mrapps/wc.go:41-44``)."""
    return str(len(values))
