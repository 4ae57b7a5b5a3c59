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
# An associative+commutative fold on the VALUE domain: merge(k, vs) must
# equal merge(k, [merge(k, any_partition_of(vs))...]) — the contract that
# makes map-side combining legal (Hadoop's Combiner, Spark's partial agg).
MergeF = Callable[[str, list[str]], str]

KV_SCHEMA = "key string, value string"


def run_mapreduce(
    df: DataFrame,
    mapf: MapF,
    reducef: ReduceF | None = None,
    num_partitions: int | None = None,
    key_col: str = "filename",
    value_col: str = "contents",
    merge: MergeF | None = None,
) -> DataFrame:
    """Run a classic (mapf, reducef) job over a 2-column DataFrame.

    ``df`` rows play the role of input splits: ``mapf(key, value)`` is
    called once per row and may emit any number of (key, value) pairs,
    exactly like ``Map(filename, contents)``
    (``/root/reference/src/mrapps/wc.go:21``).

    Skew posture: with plain ``reducef`` every value of one key
    materializes in one Arrow batch (the reference has the same shape —
    one reduce call sees all values). When the reduce is an associative
    fold, pass ``merge`` instead: each map-side Arrow batch pre-folds
    its keys to ONE partial before the shuffle, so a hot key ships
    ~one value per map batch rather than one per occurrence, and the
    final fold sees a bounded list. ``merge`` replaces ``reducef`` at
    both levels (a combiner must be merge-compatible with itself, which
    the raw reference signature — e.g. wc's len(values) — is not).
    """
    if (reducef is None) == (merge is None):
        raise ValueError("exactly one of reducef / merge is required")

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

    if merge is not None:
        # Map-side combine: fold each batch's keys to one partial each.
        # Chains in the SAME stage as map_stage (narrow mapInPandas), so
        # the shuffle input shrinks from one row per emit to one row per
        # (batch, distinct key) — the partial-aggregation shape Catalyst
        # gives built-in aggregates, reproduced for arbitrary Python
        # folds. Memory is bounded by one Arrow batch.
        def combine_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    yield pdf
                    continue
                folded = (
                    pdf.groupby("key", sort=False)["value"]
                    .apply(lambda s: merge(s.name, sorted(s.tolist())))
                    .reset_index()
                )
                yield folded

        kv = kv.mapInPandas(combine_stage, schema=KV_SCHEMA)

    if num_partitions:
        # Explicit R, mirroring nReduce (/root/reference/src/main/mrcoordinator.go:23).
        # Left unset, AQE sizes the shuffle — the right default at scale.
        kv = kv.repartition(num_partitions, "key")

    final = merge if merge is not None else reducef

    def reduce_stage(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        # Reference sorts the whole partition then scans groups
        # (worker.go:158-183); sorting values here gives reducef the same
        # deterministic value order the sequential oracle sees.
        values = sorted(pdf["value"].tolist())
        return pd.DataFrame({"key": [key], "value": [final(key, values)]})

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


def wc_merge(_key: str, values: list[str]) -> str:
    """wc as an associative fold: values are decimal partial counts
    (map emits "1"s), merging = integer sum. Unlike ``wc_reduce``
    (len(values)), this is merge-compatible with itself, so it can run
    as a map-side combiner AND the final fold."""
    return str(sum(int(v) for v in values))
