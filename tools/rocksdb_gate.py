"""Standing closing gate: the full stream tier under the RocksDB state
store (VERDICT r7 #6 — promoted from the one-off r6/r7 lap to a
per-round gate).

A real cluster runs RocksDBStateStoreProvider for large state (off-heap,
on-disk, changelog-checkpointed), not the default in-heap HashMaps; this
gate re-verifies every `stream_*` registry key against its DuckDB oracle
at sf0.01 with `SPARK_GRAFT_STATE_STORE=rocksdb` exported before the
session builds, so ALL streaming queries — stateful or not — run their
state machinery on the production backend.

Run:  SPARK_GRAFT_STATE_STORE=rocksdb python tools/rocksdb_gate.py
      (refuses to run if the env var is not set — the provider is a
      session-build conf, not a per-query one here)

Prints one `name MATCH|MISMATCH rows` line per key plus a JSON summary;
record the summary in BASELINE.md's round notes. The in-suite twin
(tests/test_streaming_rocksdb.py) pins a 6-op stateful subset under the
runtime-flipped conf on every pytest run; this gate is the full-tier
oracle sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")


def _frames_equal(a, b) -> bool:
    """Value-tolerant frame compare, mirroring
    tests/test_oracle_parity.py::_values_equal (ADVICE r8: the previous
    dtype-strict DataFrame.equals flagged int32-vs-int64 / NaN-repr
    differences between Spark and DuckDB as spurious MISMATCH lines)."""
    import math

    import pandas as pd

    def values_equal(x, y) -> bool:
        if x is None and y is None:
            return True
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                return True
            return x == y
        try:
            if pd.isna(x) and pd.isna(y):
                return True
        except (TypeError, ValueError):
            pass
        return x == y

    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for col in a.columns:
        for x, y in zip(a[col].tolist(), b[col].tolist()):
            if not values_equal(x, y):
                return False
    return True


def main() -> None:
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() != "rocksdb":
        sys.exit(
            "refusing: export SPARK_GRAFT_STATE_STORE=rocksdb first "
            "(the provider is read at session build)"
        )

    import duckdb

    import __spark_entry__ as mod
    from tinymapreduce_spark.session import get_spark
    from tinymapreduce_spark.sources.loaders import TABLES

    spark = get_spark(app_name="rocksdb-gate")
    provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    assert "RocksDB" in provider, provider

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    q, o = mod.queries(), mod.oracle_sql()
    # stream_* plus the stream-adjacent keys the r7 one-off lap covered:
    # the custom streaming DataSource sink and the State Data Source read
    stream_keys = sorted(
        k
        for k in q
        if k.startswith("stream_") or k in ("custom_stream_sink", "state_store_read")
    )
    t_start = time.monotonic()
    n_match = 0
    mismatches: list[str] = []
    for name in stream_keys:
        pdf = q[name](spark, SF).toPandas()
        b = con.execute(o[name]).df()
        a = pdf.reindex(sorted(pdf.columns), axis=1).sort_values(
            by=sorted(pdf.columns), ignore_index=True
        )
        b = b.reindex(sorted(b.columns), axis=1).sort_values(
            by=sorted(b.columns), ignore_index=True
        )
        ok = _frames_equal(a, b)
        print(name, "MATCH" if ok else "MISMATCH", len(a), flush=True)
        if ok:
            n_match += 1
        else:
            mismatches.append(name)
    print(
        json.dumps(
            {
                "metric": "rocksdb_stream_tier_gate",
                "provider": "rocksdb",
                "sf": SF,
                "n_keys": len(stream_keys),
                "n_match": n_match,
                "mismatches": mismatches,
                "wall_s": round(time.monotonic() - t_start, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
