"""Stateful streaming under the RocksDB state store provider.

A real cluster does not run the default HDFSBackedStateStoreProvider's
in-heap HashMaps for large state — it runs RocksDB (off-heap, on-disk,
changelog-checkpointed). Reference analog: the crash/restart matrix of
`src/kvraft/test_test.go:212-388` exercises the KV service on its real
persistence path; this suite does the same for the stream tier's state
backend. The FULL stream-tier oracle lap under
`SPARK_GRAFT_STATE_STORE=rocksdb` is recorded in BASELINE.md (round-7
notes); here a representative stateful subset — keyed aggregation
(flatMapGroupsWithState-backed KV fold), session windows, watermarked
dedup, and a stream-stream join — must produce byte-identical results
under both providers inside one suite run.

The provider class is a per-query conf read at stream start, so the
fixture flips `spark.sql.streaming.stateStore.providerClass` at runtime
and restores the session default afterwards.
"""

from __future__ import annotations

import pytest

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_conf(spark):
    prev = spark.conf.get(CONF)
    spark.conf.set(CONF, ROCKSDB)
    try:
        yield
    finally:
        spark.conf.set(CONF, prev)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# (name, callable) pairs resolved lazily so import stays cheap
def _stateful_ops():
    from tinymapreduce_spark.streaming import state as stream_state
    from tinymapreduce_spark.streaming import windows as stream_windows

    return [
        ("stream_kv_state", stream_state.stream_kv_state),
        ("stream_kv_dedup", stream_state.stream_kv_dedup),
        ("stream_session_window", stream_state.stream_session_window),
        ("stream_dedup_within_watermark", stream_state.stream_dedup_within_watermark),
        ("stream_stream_join", stream_windows.stream_stream_join),
        ("stream_tumbling_window", stream_windows.stream_tumbling_window),
    ]


@pytest.mark.parametrize("name", [n for n, _ in _stateful_ops()])
def test_stateful_op_matches_default_provider(spark, sf_dir, name, rocksdb_conf):
    fn = dict(_stateful_ops())[name]
    assert spark.conf.get(CONF) == ROCKSDB
    got = _rows(fn(spark, sf_dir))
    # re-run under the session-default provider for the parity side
    spark.conf.set(CONF, spark.sparkContext.getConf().get(CONF))
    want = _rows(fn(spark, sf_dir))
    assert got == want
    assert len(got) > 0


def test_rocksdb_provider_actually_loads(spark, sf_dir, rocksdb_conf):
    """Guard against silent fallback: the conf must be visible to the
    query, and a stateful query must complete under it (RocksDB JNI is
    bundled with Spark — a missing native lib would fail the first
    state store open, not silently revert)."""
    from tinymapreduce_spark.streaming import state as stream_state

    assert spark.conf.get(CONF) == ROCKSDB
    out = stream_state.stream_dedup(spark, sf_dir)
    assert out.count() > 0
