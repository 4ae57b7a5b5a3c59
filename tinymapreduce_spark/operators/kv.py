"""Keyed-state (KV) semantics as data — SURVEY.md §2.4.

The reference *specifies* (servers are skeletons) a linearizable
string->string store with Get/Put/Append where state = fold of committed
ops in log order (``/root/reference/src/models/kv.go:40-54``; ordered
apply stream ``/root/reference/src/raft/raft.go:897-918``). The
query-visible semantics: value(key) = concatenation, in log order, of the
appends after the last put (missing key reads as "").

``kv_replay`` certifies K1-K4 in batch form with a single window + single
aggregation — two shuffles on ``key`` total, and Catalyst reuses the
partitioning between them. This is the DuckDB-checkable form (SURVEY.md
§2.4 K4).

The ops log itself is derived deterministically from the ``events`` table
(the driver testdata has no kv_ops fixture) — same derivation in the SQL
oracle, so both engines replay the identical log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tinymapreduce_spark.functions.hashing import key2shard
from tinymapreduce_spark.sources.loaders import load_table

# Shared Spark/DuckDB derivation of an ops log from `events`:
# seq = event_id (dense, unique — stands in for the Raft commit index),
# key = one of 20 keys whose FIRST byte varies (a..t) so key2shard's
#       first-byte hash actually spreads them across all 10 shards,
# op  = signup->put, click/view/purchase->append, error->get,
# value = 'x <user_id> <event_id> y'   (the kvraft test value shape,
#         /root/reference/src/kvraft/test_test.go:275).
OPS_LOG_SQL = """
SELECT
  event_id AS seq,
  substr('abcdefghijklmnopqrst', CAST(user_id % 20 AS INT) + 1, 1)
    || CAST(user_id % 20 AS VARCHAR) AS key,
  CASE event_type
    WHEN 'signup' THEN 'put'
    WHEN 'error' THEN 'get'
    ELSE 'append'
  END AS op,
  'x ' || CAST(user_id AS VARCHAR) || ' ' || CAST(event_id AS VARCHAR) || ' y' AS value
FROM events
"""


# Batch-replay oracle (K4) — also the oracle for the streaming state form
# (streaming/state.py): replaying the full log must equal the batch fold.
KV_REPLAY_SQL = f"""
WITH ops AS ({OPS_LOG_SQL}),
writes AS (
  SELECT *, MAX(CASE WHEN op = 'put' THEN seq END)
            OVER (PARTITION BY key) AS last_put_seq
  FROM ops WHERE op <> 'get'
),
live AS (
  SELECT * FROM writes
  WHERE (op = 'put' AND seq = last_put_seq)
     OR (op = 'append' AND (last_put_seq IS NULL OR seq > last_put_seq))
)
SELECT key, string_agg(value, '' ORDER BY seq) AS value
FROM live GROUP BY key
"""


def ops_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("seq"),
        F.concat(
            F.substring(F.lit("abcdefghijklmnopqrst"), (F.col("user_id") % 20).cast("int") + 1, 1),
            (F.col("user_id") % 20).cast("string"),
        ).alias("key"),
        F.when(F.col("event_type") == "signup", F.lit("put"))
        .when(F.col("event_type") == "error", F.lit("get"))
        .otherwise(F.lit("append"))
        .alias("op"),
        F.concat_ws(
            " ", F.lit("x"), F.col("user_id").cast("string"), F.col("event_id").cast("string"), F.lit("y")
        ).alias("value"),
    )


def kv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 — final state per key after replaying the full ops log.

    value(key) = (value of last put, if any) || appends with seq > last
    put's seq, concatenated in seq order. Keys that only ever saw gets
    don't appear (a get neither creates state nor changes it; missing
    key reads as "" — ``/root/reference/src/kvraft/client.go:28-31``).
    """
    return replay_ops(ops_log(spark, sf_dir))


def replay_ops(ops: DataFrame) -> DataFrame:
    """Fold an arbitrary ``(seq, key, op, value)`` log into final state —
    the reusable K4 core (kv_replay applies it to the derived log;
    property tests apply it to random logs)."""
    writes = ops.where(F.col("op") != "get")
    w = Window.partitionBy("key")
    writes = writes.withColumn(
        "last_put_seq", F.max(F.when(F.col("op") == "put", F.col("seq"))).over(w)
    )
    live = writes.where(
        ((F.col("op") == "put") & (F.col("seq") == F.col("last_put_seq")))
        | (
            (F.col("op") == "append")
            & (F.col("last_put_seq").isNull() | (F.col("seq") > F.col("last_put_seq")))
        )
    )
    # array_sort on struct(seq, value) orders by seq; transform projects the
    # values back out — ordered concat entirely in codegen, no UDF.
    return live.groupBy("key").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "value"))), lambda s: s["value"]
            ),
            "",
        ).alias("value")
    )


def shard_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 — key2shard routing (``/root/reference/src/shardkv/client.go:22-29``)
    as an aggregate: ops per shard over the derived log. Certifies the
    first-byte-mod-10 hash against the SQL oracle."""
    ops = ops_log(spark, sf_dir)
    return (
        ops.withColumn("shard", key2shard("key"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.countDistinct("key").alias("n_keys"),
        )
    )
