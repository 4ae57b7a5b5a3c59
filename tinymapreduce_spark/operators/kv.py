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
#         /root/reference/src/kvraft/test_test.go:275),
# client_id/op_id = the at-least-once identity a kvraft client stamps on
#         every RPC so the server can suppress duplicate deliveries
#         (/root/reference/src/kvraft/test_test.go:138-155).
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
  'x ' || CAST(user_id AS VARCHAR) || ' ' || CAST(event_id AS VARCHAR) || ' y' AS value,
  user_id AS client_id,
  event_id AS op_id
FROM events
"""

# Retried deliveries land at a later commit index than the original —
# any constant above max(seq) keeps retry seqs unique and strictly later.
RETRY_SEQ_OFFSET = 1 << 40


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
        F.col("user_id").alias("client_id"),
        F.col("event_id").alias("op_id"),
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


def dedup_client_ops(ops: DataFrame) -> DataFrame:
    """Duplicate-request suppression — the kvraft at-least-once contract
    ("appends from one client appear exactly once" under RPC retry,
    ``/root/reference/src/kvraft/test_test.go:138-155``): of all
    deliveries sharing a (client_id, op_id), only the FIRST committed one
    (min seq) applies; later re-deliveries are retries of an op the
    state machine already executed.

    One shuffle on (client_id, op_id); at 100 TB the dedup key is the
    natural partitioner for an ops feed, so this co-locates with any
    upstream per-client bucketing."""
    w = Window.partitionBy("client_id", "op_id").orderBy("seq")
    return (
        ops.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def with_retries(ops: DataFrame) -> DataFrame:
    """At-least-once delivery twin of a log: every op whose op_id ≡ 0
    (mod 7) is re-delivered once at ``seq + RETRY_SEQ_OFFSET`` — same
    (client_id, op_id, key, op, value), later commit index, exactly the
    shape a timed-out-then-retried kvraft RPC leaves in the log."""
    retries = ops.where(F.col("op_id") % 7 == 0).withColumn(
        "seq", F.col("seq") + F.lit(RETRY_SEQ_OFFSET)
    )
    return ops.unionByName(retries)


def kv_replay_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3's exactly-once face: replay the derived log under at-least-once
    delivery (planted retries) THROUGH the duplicate-suppression rung —
    the final state must equal the clean-log replay, which is what the
    SQL oracle (replaying retries + dedup + fold) certifies."""
    return replay_ops(dedup_client_ops(with_retries(ops_log(spark, sf_dir))))


def snapshot_state(ops: DataFrame, cut: DataFrame) -> DataFrame:
    """State snapshot at a cut: the K4 fold of the log prefix
    (seq <= cut_seq) — the analog of the Raft snapshot a server installs
    before replaying its remaining suffix
    (``/root/reference/src/raft/raft.go:54-57``, apply loop ``:897-918``).
    ``cut`` is a 1-row (cut_seq) frame so the threshold never leaves the
    cluster (no driver collect)."""
    prefix = (
        ops.crossJoin(F.broadcast(cut))
        .where(F.col("seq") <= F.col("cut_seq"))
        .select("seq", "key", "op", "value")
    )
    return replay_ops(prefix)


def replay_from_snapshot(ops: DataFrame, cut: DataFrame) -> DataFrame:
    """Log-compaction replay: fold the prefix into a snapshot, then
    replay ONLY the suffix over it. A snapshot entry is semantically a
    put at the cut index (later puts override it, appends concatenate
    onto it), so the suffix replay reuses ``replay_ops`` unchanged —
    and the result must equal the full-log fold (the oracle is
    ``KV_REPLAY_SQL`` itself)."""
    snap_ops = (
        snapshot_state(ops, cut)
        .crossJoin(F.broadcast(cut))
        .select(
            F.col("cut_seq").alias("seq"),
            "key",
            F.lit("put").alias("op"),
            "value",
        )
    )
    suffix = (
        ops.crossJoin(F.broadcast(cut))
        .where(F.col("seq") > F.col("cut_seq"))
        .select("seq", "key", "op", "value")
    )
    return replay_ops(snap_ops.unionByName(suffix))


def kv_snapshot_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 under log compaction: snapshot(prefix at max(seq)/2) + replay
    of the suffix == replay of the full log. The oracle replays the FULL
    log (``KV_REPLAY_SQL``), so a driver hash match IS the proof that
    compaction loses nothing."""
    ops = ops_log(spark, sf_dir)
    cut = ops.agg(F.floor(F.max("seq") / 2).cast("long").alias("cut_seq"))
    return replay_from_snapshot(ops, cut)


# Oracle for kv_replay_dedup: re-deliver, suppress, then the K4 fold —
# the dedup rung replays in SQL so a broken first-win rule hash-fails.
KV_REPLAY_DEDUP_SQL = f"""
WITH ops0 AS ({OPS_LOG_SQL}),
dup AS (
  SELECT * FROM ops0
  UNION ALL
  SELECT seq + {RETRY_SEQ_OFFSET} AS seq, key, op, value, client_id, op_id
  FROM ops0 WHERE op_id % 7 = 0
),
ops AS (
  SELECT seq, key, op, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY client_id, op_id ORDER BY seq) AS rn
    FROM dup
  ) WHERE rn = 1
),
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
