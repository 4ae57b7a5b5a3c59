"""Shard controller semantics (K6) — balanced shard->group assignment with
minimal movement, per the reference spec
(``/root/reference/src/shardctrler/common.go:37-73``; invariants from
``/root/reference/src/shardctrler/test_test.go:36-53``):

- every shard assigned to a live group (group 0 = invalid/unassigned),
- balance: max shards/group - min shards/group <= 1,
- minimal movement between consecutive configs.

This is partitioning *metadata* — a tiny config table — so the rebalancer
is deterministic driver-side Python (the Spark-scale analog of dynamic
repartitioning is AQE, which the engine enables; SURVEY.md §2.4 K6). The
query form replays a command log and returns the final assignment as a
DataFrame for the rows-only correctness check.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

NSHARDS = 10  # /root/reference/src/shardctrler/common.go:21


@dataclass
class Config:
    num: int
    shards: list[int]  # shard index -> gid (0 = unassigned)
    groups: dict[int, list[str]] = field(default_factory=dict)


def _rebalance(shards: list[int], gids: list[int]) -> list[int]:
    """Deterministically rebalance so max-min <= 1 with minimal moves.

    Deterministic tie-breaks (sorted gids) make the result reproducible
    across runs — the property the reference tests rely on when diffing
    consecutive configs.
    """
    if not gids:
        return [0] * len(shards)
    gids = sorted(set(gids))
    n = len(shards)
    base, extra = divmod(n, len(gids))
    # target count per gid: first `extra` gids (sorted) get base+1.
    target = {g: base + (1 if i < extra else 0) for i, g in enumerate(gids)}
    counts = {g: 0 for g in gids}
    out = list(shards)
    # Keep shards that may stay (owner still live and under target).
    for i, g in enumerate(out):
        if g in counts and counts[g] < target[g]:
            counts[g] += 1
        else:
            out[i] = 0  # needs reassignment
    free = [i for i, g in enumerate(out) if g == 0]
    for g in gids:
        while counts[g] < target[g]:
            out[free.pop(0)] = g
            counts[g] += 1
    return out


class ShardController:
    """In-memory config chain: Join/Leave/Move/Query
    (``/root/reference/src/shardctrler/common.go:4-16``). Config 0 = all
    shards on invalid group 0, numbered densely from there."""

    def __init__(self, nshards: int = NSHARDS) -> None:
        self.configs: list[Config] = [Config(0, [0] * nshards, {})]

    def _next(self) -> tuple[list[int], dict[int, list[str]]]:
        cur = self.configs[-1]
        return list(cur.shards), dict(cur.groups)

    def join(self, servers: dict[int, list[str]]) -> None:
        shards, groups = self._next()
        groups.update(servers)
        shards = _rebalance(shards, list(groups))
        self.configs.append(Config(len(self.configs), shards, groups))

    def leave(self, gids: list[int]) -> None:
        shards, groups = self._next()
        for g in gids:
            groups.pop(g, None)
        shards = [0 if g in gids else g for g in shards]
        shards = _rebalance(shards, list(groups))
        self.configs.append(Config(len(self.configs), shards, groups))

    def move(self, shard: int, gid: int) -> None:
        shards, groups = self._next()
        shards[shard] = gid
        self.configs.append(Config(len(self.configs), shards, groups))

    def query(self, num: int = -1) -> Config:
        if num < 0 or num >= len(self.configs):
            return self.configs[-1]
        return self.configs[num]


# Deterministic demo command log for the query form (same spirit as the
# reference's TestBasic sequence, shardctrler/test_test.go:81-250).
DEMO_COMMANDS: list[tuple[str, object]] = [
    ("join", {1: ["s1a", "s1b"]}),
    ("join", {2: ["s2a"], 3: ["s3a"]}),
    ("move", (3, 1)),
    ("join", {4: ["s4a"], 5: ["s5a"]}),
    ("leave", [1]),
    ("leave", [3, 4]),
]


def shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay DEMO_COMMANDS; return the full config HISTORY as
    ``(num, shard, gid)`` rows — one row per shard per config, so the
    driver's oracle can hash-check every intermediate assignment, not
    just the final one (VERDICT r01 item 3: K6 was the lone ``no_oracle``
    row). The matching DuckDB oracle (SHARD_REBALANCE_SQL below)
    recomputes the greedy rebalance independently in pure SQL.
    """
    ctl = ShardController()
    for cmd, arg in DEMO_COMMANDS:
        if cmd == "join":
            ctl.join(arg)  # type: ignore[arg-type]
        elif cmd == "leave":
            ctl.leave(arg)  # type: ignore[arg-type]
        else:
            ctl.move(*arg)  # type: ignore[misc]
    rows = [
        (cfg.num, shard, gid)
        for cfg in ctl.configs
        for shard, gid in enumerate(cfg.shards)
    ]
    return spark.createDataFrame(rows, "num int, shard int, gid int")


def _rebalance_step_sql(step: int, prev: str, live_gids: list[int]) -> str:
    """One greedy-rebalance application as chained CTEs, against the
    previous config CTE ``prev``. Implements, in set-based SQL, exactly
    the spec the reference tests assert (test_test.go:36-53):

    - targets: sorted live gids; first ``NSHARDS % k`` get ``base+1``;
    - keep: per live gid, the first ``target`` shards in index order stay
      (= the scan-with-counter in ``_rebalance``);
    - free slots (index order) fill remaining deficits in gid order.

    The SQL derives the assignment chain itself — only the live-gid set
    per step (trivial bookkeeping over the command log) is inlined.
    """
    gids_rows = ", ".join(f"({g})" for g in sorted(live_gids))
    s = step
    return f"""
live_{s}(gid) AS (VALUES {gids_rows}),
targets_{s} AS (
  SELECT gid,
         ({NSHARDS} // (SELECT COUNT(*) FROM live_{s}))
         + CASE WHEN ROW_NUMBER() OVER (ORDER BY gid)
                     <= ({NSHARDS} % (SELECT COUNT(*) FROM live_{s}))
                THEN 1 ELSE 0 END AS target
  FROM live_{s}
),
ranked_{s} AS (
  SELECT p.shard, p.gid,
         ROW_NUMBER() OVER (PARTITION BY p.gid ORDER BY p.shard) AS rk
  FROM {prev} p JOIN targets_{s} t USING (gid)
),
kept_{s} AS (
  SELECT r.shard, r.gid FROM ranked_{s} r
  JOIN targets_{s} t USING (gid) WHERE r.rk <= t.target
),
free_{s} AS (
  SELECT shard, ROW_NUMBER() OVER (ORDER BY shard) AS pos
  FROM {prev} WHERE shard NOT IN (SELECT shard FROM kept_{s})
),
deficit_{s} AS (
  SELECT t.gid,
         t.target - COALESCE(k.cnt, 0) AS deficit,
         SUM(t.target - COALESCE(k.cnt, 0))
           OVER (ORDER BY t.gid ROWS UNBOUNDED PRECEDING) AS cum
  FROM targets_{s} t
  LEFT JOIN (SELECT gid, COUNT(*) AS cnt FROM kept_{s} GROUP BY gid) k
    USING (gid)
),
cfg_{s} AS MATERIALIZED (
  SELECT shard, gid FROM kept_{s}
  UNION ALL
  SELECT f.shard, d.gid
  FROM free_{s} f
  JOIN deficit_{s} d ON f.pos > d.cum - d.deficit AND f.pos <= d.cum
)"""


def _build_rebalance_oracle_sql(
    commands: list[tuple[str, object]] = DEMO_COMMANDS,
) -> str:
    """Compose a command-log replay as one DuckDB query: a CTE chain
    cfg_0..cfg_N (one per config), unioned into (num, shard, gid).
    Parameterized so property tests can fuzz arbitrary logs through both
    the Python controller and this SQL derivation.
    """
    ctes = [
        "cfg_0(shard, gid) AS (VALUES "
        + ", ".join(f"({i}, 0)" for i in range(NSHARDS))
        + ")"
    ]
    live: dict[int, bool] = {}
    for step, (cmd, arg) in enumerate(commands, start=1):
        prev = f"cfg_{step - 1}"
        if cmd == "join":
            for g in arg:  # type: ignore[union-attr]
                live[g] = True
            ctes.append(_rebalance_step_sql(step, prev, list(live)))
        elif cmd == "leave":
            for g in arg:  # type: ignore[union-attr]
                live.pop(g, None)
            ctes.append(_rebalance_step_sql(step, prev, list(live)))
        else:  # move(shard, gid): direct overwrite, no rebalance
            shard, gid = arg  # type: ignore[misc]
            ctes.append(
                # MATERIALIZED stops DuckDB from inlining the chain
                # (each step reads its predecessor several times —
                # un-materialized that expands exponentially in steps).
                f"cfg_{step} AS MATERIALIZED (SELECT shard, "
                f"CASE WHEN shard = {shard} THEN {gid} ELSE gid END AS gid "
                f"FROM {prev})"
            )
    union = "\nUNION ALL\n".join(
        f"SELECT {n} AS num, shard, gid FROM cfg_{n}"
        for n in range(len(commands) + 1)
    )
    return "WITH " + ",".join(ctes) + "\n" + union


SHARD_REBALANCE_SQL = _build_rebalance_oracle_sql()


# --- K6 data plane: live shard migration -----------------------------------
#
# The reference's shardkv servers are skeletons, so the controller
# semantics above are all there is to MATCH — but the data-plane analog
# (VERDICT r4 "what's missing" #5: repartition a live table under the
# new config without downtime) is exactly a lakehouse-style shard
# transfer: when config N -> N+1 reassigns a shard, ONLY that shard's
# rows change owner; everything else stays put, and at every
# intermediate step the union of all group stores is the full dataset
# (no loss, no duplication — the "live" part, pinned by
# tests/test_partitioning.py::TestShardMigration).


def config_history(commands: list[tuple[str, object]] = DEMO_COMMANDS) -> list[Config]:
    """Replay a command log; return the full config chain (the
    controller's Query(-1) history)."""
    ctl = ShardController()
    for cmd, arg in commands:
        if cmd == "join":
            ctl.join(arg)  # type: ignore[arg-type]
        elif cmd == "leave":
            ctl.leave(arg)  # type: ignore[arg-type]
        else:
            ctl.move(*arg)  # type: ignore[misc]
    return ctl.configs


def migration_ledger(data: DataFrame, configs: list[Config]) -> DataFrame:
    """The transfer ledger of migrating ``data`` (any frame with a
    ``shard`` column) through a config chain: one row per shard per
    transition where its owner changed —
    ``(num, shard, gid_from, gid_to, n_rows)``, ``num`` = the config
    the transfer installs. Transfers out of / into the invalid group 0
    appear too (initial placement, decommission) — exactly what a
    shardkv group would ship.

    Scale shape: per-shard sizes come from ONE hash aggregation over the
    data (the only shuffle, and at 100 TB the table would already be
    bucketed by shard so it collapses to a map-side count); the config
    diff is a broadcast-joined KB-sized dim, so the ledger costs the
    same whether the table is 60 k rows or 100 TB."""
    from pyspark.sql import functions as F

    spark = data.sparkSession
    moves = [
        (cur.num, shard, prev.shards[shard], cur.shards[shard])
        for prev, cur in zip(configs, configs[1:])
        for shard in range(len(cur.shards))
        if prev.shards[shard] != cur.shards[shard]
    ]
    moves_df = spark.createDataFrame(
        moves, "num int, shard int, gid_from int, gid_to int"
    )
    # shards with zero rows still transfer (a shard is a namespace, not
    # its contents) — left join + zero fill
    sizes = data.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt"))
    return moves_df.join(F.broadcast(sizes), "shard", "left").select(
        "num",
        "shard",
        "gid_from",
        "gid_to",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_rows"),
    )


def shard_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6's data plane as a driver-checked query: route the derived KV
    ops log through ``key2shard``, replay DEMO_COMMANDS, and emit the
    full transfer ledger. The oracle re-derives the config chain with
    the set-based rebalance CTEs (the shard_rebalance machinery), diffs
    consecutive configs with a window lag, and joins per-shard op
    counts computed from the same log derivation — so a wrong
    rebalance, a missed transfer, or a count that moved rows it should
    not have all flip the hash."""
    from tinymapreduce_spark.functions.hashing import key2shard
    from tinymapreduce_spark.operators.kv import ops_log

    data = ops_log(spark, sf_dir).withColumn("shard", key2shard("key"))
    return migration_ledger(data, config_history())


def _build_migration_oracle_sql() -> str:
    """Transfer-ledger oracle: the rebalance chain (shared CTE builder)
    → lag-diff per shard → join per-shard counts from the ops-log
    derivation (first-byte-mod-10 hash, as shard_distribution)."""
    from tinymapreduce_spark.operators.kv import OPS_LOG_SQL

    chain = _build_rebalance_oracle_sql()
    # reuse the chain's WITH body and union selector as a subquery
    return f"""
WITH history AS MATERIALIZED (
  {chain.replace("WITH ", "WITH ", 1)}
),
moves AS (
  SELECT num, shard,
         LAG(gid) OVER (PARTITION BY shard ORDER BY num) AS gid_from,
         gid AS gid_to
  FROM history
  QUALIFY gid_from IS NOT NULL AND gid_from <> gid_to
),
ops AS ({OPS_LOG_SQL}),
sizes AS (
  SELECT CAST(CASE WHEN length(key) > 0
              THEN ascii(substr(key, 1, 1)) % 10 ELSE 0 END AS INT) AS shard,
         COUNT(*) AS cnt
  FROM ops GROUP BY 1
)
SELECT m.num, m.shard, m.gid_from, m.gid_to,
       CAST(COALESCE(s.cnt, 0) AS BIGINT) AS n_rows
FROM moves m LEFT JOIN sizes s USING (shard)
"""


SHARD_MIGRATION_SQL = _build_migration_oracle_sql()
