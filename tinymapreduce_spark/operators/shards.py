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
    """Replay DEMO_COMMANDS; return (shard, gid) of the final config.

    No SQL oracle (iterative algorithm — rows-only check); the invariants
    are asserted by tests/test_shards.py instead.
    """
    ctl = ShardController()
    for cmd, arg in DEMO_COMMANDS:
        if cmd == "join":
            ctl.join(arg)  # type: ignore[arg-type]
        elif cmd == "leave":
            ctl.leave(arg)  # type: ignore[arg-type]
        else:
            ctl.move(*arg)  # type: ignore[misc]
    final = ctl.query()
    rows = [(i, g) for i, g in enumerate(final.shards)]
    return spark.createDataFrame(rows, "shard int, gid int")
