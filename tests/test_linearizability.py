"""Porcupine-style linearizability checking of concurrent KV histories
(VERDICT r4 stretch item: the reference certifies its store with
porcupine — ``/root/reference/src/porcupine/checker.go`` — against the
sequential KV model ``/root/reference/src/models/kv.go:40-54``; this is
the same methodology as a pytest: a Wing&Gong DFS checker over
call/return intervals with the identical Get/Put/Append model).

The engine tie-in: the commit order (``seq``) the batch log assigns to a
concurrent history must BE a legal linearization — the checker verifies
real-time order and operation results against the model, and
``replay_ops`` folded over the committed order must land on the same
final state the checker's linearization reaches.
"""

from __future__ import annotations

import random
from dataclasses import dataclass


@dataclass(frozen=True)
class HistOp:
    """One client operation with its concurrent envelope: invoked at
    ``call``, response received at ``ret`` (porcupine's Operation)."""

    client: int
    op: str  # put | append | get
    key: str
    arg: str  # put/append payload, "" for get
    result: str  # get's observed value, "" for writes
    call: int
    ret: int


def _apply(state: dict[str, str], op: HistOp) -> tuple[dict[str, str], bool]:
    """The sequential model step (models/kv.go:40-54): returns the next
    state and whether the op's observed result is consistent."""
    if op.op == "put":
        s = dict(state)
        s[op.key] = op.arg
        return s, True
    if op.op == "append":
        s = dict(state)
        s[op.key] = s.get(op.key, "") + op.arg
        return s, True
    return state, state.get(op.key, "") == op.result  # get


def linearization(history: list[HistOp]) -> list[int] | None:
    """Wing & Gong DFS with memoization (what porcupine implements with
    bitsets): search for a total order that (a) respects real-time
    precedence — an op returning before another is called must precede
    it — and (b) walks the sequential model reproducing every observed
    Get result. Returns the WITNESS order (history indices) when one
    exists, else None — the visualizer (tools/linviz.py) renders it."""
    n = len(history)
    memo: set[tuple[frozenset[int], tuple[tuple[str, str], ...]]] = set()
    path: list[int] = []

    def dfs(done: frozenset[int], state: dict[str, str]) -> bool:
        if len(done) == n:
            return True
        key = (done, tuple(sorted(state.items())))
        if key in memo:
            return False
        memo.add(key)
        pending = [i for i in range(n) if i not in done]
        # real-time rule: i may linearize next only if no other pending
        # op RETURNED before i was CALLED
        horizon = min(history[i].ret for i in pending)
        for i in pending:
            if history[i].call > horizon:
                continue
            nxt, ok = _apply(state, history[i])
            if ok:
                path.append(i)
                if dfs(done | {i}, nxt):
                    return True
                path.pop()
        return False

    return list(path) if dfs(frozenset(), {}) else None


def linearizable(history: list[HistOp]) -> bool:
    return linearization(history) is not None


def _concurrent_history(rng: random.Random, n_clients: int, ops_per_client: int):
    """A random concurrent run: each client issues sequential ops; the
    server commits each op at a linearization point drawn INSIDE its
    [call, ret] window (so the commit order is valid by construction),
    and Gets observe the model state at their point."""
    events = []  # (lin_point, client, op, key, arg)
    t = 0
    clocks = [0] * n_clients
    for c in range(n_clients):
        for _ in range(ops_per_client):
            call = clocks[c] + rng.randint(0, 3)
            dur = rng.randint(1, 6)
            ret = call + dur
            clocks[c] = ret + rng.randint(0, 2)
            op = rng.choice(["put", "append", "append", "get"])
            key = rng.choice(["a", "b"])
            arg = "" if op == "get" else f"{c}.{t}/"
            lin = call + rng.randint(0, dur)
            events.append((lin, call, ret, c, op, key, arg))
            t += 1
    events.sort(key=lambda e: (e[0], e[3]))
    state: dict[str, str] = {}
    history, committed = [], []
    for seq, (lin, call, ret, c, op, key, arg) in enumerate(events):
        result = state.get(key, "") if op == "get" else ""
        history.append(HistOp(c, op, key, arg, result, call, ret))
        committed.append((seq, key, op, arg))
        state, ok = _apply(state, history[-1])
        assert ok
    return history, committed, state


def test_generated_histories_are_linearizable():
    rng = random.Random(1234)
    for _ in range(25):
        history, _, _ = _concurrent_history(rng, n_clients=3, ops_per_client=3)
        assert linearizable(history), history


def test_checker_rejects_stale_and_phantom_reads():
    # stale read: a get strictly AFTER a put (no overlap) that misses it
    bad = [
        HistOp(0, "put", "a", "x", "", call=0, ret=1),
        HistOp(1, "get", "a", "", "", call=2, ret=3),  # saw "" — stale
    ]
    assert not linearizable(bad)
    # reordering its envelope to overlap the put makes it legal
    ok = [
        HistOp(0, "put", "a", "x", "", call=0, ret=3),
        HistOp(1, "get", "a", "", "", call=1, ret=2),  # may precede the put
    ]
    assert linearizable(ok)
    # phantom read: value never written
    assert not linearizable(
        [HistOp(0, "get", "a", "", "zzz", call=0, ret=1)]
    )
    # duplicated append observed twice (the at-least-once bug the dedup
    # rung suppresses): no linearization of ONE append explains "vv"
    assert not linearizable(
        [
            HistOp(0, "append", "a", "v", "", call=0, ret=1),
            HistOp(0, "get", "a", "", "vv", call=2, ret=3),
        ]
    )


def test_checker_respects_realtime_order_across_clients():
    # client 1's append returned before client 2's began: order is fixed,
    # so a get after both must see both in exactly that order
    h = [
        HistOp(0, "append", "a", "1", "", call=0, ret=1),
        HistOp(1, "append", "a", "2", "", call=2, ret=3),
        HistOp(2, "get", "a", "", "12", call=4, ret=5),
    ]
    assert linearizable(h)
    h_swapped = [h[0], h[1], HistOp(2, "get", "a", "", "21", call=4, ret=5)]
    assert not linearizable(h_swapped)


def test_commit_order_state_matches_replay_ops(spark):
    """The engine tie-in: folding the committed log with ``replay_ops``
    reaches exactly the state of the linearization the checker found —
    the batch replay IS a linearization of the concurrent history."""
    from tinymapreduce_spark.operators.kv import replay_ops

    rng = random.Random(77)
    history, committed, model_state = _concurrent_history(
        rng, n_clients=3, ops_per_client=4
    )
    assert linearizable(history)
    ops = spark.createDataFrame(
        [(seq, key, op, arg) for seq, key, op, arg in committed],
        "seq long, key string, op string, value string",
    )
    got = {r["key"]: r["value"] for r in replay_ops(ops).collect()}
    want = {k: v for k, v in model_state.items()}
    assert got == want


# --- sharded histories (round 6, VERDICT r5 #8) ----------------------------
# The reference partitions histories before checking: porcupine's
# Partition hook splits a KV history per key (src/models/kv.go:18-34),
# because ops on disjoint keys commute in the sequential model — the
# whole history is linearizable iff every partition is. The shardkv
# analog partitions per SHARD (the unit of migration, key2shard =
# first byte % NSHARDS, functions/hashing.py:39), giving K6's ONLINE
# semantics the same checker treatment K1-K4 got: a broken handoff
# (lost or stale store) surfaces as a non-linearizable per-shard
# history even while every other shard stays clean.


def key_shard(key: str, nshards: int = 10) -> int:
    """Mirror of functions/hashing.py::key2shard for model histories."""
    return (ord(key[0]) % nshards) if key else 0


def partition_by_shard(
    history: list[HistOp], nshards: int = 10
) -> dict[int, list[HistOp]]:
    parts: dict[int, list[HistOp]] = {}
    for op in history:
        parts.setdefault(key_shard(op.key, nshards), []).append(op)
    return parts


def linearizable_sharded(history: list[HistOp], nshards: int = 10) -> bool:
    """Sound AND complete for the KV model: keys never interact, so a
    per-shard linearization extends to a whole-history one (merge by
    linearization point) and vice versa (restriction). The win is
    cost: Wing&Gong is exponential in pending ops, so checking s
    shards of n/s ops each is exponentially cheaper than one n-op
    search — the same reason porcupine partitions per key."""
    return all(
        linearizable(part) for part in partition_by_shard(history, nshards).values()
    )


def test_sharded_checker_agrees_with_whole_history():
    """Soundness/completeness spot check: on histories small enough to
    check whole, the per-shard verdict equals the whole-history verdict
    — for both legal histories and ones broken inside a single shard."""
    rng = random.Random(4321)
    for _ in range(15):
        history, _, _ = _concurrent_history(rng, n_clients=3, ops_per_client=3)
        assert linearizable_sharded(history) and linearizable(history)
        # break one get (first get found) -> both checkers must reject
        for i, op in enumerate(history):
            if op.op == "get":
                broken = list(history)
                broken[i] = HistOp(
                    op.client, op.op, op.key, op.arg,
                    op.result + "phantom", op.call, op.ret,
                )
                assert not linearizable(broken)
                assert not linearizable_sharded(broken)
                break


def test_sharded_checker_isolates_the_broken_shard():
    """A violation in one shard must not poison the others' verdicts:
    the per-shard map pinpoints WHICH shard's serving history broke —
    the diagnostic a migration bug needs."""
    h = [
        # shard of 'a' (97 % 10 = 7) — clean
        HistOp(0, "append", "a", "1", "", call=0, ret=1),
        HistOp(1, "get", "a", "", "1", call=2, ret=3),
        # shard of 'b' (98 % 10 = 8) — stale read
        HistOp(0, "put", "b", "x", "", call=0, ret=1),
        HistOp(1, "get", "b", "", "", call=2, ret=3),
    ]
    verdicts = {
        shard: linearizable(part)
        for shard, part in partition_by_shard(h).items()
    }
    assert verdicts == {7: True, 8: False}
    assert not linearizable_sharded(h)


def test_migration_handoff_histories():
    """K6 online semantics through the checker: shard 7 ('a…' keys) is
    served by group A, then handed to group B at a config change. A
    correct handoff (B continues from A's full store) yields a
    linearizable per-shard history; a LOST handoff (B starts empty) or
    a STALE one (B got a pre-append snapshot) is caught — the model
    form of reference src/shardkv/test_test.go's post-migration
    check-and-append loops."""
    served_by_a = [
        HistOp(0, "append", "a1", "x", "", call=0, ret=1),
        HistOp(0, "append", "a1", "y", "", call=2, ret=3),
    ]
    # correct handoff: B answers with A's full history
    assert linearizable_sharded(
        served_by_a + [HistOp(1, "get", "a1", "", "xy", call=10, ret=11)]
    )
    # lost handoff: B starts from an empty store
    assert not linearizable_sharded(
        served_by_a + [HistOp(1, "get", "a1", "", "", call=10, ret=11)]
    )
    # stale handoff: B's snapshot predates the second append
    assert not linearizable_sharded(
        served_by_a + [HistOp(1, "get", "a1", "", "x", call=10, ret=11)]
    )
    # concurrent-with-migration get: overlaps the second append, so
    # either serving group may answer first — both results legal
    for observed in ("x", "xy"):
        assert linearizable_sharded(
            served_by_a + [HistOp(1, "get", "a1", "", observed, call=2, ret=11)]
        )


def test_sharded_histories_across_many_shards():
    """A multi-shard concurrent run: per-client sequential ops over
    keys spanning 5 shards, commit points drawn inside each envelope —
    legal by construction, and each shard's sub-history checks
    independently (the partition sizes sum to the whole)."""
    rng = random.Random(99)
    events = []
    t = 0
    clocks = [0] * 4
    keys = ["a0", "b0", "c0", "d0", "e0"]  # shards 7, 8, 9, 0, 1
    for c in range(4):
        for _ in range(6):
            call = clocks[c] + rng.randint(0, 3)
            dur = rng.randint(1, 6)
            ret = call + dur
            clocks[c] = ret + rng.randint(0, 2)
            op = rng.choice(["put", "append", "append", "get"])
            key = rng.choice(keys)
            arg = "" if op == "get" else f"{c}.{t}/"
            events.append((call + rng.randint(0, dur), call, ret, c, op, key, arg))
            t += 1
    events.sort(key=lambda e: (e[0], e[3]))
    state: dict[str, str] = {}
    history = []
    for lin, call, ret, c, op, key, arg in events:
        result = state.get(key, "") if op == "get" else ""
        history.append(HistOp(c, op, key, arg, result, call, ret))
        state, ok = _apply(state, history[-1])
        assert ok
    parts = partition_by_shard(history)
    assert sum(len(p) for p in parts.values()) == len(history)
    assert len(parts) >= 3  # the keys really spread over shards
    assert linearizable_sharded(history)


def test_visualizer_renders_witness_and_broken_shard():
    """tools/linviz.py (the reference's porcupine visualization.go
    analog): a linearizable history renders every op with its witness
    index and in-window tick; a broken shard's ops render red with the
    shard named in the verdict line."""
    from tools.linviz import _demo, _lin_points, render_history

    good = [
        HistOp(0, "append", "a", "1", "", call=0, ret=2),
        HistOp(1, "get", "a", "", "1", call=3, ret=4),
    ]
    page = render_history(good, "good")
    assert "linearizable — ticks" in page and "#0" in page and "#1" in page
    order = linearization(good)
    pts = _lin_points(good, order)
    for i, op in enumerate(good):
        assert op.call <= pts[i] <= op.ret
    bad_page = render_history(_demo(), "demo")
    assert "NOT linearizable" in bad_page
    # shard of 'b1' (98 % 10 = 8) is the broken one; 'a1' ops stay green
    assert "shard(s): 8" in bad_page
    assert "#9fd49f" in bad_page and "#e09a9a" in bad_page
