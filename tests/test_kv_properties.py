"""Property-based check of the K4 replay semantics (SURVEY.md §2.4).

The reference certifies its KV store by replaying random op histories
against a model (`/root/reference/src/models/kv.go:40-54` via porcupine).
Same methodology here: hypothesis generates arbitrary put/append/get
interleavings, the distributed window-function fold must equal the
sequential model fold for every history.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tinymapreduce_spark.operators.kv import replay_ops

KEYS = ["a0", "b1", "c2"]

op_strategy = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["put", "append", "get"]),
    st.text(alphabet="xyz", min_size=0, max_size=3),
)
log_strategy = st.lists(op_strategy, min_size=0, max_size=30)


def model_fold(log: list[tuple[str, str, str]]) -> dict[str, str]:
    """The reference's sequential model: apply ops in order
    (/root/reference/src/models/kv.go:40-54). Missing key reads as ""
    but a get never creates state."""
    state: dict[str, str] = {}
    for key, op, value in log:
        if op == "put":
            state[key] = value
        elif op == "append":
            state[key] = state.get(key, "") + value
    return state


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(log=log_strategy)
def test_replay_matches_sequential_model(spark, log):
    rows = [(i, key, op, value) for i, (key, op, value) in enumerate(log)]
    ops = spark.createDataFrame(
        rows, "seq long, key string, op string, value string"
    ) if rows else spark.createDataFrame([], "seq long, key string, op string, value string")
    got = {r["key"]: r["value"] for r in replay_ops(ops).collect()}
    assert got == model_fold(log)


# --- connected components: random graphs vs a sequential union-find model ---

edge_strategy = st.tuples(st.integers(0, 40), st.integers(0, 40))
graph_strategy = st.lists(edge_strategy, min_size=1, max_size=60)


def union_find_components(edges: list[tuple[int, int]]) -> set[tuple[int, int]]:
    nodes = {u for e in edges if e[0] != e[1] for u in e}
    parent = {x: x for x in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u != v:
            parent[find(u)] = find(v)
    mins: dict[int, int] = {}
    for x in sorted(nodes):
        mins.setdefault(find(x), x)
    return {(x, mins[find(x)]) for x in nodes}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(graph_strategy)
def test_connected_components_match_union_find(spark, edges):
    """Star contraction equals the sequential union-find model on
    arbitrary graphs (self-loops, duplicates, disconnected pieces)."""
    from tinymapreduce_spark.operators.graph import connected_components

    expect = union_find_components(edges)
    if not expect:
        return  # only self-loops: no nodes enter the graph
    df = spark.createDataFrame(edges, "u long, v long")
    got = {(r.node, r.component) for r in connected_components(df).collect()}
    assert got == expect


# --- duplicate-request suppression (kvraft at-least-once contract) --------
#
# The reference requires "appends from one client appear exactly once"
# under RPC retry (/root/reference/src/kvraft/test_test.go:138-155): the
# state machine applies an op at its FIRST committed occurrence and
# ignores re-deliveries of the same (client_id, op_id).

OPS_SCHEMA = "seq long, key string, op string, value string, client_id long, op_id long"


@st.composite
def delivered_logs(draw):
    """(base ops, delivery schedule): base[i] is op_id=i; the schedule is
    an arbitrary multiset-with-order of op ids — duplicates anywhere,
    some ops possibly never delivered."""
    base = draw(st.lists(op_strategy, min_size=0, max_size=12))
    if not base:
        return base, []
    delivered = draw(
        st.lists(st.integers(0, len(base) - 1), min_size=0, max_size=30)
    )
    return base, delivered


def model_fold_first_win(
    base: list[tuple[str, str, str]], delivered: list[int]
) -> dict[str, str]:
    """Sequential model with duplicate suppression: apply each op at its
    first delivery only."""
    state: dict[str, str] = {}
    seen: set[int] = set()
    for idx in delivered:
        if idx in seen:
            continue
        seen.add(idx)
        key, op, value = base[idx]
        if op == "put":
            state[key] = value
        elif op == "append":
            state[key] = state.get(key, "") + value
    return state


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(delivered_logs())
def test_dedup_replay_matches_first_win_model(spark, data):
    from tinymapreduce_spark.operators.kv import dedup_client_ops

    base, delivered = data
    rows = [
        (pos, base[idx][0], base[idx][1], base[idx][2], idx % 3, idx)
        for pos, idx in enumerate(delivered)
    ]
    ops = (
        spark.createDataFrame(rows, OPS_SCHEMA)
        if rows
        else spark.createDataFrame([], OPS_SCHEMA)
    )
    got = {r["key"]: r["value"] for r in replay_ops(dedup_client_ops(ops)).collect()}
    assert got == model_fold_first_win(base, delivered)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(log=log_strategy)
def test_planted_retries_are_invisible(spark, log):
    """with_retries + dedup_client_ops == the clean log: retries of an
    already-applied op never change the final state."""
    from tinymapreduce_spark.operators.kv import dedup_client_ops, with_retries

    rows = [
        (i, key, op, value, i % 3, i) for i, (key, op, value) in enumerate(log)
    ]
    ops = (
        spark.createDataFrame(rows, OPS_SCHEMA)
        if rows
        else spark.createDataFrame([], OPS_SCHEMA)
    )
    got = {
        r["key"]: r["value"]
        for r in replay_ops(dedup_client_ops(with_retries(ops))).collect()
    }
    assert got == model_fold(log)


# --- snapshot / log-compaction replay (Raft InstallSnapshot analog) -------


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(log=log_strategy, cut=st.integers(-1, 32))
def test_snapshot_plus_suffix_equals_full_replay(spark, log, cut):
    """snapshot(prefix ≤ cut) + replay(suffix) == replay(full) for every
    history and every cut point (/root/reference/src/raft/raft.go:54-57:
    state = snapshot + ordered suffix apply)."""
    from tinymapreduce_spark.operators.kv import replay_from_snapshot

    rows = [(i, key, op, value) for i, (key, op, value) in enumerate(log)]
    schema = "seq long, key string, op string, value string"
    ops = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    cutdf = spark.createDataFrame([(cut,)], "cut_seq long")
    got = {
        r["key"]: r["value"] for r in replay_from_snapshot(ops, cutdf).collect()
    }
    assert got == model_fold(log)


def test_suffix_replays_over_nonempty_checkpoint(spark, sf_dir):
    """On the derived sf log the midpoint cut leaves BOTH a non-empty
    snapshot and suffix writes on snapshotted keys — the compaction path
    is genuinely exercised, and equals the full fold."""
    from pyspark.sql import functions as F

    from tinymapreduce_spark.operators.kv import (
        kv_replay,
        kv_snapshot_replay,
        ops_log,
        snapshot_state,
    )

    ops = ops_log(spark, sf_dir)
    cut = ops.agg(F.floor(F.max("seq") / 2).cast("long").alias("cut_seq"))
    snap = snapshot_state(ops, cut)
    assert snap.count() > 0, "checkpoint is empty — cut too early"
    suffix_keys = (
        ops.crossJoin(F.broadcast(cut))
        .where((F.col("seq") > F.col("cut_seq")) & (F.col("op") != "get"))
        .select("key")
        .distinct()
    )
    assert snap.join(suffix_keys, "key").count() > 0, (
        "no suffix write touches a snapshotted key"
    )
    full = {r["key"]: r["value"] for r in kv_replay(spark, sf_dir).collect()}
    compacted = {
        r["key"]: r["value"] for r in kv_snapshot_replay(spark, sf_dir).collect()
    }
    assert compacted == full


class _FakeGroupState:
    """Minimal GroupState stand-in for kernel-level tests: exists/get/
    update, nothing else."""

    def __init__(self):
        self._row = None

    @property
    def exists(self):
        return self._row is not None

    @property
    def get(self):
        return self._row

    def update(self, row):
        self._row = tuple(row)


def test_stream_dedup_state_drops_cross_batch_retries():
    """The streaming dedup kernel must suppress a retry delivered in a
    LATER micro-batch than its original — the case a per-batch-only
    dedup would miss. State carries only the LAST executed op id across
    batches (the kvraft sequential-client contract): O(1) per client,
    and a retry is exactly an op_id <= last_op_id delivery."""
    import pandas as pd

    from tinymapreduce_spark.streaming.state import _dedup_client

    state = _FakeGroupState()

    def run_batch(rows):
        pdf = pd.DataFrame(
            rows, columns=["seq", "key", "op", "value", "client_id", "op_id"]
        )
        out = list(_dedup_client((0,), iter([pdf]), state))
        return [tuple(r) for r in out[0].itertuples(index=False)] if out else []

    b1 = run_batch([(1, "a0", "append", "x", 0, 1), (2, "a0", "append", "y", 0, 2)])
    assert [r[0] for r in b1] == [1, 2]
    # batch 2: retry of op 1 (later seq) + a genuinely new op 3
    b2 = run_batch([(900, "a0", "append", "x", 0, 1), (3, "a0", "append", "z", 0, 3)])
    assert [(r[0], r[3]) for r in b2] == [(3, "z")], b2
    # batch 3: all retries -> nothing emitted, state intact
    assert run_batch([(901, "a0", "append", "y", 0, 2)]) == []
    assert state.get[0] == 3
