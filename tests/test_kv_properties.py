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
