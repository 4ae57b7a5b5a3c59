"""Iterative graph algorithms — connected components for duplicate
clustering.

The reference has no graph operators (its only dataflow is a single
map -> shuffle -> reduce pass, `src/mr/worker.go:76-190`); this module is
north-star surface: near-dup PAIRS (from dedup.py) become duplicate
CLUSTERS, which is what a curation pipeline actually deletes from.

The algorithm is the two-phase large-star/small-star method (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14): both
phases are a groupBy-min + re-emit, so each round is two shuffles on the
node id, and the edge set contracts toward a star per component in
O(log^2 n) rounds — unlike naive min-label propagation, whose round
count is the graph DIAMETER (a 1M-node chain needs 1M rounds; this
needs ~40). That difference is the whole ballgame at 100 TB.

Spark-specific posture for iterative algorithms:
- `localCheckpoint(eager=True)` every round truncates the lineage —
  without it the plan doubles per iteration and the driver dies in
  analysis long before the data is the bottleneck.
- convergence is detected by an order-insensitive edge-set checksum
  (sum of xxhash64(u,v)), one tiny aggregate per round — not a
  subtract/except, which would be an extra full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Orient every edge (big, small), drop self-loops, dedup."""
    u, v = F.col("u"), F.col("v")
    return (
        edges.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) sum: long would overflow under ANSI mode
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], int(row["h"])


def connected_components(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(node, component) for every node appearing in `edges` (u, v);
    component = smallest node id reachable. Two-phase star contraction,
    driver loop with per-round lineage truncation.
    """
    e = _canon(edges).localCheckpoint(eager=True)
    prev = None
    for _ in range(max_rounds):
        # large-star: for each node, link every LARGER neighbor to the
        # smallest node seen in its neighborhood (incl. itself)
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("minv"))
        m = F.least(F.col("u"), F.col("minv"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
        )
        # small-star: orient (big, small); link all smaller neighbors
        # AND the center itself to the neighborhood min
        o = _canon(large)
        mins2 = o.groupBy("u").agg(F.min("v").alias("minv"))
        withm = o.join(mins2, "u")
        small = withm.select(F.col("v").alias("u"), F.col("minv").alias("v")).union(
            withm.select("u", F.col("minv").alias("v"))
        )
        e = _canon(small).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    # converged edge set is a star per component: (member, root). Roots
    # appear only on the right — give them their own row.
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return members.union(roots).distinct()


def cluster_stats(components: DataFrame) -> DataFrame:
    """Attach per-component size: (node, component, cluster_size)."""
    w = Window.partitionBy("component")
    return components.withColumn("cluster_size", F.count(F.lit(1)).over(w))


PR_DAMPING = 0.85
PR_ITERS = 10
# Fixed-point scale: ranks are integers in units of 1/PR_SCALE. 10^17
# leaves headroom for the 17x damping multiply inside a signed 64-bit
# long (17 * 10^17 < 2^63) while keeping per-floor error at 1e-17 —
# ~1e-15 accumulated over 10 rounds, far under the 1e-9 output rounding.
PR_SCALE = 10**17
_PR_NUM = 17  # damping = _PR_NUM / _PR_DEN = 0.85, exact in integers
_PR_DEN = 20


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = PR_ITERS,
    assume_full_coverage: bool = False,
) -> DataFrame:
    """Standard PageRank by power iteration over an edge DataFrame.

    ``nodes``: one column ``node``; ``edges``: ``(src, dst)`` directed,
    pre-deduplicated. Returns (node, rank_i, rank) with sum(rank) ~= 1;
    dangling mass (nodes with no out-edges) is redistributed uniformly
    each round, so the distribution stays a distribution.

    Arithmetic is FIXED-POINT: ranks are longs in units of 1/PR_SCALE
    and every division is an integer floor (``DIV``), so the result is
    a pure function of the graph — no float-summation-order variance —
    and the DuckDB oracle (PAGERANK_TRADE_SQL) replays the identical
    integers. The float ``rank`` column is derived once at the edge
    (one IEEE division by PR_SCALE — also engine-identical).

    Iterative shape mirrors connected_components: per round one shuffle
    for the contribution aggregation (the edges-join-ranks is an
    equi-join on src that AQE plans as broadcast while ranks are small
    and shuffle at scale), one tiny scalar aggregate for dangling mass
    (crossJoin of a 1-row frame — never a collect of data rows), and
    `localCheckpoint(eager=True)` to truncate lineage. Per-round cost is
    O(|E|) shuffled bytes — the same bound as one groupBy over the edge
    list — so 10 rounds at 100 TB is 10 bounded shuffles, not a growing
    plan.

    ``assume_full_coverage=True`` asserts that every node has at least
    one out-edge AND one in-edge — guaranteed by construction for any
    symmetrized graph (e.g. ``_trade_edges``: each relation contributes
    both directions, and nodes = src ∪ dst). It skips the coverage
    aggregate job, the dangling machinery, and the per-round
    nodes-left-join; results are identical whenever the assertion holds
    (the generic path detects the same two facts and takes the same
    branches).
    """
    if assume_full_coverage:
        # Full-coverage callers (symmetrized graphs) never touch the
        # node set inside the loop — only the count (here) and the rank
        # init (consumed once, by round 1) read it, so the distinct
        # is executed at most twice and a separate materialization
        # barrier buys nothing (round-11 setup lean-up: the checkpoint
        # job + its scheduling gap were ~0.4 s of pagerank_trade's
        # driver-lap wall).
        n_nodes = nodes.count()
    else:
        # Materialize the node set once: the count below, the rank
        # init, and the dangling anti-join / per-round left join all
        # reuse it instead of re-deriving the caller's distinct/union
        # lineage.
        nodes = nodes.localCheckpoint(eager=True)
        n_nodes = nodes.count()
    if n_nodes == 0:  # empty graph -> empty ranking (schema-stable)
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_i"),
            F.lit(0.0).alias("rank"),
        )
    base = PR_SCALE // n_nodes
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) is loop-invariant: materialize once.
    fanout = edges.join(outdeg, "src").localCheckpoint(eager=True)
    # Both loop-invariant coverage facts come from ONE aggregate job
    # over the edge list (the setup jobs, not the iterations, dominate
    # wall time at moderate scale — r02 verdict item #5):
    #   dangling nodes exist      <=> |distinct src| < |V|
    #   every node has an in-edge <=> |distinct dst| = |V|
    # (nodes = src ∪ dst by the caller's contract, so both comparisons
    # against n_nodes are exact).
    if assume_full_coverage:
        has_dangling, full_in_coverage = False, True
    else:
        deg = edges.agg(
            F.countDistinct("src").alias("n_src"),
            F.countDistinct("dst").alias("n_dst"),
        ).first()
        has_dangling = deg["n_src"] < n_nodes
        full_in_coverage = deg["n_dst"] == n_nodes
    # Dangling NODE SET is loop-invariant — only its MASS changes per
    # round. Materialized only when non-empty; when every node has an
    # out-edge (true of any symmetrized graph, e.g. the trade graph),
    # the per-round mass aggregation is skipped entirely: dmass is
    # identically 0 and the oracle's per-round dangling term agrees.
    # When every node also has an in-edge, the contribution aggregate
    # already emits a row per node and the per-round nodes-left-join —
    # one extra O(|V|) shuffle per round — is dropped too.
    dangling_nodes = (
        nodes.join(
            outdeg, nodes["node"] == outdeg["src"], "left_anti"
        ).localCheckpoint(eager=True)
        if has_dangling
        else None
    )
    # Lineage is truncated by localCheckpoint; when ranks is consumed
    # once per round (no dangling aggregate reading it a second time),
    # a 5-round cadence amortizes the materialization barrier without
    # re-execution risk (single consumer => the lazy chain between
    # checkpoints executes exactly once). With dangling nodes, ranks
    # feeds BOTH the contribution join and the mass aggregate each
    # round — checkpoint every round so the second consumer never
    # recomputes the chain.
    #
    # BIG GRAPHS (round-8 x100 probe, BASELINE.md): the 5-round lazy
    # chain pipelines five joins' + aggregations' hash maps into ONE
    # executed stage, and AQE keeps broadcasting the rank table — at
    # 3.2M nodes that multiplied per-task memory past the 16g/32-task
    # envelope (AGGREGATE_OUT_OF_MEMORY). Above the node threshold,
    # checkpoint every round (one join + one agg live per task) and
    # hint the contribution join to a SHUFFLED hash join so the rank
    # relation is partitioned, never replicated per task. Base-scale
    # plans are untouched (broadcast stays optimal while ranks are
    # small — the threshold is ~50 MB of hash relation).
    big_graph = n_nodes > 1_000_000
    # STATIC CHAIN (round 11, guide §1.2 remove passes / §3.1 pick the
    # join deliberately): when the graph is bounded (n_nodes <= 1M, so
    # the rank relation is <= ~16 MB — always broadcastable), has no
    # dangling machinery and the contribution aggregate emits a row per
    # node, every iteration consumes the previous one exactly ONCE and
    # the whole power iteration is a straight-line plan. Chain it
    # lazily, broadcast the rank side explicitly, and execute the final
    # checkpoint with AQE off: one statically planned job whose
    # per-round stages pipeline back to back, instead of ~13 AQE
    # stage-jobs + replan gaps per 5-round window (phase_profile r11:
    # ~3.5 s of pagerank_trade's 6.0 s wall was that cascade). The
    # big-graph path is UNCHANGED (AQE on, shuffle-hash hint, per-round
    # checkpoints — the r8 x100-probe posture).
    static_chain = not big_graph and not has_dangling and full_in_coverage
    ckpt_every = 1 if (has_dangling or big_graph) else 5
    # Init is a narrow map over the node set — no separate
    # materialization job; the first round's consumer computes it.
    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank_i"))
    if static_chain:
        from tinymapreduce_spark.session import static_plan

        new_rank_full = (
            f"({(_PR_DEN - _PR_NUM) * base}L"
            f" + {_PR_NUM}L * COALESCE(in_mass, 0L))"
            f" DIV {_PR_DEN}L"
        )
        with static_plan(fanout.sparkSession):
            for _ in range(iters):
                ranks = (
                    fanout.join(F.broadcast(ranks), fanout["src"] == F.col("node"))
                    .select("dst", F.expr("rank_i DIV outdeg").alias("contrib"))
                    .groupBy("dst")
                    .agg(F.sum("contrib").alias("in_mass"))
                    .select(
                        F.col("dst").alias("node"),
                        F.expr(new_rank_full).alias("rank_i"),
                    )
                )
            ranks = ranks.localCheckpoint(eager=True)
        return ranks.select(
            "node",
            "rank_i",
            (F.col("rank_i") / F.lit(float(PR_SCALE))).alias("rank"),
        )
    for it in range(iters):
        rhs = ranks.hint("shuffle_hash") if big_graph else ranks
        contribs = (
            fanout.join(rhs, fanout["src"] == rhs["node"])
            .select("dst", F.expr("rank_i DIV outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        if full_in_coverage:
            new_ranks = contribs.select(F.col("dst").alias("node"), "in_mass")
        else:
            new_ranks = nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
        if has_dangling:
            dangling = (
                ranks.join(F.broadcast(dangling_nodes), "node", "left_semi")
                .agg(F.coalesce(F.sum("rank_i"), F.lit(0).cast("long")).alias("dmass"))
            )
            new_ranks = new_ranks.crossJoin(F.broadcast(dangling))
            dmass_term = f" + dmass DIV {n_nodes}L"
        else:
            dmass_term = ""
        new_rank = (
            f"({(_PR_DEN - _PR_NUM) * base}L"
            f" + {_PR_NUM}L * (COALESCE(in_mass, 0L){dmass_term}))"
            f" DIV {_PR_DEN}L"
        )
        ranks = new_ranks.select("node", F.expr(new_rank).alias("rank_i"))
        if it % ckpt_every == ckpt_every - 1 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node", "rank_i", (F.col("rank_i") / F.lit(float(PR_SCALE))).alias("rank")
    )


def _trade_edges(spark, sf_dir: str) -> DataFrame:
    """Symmetrized customer<->supplier relation graph (one edge pair per
    distinct trading relation via orders x lineitem). Nodes travel as
    LONGS (customer 2k, supplier 2k+1 — disjoint, bijective with the
    'c:'/'s:' labels): 8-byte join and shuffle keys instead of strings;
    labels are rebuilt only for final output rows, and SQL oracles that
    work in the label domain see identical results because per-node
    quantities are preserved under any bijective node renaming. The
    distinct() collapses multi-line orders BEFORE any iteration, so
    iterative consumers (pagerank_trade, bfs_hops) loop over the much
    smaller relation graph, not raw line items."""
    from tinymapreduce_spark.sources.loaders import load_table

    # Round 11 note: a spread_for_cpu fan-out of the lineitem scan was
    # A/B-measured HERE and reverted — the spread exchange costs more
    # than the broadcast-join probe it parallelizes (edge build 1.0 s
    # no-spread vs 1.45 s spread, warm): the per-row work is one hash
    # probe, not the dozens of hash/regex evaluations the spread gate
    # exists for.
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    rel = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey").cast("long") * 2).alias("cust"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("supp"),
        )
        .distinct()
    )
    return rel.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).union(
        rel.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )


def _trade_label():
    """'c:<custkey>' / 's:<suppkey>' label column for a long `node` id."""
    return F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c:"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(F.lit("s:"), ((F.col("node") - 1) / 2).cast("long").cast("string"))
    )


def pagerank_trade(spark, sf_dir: str) -> DataFrame:
    """PageRank centrality over the customer<->supplier trade graph: one
    edge pair per distinct (customer, supplier) trading relation (via
    orders x lineitem), both directions, so rank measures how central a
    party is in the trading network. Top 20 by rank.

    The edge build is itself the scale-relevant part: the orders-lineitem
    join is an equi-join on orderkey and the distinct() collapses the
    multi-line orders BEFORE the iteration, so the loop runs on the
    (much smaller) relation graph, not raw line items. The fixed-point
    iteration is a pure function of the graph, so despite being
    iterative it carries an exact DuckDB oracle (PAGERANK_TRADE_SQL —
    the 10 rounds unrolled as materialized CTE stages); tests also
    assert determinism across runs and the handwritten power-iteration
    oracle on a toy graph.
    """
    # Materialize the edge build ONCE; every setup consumer (node set,
    # out-degrees, fanout, coverage aggregate) then reads the in-memory
    # edge list instead of re-deriving the orders×lineitem join.
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    # Full coverage holds by construction: every relation contributes
    # an edge in each direction, so every node is both a src and a dst.
    ranks = pagerank(nodes, edges, assume_full_coverage=True)
    label = _trade_label()
    # order on the exact integer rank (pre-rounding), tie-broken on the
    # rebuilt LABEL so the top-20 cut is byte-identical to the oracle's
    return (
        ranks.select(label.alias("node"), "rank_i", "rank")
        .orderBy(F.desc("rank_i"), F.asc("node"))
        .limit(20)
        .select("node", F.round("rank", 9).alias("rank"))
    )


def _pagerank_trade_sql() -> str:
    """DuckDB replay of pagerank_trade: the same fixed-point integers,
    the 10 power-iteration rounds unrolled into chained MATERIALIZED
    CTE stages (each referenced twice — without MATERIALIZED DuckDB
    would inline the chain exponentially)."""
    stages = []
    nn = "(SELECT n FROM nn)"
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        stages.append(f"""m{k} AS MATERIALIZED (
  SELECT f.dst, CAST(SUM(r.rank_i // f.outdeg) AS BIGINT) AS in_mass
  FROM fanout f JOIN r{p} r ON f.src = r.node
  GROUP BY f.dst
), d{k} AS MATERIALIZED (
  SELECT CAST(COALESCE(SUM(rank_i), 0) AS BIGINT) AS dmass
  FROM r{p} WHERE node NOT IN (SELECT src FROM outdeg)
), r{k} AS MATERIALIZED (
  SELECT n.node,
         ({(_PR_DEN - _PR_NUM)} * ({PR_SCALE} // {nn})
          + {_PR_NUM} * (COALESCE(m.in_mass, 0) + d.dmass // {nn})) // {_PR_DEN} AS rank_i
  FROM nodes n LEFT JOIN m{k} m ON n.node = m.dst CROSS JOIN d{k} d
)""")
    chain = ",\n".join(stages)
    return f"""
WITH rel AS MATERIALIZED (
  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS cust,
                  's:' || CAST(l_suppkey AS VARCHAR) AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS MATERIALIZED (
  SELECT cust AS src, supp AS dst FROM rel
  UNION ALL
  SELECT supp AS src, cust AS dst FROM rel
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst AS node FROM edges
), nn AS MATERIALIZED (
  SELECT COUNT(*) AS n FROM nodes
), outdeg AS MATERIALIZED (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), fanout AS MATERIALIZED (
  SELECT e.src, e.dst, o.outdeg FROM edges e JOIN outdeg o ON e.src = o.src
), r0 AS MATERIALIZED (
  SELECT node, {PR_SCALE} // {nn} AS rank_i FROM nodes
),
{chain}
SELECT node, ROUND(rank_i / {float(PR_SCALE)}, 9) AS rank
FROM r{PR_ITERS}
ORDER BY rank_i DESC, node ASC
LIMIT 20
"""


PAGERANK_TRADE_SQL = _pagerank_trade_sql()


def triangle_count(spark, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the nation trade graph: nations A-B are
    adjacent when some customer in A ordered from some supplier in B;
    every triangle (na < nb < nc) is emitted as one row. Triangle density
    is the classic graph-health statistic (clustering coefficient) and
    the canonical non-iterative multiway self-join.

    Plan shape: the edge build is the expensive part — the fact-fact
    orders-lineitem equi-join with all dimensions broadcast, collapsed by
    distinct() to the (at most nations^2) relation edges BEFORE the
    3-way self-join, which then runs entirely on a broadcast-sized edge
    list. The a<b<c canonical orientation both dedups (each triangle
    once, not 6x) and halves every join's input — the same trick at
    web scale (node-id ordering == degree ordering after relabeling).
    """
    from tinymapreduce_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    cnat = nation.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cnat"))
    snat = nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("snat"))
    rel = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("sk"))
        .select("cnat", "snat")
        .distinct()
    )
    edges = (
        rel.where(F.col("cnat") != F.col("snat"))
        .select(
            F.least("cnat", "snat").alias("u"),
            F.greatest("cnat", "snat").alias("v"),
        )
        .distinct()
    )
    e1 = edges.select(F.col("u").alias("na"), F.col("v").alias("nb"))
    e2 = edges.select(F.col("u").alias("nb"), F.col("v").alias("nc"))
    e3 = edges.select(F.col("u").alias("na"), F.col("v").alias("nc"))
    return (
        e1.join(F.broadcast(e2), "nb")
        .join(F.broadcast(e3), ["na", "nc"])
        .select("na", "nb", "nc")
    )


TRIANGLE_SQL = """
WITH rel AS (
  SELECT DISTINCT cn.n_name AS cnat, sn.n_name AS snat
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
), edges AS (
  SELECT DISTINCT LEAST(cnat, snat) AS u, GREATEST(cnat, snat) AS v
  FROM rel WHERE cnat <> snat
)
SELECT e1.u AS na, e1.v AS nb, e2.v AS nc
FROM edges e1
JOIN edges e2 ON e1.v = e2.u
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
"""


BFS_MAX_HOPS = 4
# Schema-adapted: the synthetic warehouse names nations NATION_0..24
# (no TPC-H country names) — seeding on a real member keeps the BFS
# non-vacuous at every scale factor.
BFS_SEED_NATION = "NATION_7"


def bfs_hops(spark, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance over the trade graph: seed every
    customer of one nation, expand the frontier Pregel-style up to
    BFS_MAX_HOPS, report each reached party's first-visit hop. The
    reachability question behind supply-chain blast-radius / influence
    queries (reference parity: the iterative keyed-dataflow family,
    SURVEY.md §2; no direct reference analog — graph extension tier).

    Scale shape: per round ONE equi-join shuffle bounded by the edges
    touched by the frontier plus one anti-join against the visited set
    (16 B/node), the textbook distributed-BFS bound. The visited set is
    ``localCheckpoint``ed each round so lineage stays flat and the next
    frontier is a free scan of materialized rows (``hop == h``), never a
    re-execution of the anti-join. Rounds are FIXED (no data-dependent
    early exit), so the result is a pure function of the graph and the
    DuckDB recursive-CTE oracle (BFS_HOPS_SQL) replays it exactly:
    BFS first-visit hop == MIN over all (node, hop<=H) walk pairs.
    Seeds with no trading relations still report hop 0 (documented —
    the oracle agrees by construction)."""
    from tinymapreduce_spark.sources.loaders import load_table

    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == BFS_SEED_NATION
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select((F.col("c_custkey").cast("long") * 2).alias("node"))
    )
    dist = seeds.select(
        "node", F.lit(0).cast("long").alias("hop")
    ).localCheckpoint(eager=True)
    # Round 11 note: a static-plan variant of this loop (explicit
    # broadcasts, AQE off per round) was built and A/B-measured at a
    # WASH (~2.5 s both ways) — unlike pagerank, the visited set's two
    # consumers force a materialization barrier per round, which is the
    # cost AQE-off cannot remove — so the simpler AQE loop stays.
    for h in range(1, BFS_MAX_HOPS + 1):
        frontier = dist.where(F.col("hop") == h - 1).select("node")
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(h).cast("long").alias("hop"))
        )
        dist = dist.union(nxt).localCheckpoint(eager=True)
    return dist.select(_trade_label().alias("node"), "hop").orderBy("hop", "node")


BFS_HOPS_SQL = f"""
WITH RECURSIVE rel AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS cust,
                  CAST(l_suppkey AS BIGINT) * 2 + 1 AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS MATERIALIZED (
  SELECT cust AS src, supp AS dst FROM rel
  UNION ALL
  SELECT supp AS src, cust AS dst FROM rel
), seeds AS (
  SELECT CAST(c_custkey AS BIGINT) * 2 AS node
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE n_name = '{BFS_SEED_NATION}'
), walk(node, hop) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.hop + 1
  FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.hop < {BFS_MAX_HOPS}
)
SELECT CASE WHEN node % 2 = 0 THEN 'c:' || CAST(node // 2 AS VARCHAR)
            ELSE 's:' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
       CAST(MIN(hop) AS BIGINT) AS hop
FROM walk
GROUP BY 1
ORDER BY 2, 1
"""


LPA_ROUNDS = 4


def label_propagation(spark, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    trade graph: every node starts as its own label; each round every
    node adopts the most frequent label among its neighbors, ties to
    the smallest label — the deterministic synchronous LPA variant
    (Raghavan et al. 2007 made reproducible: fixed LPA_ROUNDS, no
    random order, total tie order). Output: the 20 largest communities
    after the final round.

    Scale shape: per round one edge-sized equi-join (against the
    checkpointed loop-invariant edge list) and one (node,label) count
    aggregate whose argmax folds as a MAX over (count, -label) structs —
    partial-aggregatable, so the hot reduce is map-side combined and no
    per-node sort/window is ever planned. Lineage truncates per round.
    Fixed rounds keep the result a pure function of the graph; the
    DuckDB oracle (LABEL_PROPAGATION_SQL) unrolls the same rounds as
    chained MATERIALIZED CTEs with a ROW_NUMBER argmax — different
    surface syntax, identical (count DESC, label ASC) selection."""
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    # Round 11 note: a pagerank-style static chain (all 4 rounds lazily
    # chained, explicit label broadcast, AQE off for the final eager
    # checkpoint) was built and interleaved-A/B-measured here — OLD
    # 4.12-4.56 s vs NEW 4.34-4.77 s over 5 alternating rounds in one
    # session: a consistent ~5% LOSS. With only 4 rounds the AQE
    # stage-cascade this removes is small, and the non-AQE reduce
    # stages run shuffle.partitions uncoalesced tasks each — the
    # tradeoff that pays at pagerank's 10 rounds inverts here, so the
    # per-round-checkpoint AQE loop stays.
    for _ in range(LPA_ROUNDS):
        nb = edges.join(labels, edges["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "label"
        )
        counts = nb.groupBy("node", "label").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            counts.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("cnt").alias("c"), (-F.col("label")).alias("nl"))
                ).alias("best")
            )
            .select("node", (-F.col("best.nl")).alias("label"))
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(F.col("label").alias("node"), "n_members")
        .select(_trade_label().alias("community"), "n_members")
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(20)
    )


def _label_propagation_sql() -> str:
    stages = []
    for k in range(1, LPA_ROUNDS + 1):
        stages.append(f"""l{k} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT e.dst AS node, l.label,
           ROW_NUMBER() OVER (PARTITION BY e.dst
                              ORDER BY COUNT(*) DESC, l.label ASC) AS rn
    FROM edges e JOIN l{k - 1} l ON e.src = l.node
    GROUP BY e.dst, l.label
  ) WHERE rn = 1
)""")
    return (
        """
WITH rel AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS cust,
                  CAST(l_suppkey AS BIGINT) * 2 + 1 AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS MATERIALIZED (
  SELECT cust AS src, supp AS dst FROM rel
  UNION ALL
  SELECT supp AS src, cust AS dst FROM rel
), l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS label FROM edges
), """
        + ",\n".join(stages)
        + f"""
SELECT CASE WHEN label % 2 = 0 THEN 'c:' || CAST(label // 2 AS VARCHAR)
            ELSE 's:' || CAST((label - 1) // 2 AS VARCHAR) END AS community,
       COUNT(*) AS n_members
FROM l{LPA_ROUNDS}
GROUP BY 1
ORDER BY n_members DESC, community ASC
LIMIT 20
"""
    )


LABEL_PROPAGATION_SQL = _label_propagation_sql()
