"""Subquery + miscellaneous relational surface: correlated scalar
subqueries, IN-subqueries, exact percentiles, pivot/unpivot, bucketed
range join, approximate aggregates.

Same determinism conventions as plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymapreduce_spark.sources.loaders import load_table


def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems with quantity below 20% of their part's
    average quantity. Expressed as a true correlated scalar subquery in
    the SQL surface — Catalyst decorrelates it into an aggregate + join
    (check: one shuffle on l_partkey, no per-row re-execution)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand,
               COUNT(*) AS n_small,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
        )
        GROUP BY p_brand
        """
    )


CORRELATED_SQL = """
SELECT p_brand,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_quantity < (
  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
)
GROUP BY p_brand
"""


def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subquery pair: order counts for customers in the top
    nation-by-customer-count vs everyone else. IN-subqueries plan as
    left-semi joins (no materialized id list on the driver)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT
          CASE WHEN o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 7000
          ) THEN 'rich' ELSE 'other' END AS bucket,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1
        """
    )


IN_SUBQUERY_SQL = """
SELECT
  CASE WHEN o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_acctbal > 7000
  ) THEN 'rich' ELSE 'other' END AS bucket,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY 1
"""


def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (sort-based) continuous percentiles of l_quantity per
    returnflag — Spark `percentile` vs DuckDB `quantile_cont`, identical
    linear-interpolation semantics. Quantities are whole doubles so the
    interpolation arithmetic is bit-stable across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.5).alias("p50"),
        F.percentile("l_quantity", 0.75).alias("p75"),
        F.percentile("l_quantity", 0.95).alias("p95"),
    )


PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       quantile_cont(l_quantity, 0.95) AS p95
FROM lineitem GROUP BY l_returnflag
"""


EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per user-decile bucket, one count column per event type.
    Explicit value list keeps the plan a single pass (no distinct-values
    pre-query)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", (F.col("user_id") % 10).cast("int"))
        .groupBy("user_bucket")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0)
    )


PIVOT_SQL = """
SELECT CAST(user_id % 10 AS INT) AS user_bucket,
       COALESCE(COUNT(*) FILTER (event_type = 'click'), 0) AS click,
       COALESCE(COUNT(*) FILTER (event_type = 'view'), 0) AS view,
       COALESCE(COUNT(*) FILTER (event_type = 'purchase'), 0) AS purchase,
       COALESCE(COUNT(*) FILTER (event_type = 'signup'), 0) AS signup,
       COALESCE(COUNT(*) FILTER (event_type = 'error'), 0) AS error
FROM events GROUP BY 1
"""


def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): customer balance/metrics wide -> long via
    ``unpivot`` — the inverse surface of pivot."""
    cust = load_table(spark, sf_dir, "customer")
    wide = cust.groupBy("c_mktsegment").agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        F.max(F.col("c_acctbal")).alias("max_bal"),
    )
    return wide.unpivot(
        ["c_mktsegment"], ["total_bal", "n_customers", "max_bal"], "metric", "value"
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT c_mktsegment,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         MAX(c_acctbal) AS max_bal
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, metric, value
FROM wide
UNPIVOT (value FOR metric IN (total_bal, n_customers, max_bal))
"""


RANGE_WINDOW_US = 10 * 60 * 1_000_000  # 10 minutes


def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join, bucketized for scale: for each 'error'
    event, how many events the same user produced in the following 10
    minutes.

    A naive theta-join (`a.user_id = b.user_id AND b.ts BETWEEN a.ts AND
    a.ts+10m`) is an equi-join on user_id only — fine when users are
    small, quadratic on hot users. The scale-safe form implemented here
    adds a coarse time-bucket equi-key: each probe row joins buckets
    [floor(ts/W), floor((ts+W)/W)], turning the range predicate into an
    (user_id, bucket) equi-join + residual filter. Same result, bounded
    fan-out.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("user_id"), F.col("event_id").alias("err_id"), F.col("ts_us").alias("err_ts")
    )
    # probe side: expand each error into the (at most 2) coarse buckets
    # its window can overlap
    probe = errors.select(
        "user_id",
        "err_id",
        "err_ts",
        F.explode(
            F.array_distinct(
                F.array(
                    (F.col("err_ts") / RANGE_WINDOW_US).cast("long"),
                    ((F.col("err_ts") + RANGE_WINDOW_US) / RANGE_WINDOW_US).cast("long"),
                )
            )
        ).alias("bucket"),
    )
    build = ev.select(
        "user_id",
        F.col("ts_us"),
        (F.col("ts_us") / RANGE_WINDOW_US).cast("long").alias("bucket"),
    )
    joined = probe.join(build, ["user_id", "bucket"]).where(
        (F.col("ts_us") > F.col("err_ts")) & (F.col("ts_us") <= F.col("err_ts") + RANGE_WINDOW_US)
    )
    counts = joined.groupBy("err_id").agg(F.count(F.lit(1)).alias("n_follow"))
    # left join back so errors with no follow-up events appear with 0
    return (
        errors.join(counts, "err_id", "left_outer")
        .select("err_id", "user_id", F.coalesce("n_follow", F.lit(0)).alias("n_follow"))
    )


RANGE_JOIN_SQL = """
SELECT e.event_id AS err_id, e.user_id,
       COALESCE(COUNT(f.event_id), 0) AS n_follow
FROM events e
LEFT JOIN events f
  ON f.user_id = e.user_id
 AND epoch_us(f.ts) > epoch_us(e.ts)
 AND epoch_us(f.ts) <= epoch_us(e.ts) + 10*60*1000000
WHERE e.event_type = 'error'
GROUP BY 1, 2
"""


def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (native in Spark 4): every supplier walks a
    deterministic heap-parent chain (parent(k) = k div 2, root = 1) to
    its root; output is the per-depth census with ancestor-sum fold —
    the BOM-explosion / org-chart shape. Catalyst executes the recursion
    as an iterative union with per-step reuse; the iterative-DataFrame
    twin of this pattern (driver-side loop + localCheckpoint) is
    operators/graph.py::connected_components — having both covers the
    declarative AND imperative recursion surfaces.

    Scale: each recursion step is one narrow self-join on the previous
    step's frontier (heap depth ~ log2(max key) steps, bounded)."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        WITH RECURSIVE chain(suppkey, ancestor, depth) AS (
          SELECT s_suppkey, s_suppkey, 0 FROM supplier
          UNION ALL
          SELECT suppkey, ancestor div 2, depth + 1 FROM chain WHERE ancestor > 1
        ),
        rooted AS (
          SELECT suppkey,
                 MAX(depth) AS root_depth,
                 SUM(ancestor) AS ancestor_sum
          FROM chain GROUP BY suppkey
        )
        SELECT root_depth, COUNT(*) AS n_suppliers,
               MIN(suppkey) AS min_suppkey,
               SUM(ancestor_sum) AS total_ancestor_sum
        FROM rooted GROUP BY root_depth
        """
    )


RECURSIVE_CTE_SQL = """
WITH RECURSIVE chain(suppkey, ancestor, depth) AS (
  SELECT s_suppkey, s_suppkey, 0 FROM supplier
  UNION ALL
  SELECT suppkey, ancestor // 2, depth + 1 FROM chain WHERE ancestor > 1
),
rooted AS (
  SELECT suppkey,
         MAX(depth) AS root_depth,
         CAST(SUM(ancestor) AS BIGINT) AS ancestor_sum
  FROM chain GROUP BY suppkey
)
SELECT root_depth, COUNT(*) AS n_suppliers,
       MIN(suppkey) AS min_suppkey,
       CAST(SUM(ancestor_sum) AS BIGINT) AS total_ancestor_sum
FROM rooted GROUP BY root_depth
"""


def lateral_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: for each nation, its top-3 customers
    by account balance (ties to the smaller custkey) — the SQL-standard
    spelling of top-N-per-group. Catalyst plans the correlated LIMIT as
    a rank-window under the hood (DSL twin: analytics.topk_per_group),
    so declaring it laterally costs nothing vs hand-writing the window —
    exactly the declarative-first posture this engine wants."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n.n_name, l.c_custkey, l.bal
        FROM nation n,
        LATERAL (
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
          FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC
          LIMIT 3
        ) l
        """
    )


LATERAL_TOPN_SQL = """
SELECT n.n_name, l.c_custkey, l.bal
FROM nation n,
LATERAL (
  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC
  LIMIT 3
) l
"""


def approx_aggregates_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregation surface: HLL++ approx_count_distinct and
    t-digest-style approx percentile — the ONE-PASS 100 TB scale path
    (sketch results are engine-specific by construction, so this raw
    form has no SQL twin). The registered ``approx_aggregates`` query
    below wraps it in hash-checkable error-bound audits."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
    )


# documented accuracy contracts the audit row pins (same constants as
# operators/sketches.py::sketch_error_bounds):
#   approx_count_distinct -> 5% rsd -> 15% bound
#   percentile_approx/1000 -> 0.1% rank error -> +-5 rank-pct bracket
APPROX_ACD_ERR_PCT = 15
APPROX_RANK_LO_PCT = 45
APPROX_RANK_HI_PCT = 55


def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate-aggregation surface as a HASH-CHECKABLE audit
    (r5 verdict #6: the raw sketch estimates were rows-only driver
    evidence): per group, the exact distinct counts — derived
    independently by the oracle — plus one pinned error-bound boolean
    per sketch. The raw estimates still DRIVE every boolean (the
    sketches run and their outputs are compared against the exact
    sides), so a regression in approx_count_distinct, percentile_approx
    or their merge paths flips a hashed value. The raw one-pass form
    stays available as ``approx_aggregates_raw`` (the scale path; this
    audit adds exact count-distinct passes by design)."""
    li = load_table(spark, sf_dir, "lineitem")
    raw = approx_aggregates_raw(spark, sf_dir)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # exact rank bracket of each group's approximate median — one scan
    ranks = (
        li.select("l_returnflag", "l_extendedprice")
        .join(
            F.broadcast(raw.select("l_returnflag", "approx_median_price")),
            "l_returnflag",
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                (F.col("l_extendedprice") < F.col("approx_median_price")).cast("long")
            ).alias("below"),
            F.sum(
                (F.col("l_extendedprice") <= F.col("approx_median_price")).cast("long")
            ).alias("at_or_below"),
        )
    )
    return (
        exact.join(raw, "l_returnflag")
        .join(ranks, "l_returnflag")
        .select(
            "l_returnflag",
            "n_orders",
            "n_parts",
            (
                F.abs(F.col("approx_orders") - F.col("n_orders")) * 100
                <= F.col("n_orders") * APPROX_ACD_ERR_PCT
            ).alias("orders_ok"),
            (
                F.abs(F.col("approx_parts") - F.col("n_parts")) * 100
                <= F.col("n_parts") * APPROX_ACD_ERR_PCT
            ).alias("parts_ok"),
            (
                (F.col("below") * 100 <= F.col("n_rows") * APPROX_RANK_HI_PCT)
                & (F.col("at_or_below") * 100 >= F.col("n_rows") * APPROX_RANK_LO_PCT)
            ).alias("median_ok"),
        )
    )


APPROX_AGGREGATES_SQL = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       TRUE AS orders_ok,
       TRUE AS parts_ok,
       TRUE AS median_ok
FROM lineitem
GROUP BY l_returnflag
"""
