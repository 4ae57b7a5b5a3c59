"""Warehouse-maintenance operators: MERGE-style upsert (SCD1) and
effective-dated history (SCD2).

The reference's closest analog is the KV store's Put/Append semantics —
last write wins over a keyed map (`/root/reference/src/models/kv.go:40-54`).
These are the relational, set-oriented forms a 100 TB warehouse actually
runs: reconcile a base table with a change batch in ONE pass (never
row-at-a-time), and version a dimension by validity interval.

Determinism: change rows are derived from the fixture tables themselves
(modular key slices), so the same MERGE is expressible in the DuckDB
oracle with no side tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tinymapreduce_spark.sources.loaders import load_table


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE: base ⟕⟖ changes on the key; matched rows take the
    change values, unmatched-change rows insert, unmatched-base rows
    carry forward. (Base = customers with custkey % 3 != 0; changes =
    customers with custkey % 2 == 0, balance bumped +100 — so the three
    MERGE cases all occur.)

    Scale: a MERGE is ONE full-outer shuffle join on the key + coalesce
    — never a per-row lookup loop. With a bucketed base (see
    plans/layout.py) even that shuffle is one-sided. action is emitted
    so downstream compaction can split inserts from updates."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.where(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    changes = cust.where(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("new_name"),
        (F.col("c_acctbal") + 100.0).alias("new_acctbal"),
    )
    merged = base.join(changes, base.c_custkey == changes.k, "full_outer")
    return merged.select(
        F.coalesce("c_custkey", "k").alias("c_custkey"),
        F.coalesce("new_name", "c_name").alias("c_name"),
        F.coalesce("new_acctbal", "c_acctbal").alias("c_acctbal"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("k").isNull(), "carry")
        .otherwise("update")
        .alias("action"),
    )


MERGE_UPSERT_SQL = """
WITH base AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
), changes AS (
  SELECT c_custkey AS k, c_name AS new_name, c_acctbal + 100.0 AS new_acctbal
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT COALESCE(base.c_custkey, changes.k) AS c_custkey,
       COALESCE(new_name, c_name) AS c_name,
       COALESCE(new_acctbal, c_acctbal) AS c_acctbal,
       CASE WHEN base.c_custkey IS NULL THEN 'insert'
            WHEN changes.k IS NULL THEN 'carry'
            ELSE 'update' END AS action
FROM base FULL OUTER JOIN changes ON base.c_custkey = changes.k
"""


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval construction: each customer's order stream becomes
    effective-dated versions — valid_from = this order's date, valid_to
    = the next order's date (NULL while current). The standard
    change-stream -> validity-interval transform, built with one LEAD
    window.

    Scale: one shuffle (window partitionBy custkey); the interval edges
    never require a self-join. Ties on a day are broken by orderkey so
    the version chain is total and deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # parquet reads the date as TIMESTAMP_NTZ; epoch math needs TIMESTAMP
    # (session tz is UTC, matching the oracle's naive-as-UTC epoch_us)
    ts = F.col("o_orderdate").cast("timestamp")
    return orders.select(
        "o_custkey",
        F.col("o_totalprice").alias("attr_value"),
        F.unix_micros(ts).alias("valid_from_us"),
        F.unix_micros(F.lead(ts).over(w)).alias("valid_to_us"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version"),
    )


SCD2_SQL = """
SELECT o_custkey,
       o_totalprice AS attr_value,
       epoch_us(o_orderdate) AS valid_from_us,
       epoch_us(LEAD(o_orderdate) OVER w) AS valid_to_us,
       LEAD(o_orderdate) OVER w IS NULL AS is_current,
       ROW_NUMBER() OVER w AS version
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"]


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling of the fact table — row count, null
    count, exact distinct count, min and max per column — the first
    query every ingestion pipeline runs against a new drop and the
    input to quality gates (null-ratio thresholds, key-uniqueness
    checks).

    One aggregate per column, each a COLUMN-PRUNED scan (ReadSchema
    carries exactly one field — at 100 TB profiling N columns costs N
    single-column scans, not N full-table scans; columnar storage makes
    that the cheapest possible shape). Temporal columns profile as epoch
    micros so every cell is numeric and the unioned frame stays one
    (col_name, stats...) schema. Distinct counts are exact here; the
    approx_aggregates query is the sketch-based scale alternative."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in PROFILE_COLS:
        # shipdate arrives TIMESTAMP_NTZ; session tz is UTC, so the cast
        # is the identity reinterpretation the oracle's epoch_us applies
        v = (
            F.unix_micros(F.col(c).cast("timestamp"))
            if c == "l_shipdate"
            else F.col(c).cast("double")
        )
        parts.append(
            li.select(v.alias("v")).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
                F.count_distinct("v").alias("n_distinct"),
                F.min("v").cast("double").alias("min_val"),
                F.max("v").cast("double").alias("max_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_PROFILE_ONE = """
SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {v} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT {v}) AS n_distinct,
       CAST(MIN({v}) AS DOUBLE) AS min_val,
       CAST(MAX({v}) AS DOUBLE) AS max_val
FROM lineitem
"""

PROFILE_SQL = "\nUNION ALL\n".join(
    _PROFILE_ONE.format(c=c, v="epoch_us(l_shipdate)" if c == "l_shipdate" else c)
    for c in PROFILE_COLS
)
