"""User-defined aggregate surface (D5 generalization) — Arrow-batched
pandas GROUPED_AGG UDAFs, the Spark-native answer to the reference's
``reducef: (key, []values) -> string`` contract
(``/root/reference/src/mr/worker.go:47-48``) when the reduction is
numeric rather than string-fold.

The demo aggregate (quantity-weighted mean price) is intentionally
SQL-expressible so the UDAF path itself gets a value-level oracle check —
the point is certifying the surface, not the arithmetic.
"""

from __future__ import annotations

import sys

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# Workers may not be able to import this package (driver loads the repo
# via sys.path) — serialize by value.
cloudpickle.register_pickle_by_value(sys.modules[__name__])


# DoubleType() (not the DDL string "double"): string schemas are parsed at
# decoration time and require an active SparkContext, breaking import.
@F.pandas_udf(DoubleType())
def weighted_mean_price(price: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: sum(price*qty)/sum(qty).

    Decimal-free but still cross-engine deterministic: pandas sums run
    over int64-exact quantities and 2-dp prices scaled to integer cents.
    """
    cents = (price * 100).round().astype("int64")
    num = int((cents * qty.astype("int64")).sum())
    den = int(qty.astype("int64").sum())
    return (num / 100) / den if den else float("nan")


def grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tinymapreduce_spark.sources.loaders import load_table

    li = load_table(spark, sf_dir, "lineitem")
    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg(); the plain count comes from a second agg joined back
    # (both reuse the same shuffle partitioning on l_returnflag).
    udaf_part = li.groupBy("l_returnflag").agg(
        weighted_mean_price(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "weighted_mean_price"
        )
    )
    counts = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    return udaf_part.join(counts, "l_returnflag")


GROUPED_AGG_SQL = """
SELECT l_returnflag,
       (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100)
         / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS weighted_mean_price,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""
