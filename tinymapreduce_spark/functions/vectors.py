"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

Used by the similarity-search operators. Everything here is a
higher-order-function expression (``zip_with`` + ``aggregate``), i.e.
JVM-side with a deterministic left-to-right fold in DOUBLE — no UDF, no
Arrow hop, and bit-stable across engines for the oracle comparison
(DuckDB's ``list_dot_product`` also folds in index order; we additionally
round scores at the output edge — see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic ordered-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
