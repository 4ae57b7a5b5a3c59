"""Scale-up smoke: the same plans over 16x-inflated inputs must produce
exactly-scaled results (aggregation linearity) and finish without plan
degradation — the cheap local proxy for "does this survive a 100x
scale-up". Inflation happens in-memory (union of key-shifted copies);
testdata on disk is never touched.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SCALE = 16


def _inflate(df, key_cols: list[str], copies: int = SCALE):
    """copies x the rows, with key columns shifted per copy so keys stay
    distinct across copies (no accidental dedup)."""
    out = None
    for i in range(copies):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * 1_000_000_000))
        out = c if out is None else out.unionByName(c)
    return out


def test_q1_scales_linearly(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
    )
    big = (
        _inflate(li, ["l_orderkey"])
        .where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
    )
    b = {(r["l_returnflag"], r["l_linestatus"]): r for r in base.collect()}
    g = {(r["l_returnflag"], r["l_linestatus"]): r for r in big.collect()}
    assert b.keys() == g.keys()
    for k in b:
        assert g[k]["n"] == SCALE * b[k]["n"]
        assert g[k]["qty"] == SCALE * b[k]["qty"]


def test_dedup_exact_scales_with_distinct_ids(spark, sf_dir):
    from tinymapreduce_spark.functions.text import normalized_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    big = _inflate(docs, ["doc_id"])
    groups = (
        big.select(F.md5(normalized_text("text")).alias("k"), "doc_id")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base_groups = (
        docs.select(F.md5(normalized_text("text")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["k"]: r["n"] for r in groups.collect()}
    want = {r["k"]: SCALE * r["n"] for r in base_groups.collect()}
    assert got == want


def test_aqe_splits_skewed_join(spark):
    """One key owning ~half the fact rows must not stall the join: with
    AQE skew thresholds scaled down to the test data volume, the executed
    plan must mark the sort-merge join skew-handled (``skew=true`` /
    ``AQEShuffleRead skewed``) and still produce exactly one match per
    fact row. At 100 TB the same mechanism fires with default thresholds.

    Uses sf0.01 (sf0.001 is below any observable skew) and a values-list
    dim side: OptimizeSkewedJoin pattern-matches Sort<-Shuffle children,
    so an aggregation on the dim side would mask the skew handling. The
    fact side is repartitioned to 32 map tasks first — skew splitting
    subdivides a reduce partition by map-output ranges, so it needs
    enough mapper chunks to split regardless of local core count.
    """
    sf_dir = "/root/testdata/sf0.01"
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "32",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        # ~half the rows collapse onto one hot key
        fact = li.select(
            F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_quantity",
        ).repartition(32)
        keys = [r["k"] for r in fact.select("k").distinct().collect()]
        dim = spark.createDataFrame([(k, 1.0) for k in keys], "k long, w double").hint("merge")
        joined = fact.join(dim, "k")
        assert len(joined.collect()) == li.count()  # one match per fact row
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final and "AQEShuffleRead skewed" in final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_winnowing_invariant_under_corpus_inflation(spark, sf_dir):
    """Fingerprint summaries are per-document deterministic: 16x the
    corpus (same texts, shifted doc_ids) must reproduce each base doc's
    exact (count, checksum, extrema) on every copy — content-derived
    output is invariant to corpus size and partition layout."""
    from tinymapreduce_spark.operators.textstats import winnow_fps_df

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    base = {
        r.doc_id: (r.n, r.checksum)
        for r in winnow_fps_df(docs)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("fp").alias("checksum"))
        .collect()
    }
    big = _inflate(docs, ["doc_id"], copies=4)
    inflated = {
        r.doc_id: (r.n, r.checksum)
        for r in winnow_fps_df(big)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("fp").alias("checksum"))
        .collect()
    }
    assert len(inflated) == 4 * len(base)
    for doc_id, stats in inflated.items():
        assert stats == base[doc_id % 1_000_000_000], f"doc {doc_id} diverged"


def test_dup_passage_coverage_saturates_under_duplication(spark, sf_dir):
    """Inflating the corpus with exact copies (shifted doc_ids) makes
    EVERY window cross-doc duplicated, so coverage must saturate at
    exactly 1.0 for every doc with >= PASSAGE_K tokens (and stay 0 for
    shorter docs) — the interval union must tile the whole doc with no
    off-by-one at either edge, at any corpus size."""
    from tinymapreduce_spark.operators.dedup import PASSAGE_K, dup_passage_coverage_df

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    big = _inflate(docs, ["doc_id"], copies=2)
    for r in dup_passage_coverage_df(big).collect():
        if r.n_tokens >= PASSAGE_K:
            assert r.n_covered == r.n_tokens, (r.doc_id, r.n_covered, r.n_tokens)
            assert r.dup_coverage == 1.0
        else:
            assert r.n_covered == 0
