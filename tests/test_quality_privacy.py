"""Invariant tests for the quality/privacy tier added late in round 4:
CCNet perplexity bucketing, Warner randomized response, and the
streaming gopher-filter sink. Exact-value parity with DuckDB is covered
by test_oracle_parity; these pin the SEMANTIC invariants the hash can't
express (bucket ordering, mechanism flip rate, stream==batch equality).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tinymapreduce_spark.operators.textstats import (
    gopher_rules,
    perplexity_buckets,
)
from tinymapreduce_spark.plans.maintenance import (
    RR_TRUTH_DEN,
    RR_TRUTH_NUM,
    randomized_response_estimate,
)
from tinymapreduce_spark.sources.loaders import load_table
from tinymapreduce_spark.streaming.sinks import stream_quality_filter


def test_perplexity_buckets_are_score_ordered(spark, sf_dir):
    """Cut semantics: every head score <= every middle score <= every
    tail score within a language (ties land in the lower bucket, so the
    ordering is strict across bucket boundaries)."""
    pdf = perplexity_buckets(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert set(pdf["bucket"]) <= {"head", "middle", "tail"}
    for lang, g in pdf.groupby("lang"):
        by = {b: g[g["bucket"] == b]["score"] for b in ("head", "middle", "tail")}
        if len(by["head"]) and len(by["middle"]):
            assert by["head"].max() < by["middle"].min()
        if len(by["middle"]) and len(by["tail"]):
            assert by["middle"].max() < by["tail"].min()


def test_perplexity_buckets_cover_all_scored_docs(spark, sf_dir):
    """Every doc with >= 2 tokens gets a bucket label (CCNet labels the
    whole corpus, not just the calibration sample)."""
    pdf = perplexity_buckets(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # synthetic docs are all long enough to produce bigrams
    assert len(pdf) == docs
    assert pdf["bucket"].notna().all()
    assert (pdf["n_bigrams"] > 0).all()


def test_randomized_response_mechanism_and_estimator(spark, sf_dir):
    """The noised yes-count differs from truth by exactly the lied
    rows, and the debiased estimator is internally consistent:
    est = (4*yes - n) / (2n) under p = 3/4."""
    out = randomized_response_estimate(spark, sf_dir).toPandas()
    cust = load_table(spark, sf_dir, "customer")
    n_total = cust.count()
    assert out["n_members"].sum() == n_total
    # estimator identity re-derived from the published integer counts
    est = (RR_TRUTH_DEN * out["n_reported_yes"] - out["n_members"]) / (
        2 * out["n_members"]
    )
    assert (abs(est.round(6) - out["est_frac"]) < 1e-12).all()
    # the coin flips truth for ~1/4 of rows: reported never equals truth
    # counts unless no row lied — check at the corpus level that SOME
    # noise was injected (the mechanism actually runs) yet the estimate
    # stays inside the debiased estimator's worst-case envelope: with
    # p = 3/4, lambda in [0,1] maps to est in [-1/2, 3/2], so
    # |est - true| <= 3/2 for ANY group size (small nations do hit
    # errors > 0.5; the estimator is unbiased, not bounded-noise)
    assert (out["est_abs_err"] <= 1.5 + 1e-9).all()
    assert not (out["n_reported_yes"] == out["n_true_sensitive"]).all()


def test_randomized_response_epsilon_envelope(spark, sf_dir):
    """p = 3/4 is a valid local-DP setting: truth probability strictly
    between 1/2 (pure noise) and 1 (no privacy)."""
    assert 0.5 < RR_TRUTH_NUM / RR_TRUTH_DEN < 1.0


def test_stream_quality_filter_equals_batch(spark, sf_dir):
    """The incremental verdict counters converge to the one-shot batch
    aggregate exactly (counter addition is associative, publishes are
    idempotent)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    batch = (
        gopher_rules(spark, sf_dir)
        .join(docs, "doc_id")
        .groupBy("lang", "passes")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
        )
    )
    streamed = stream_quality_filter(spark, sf_dir)
    a = batch.toPandas().sort_values(["lang", "passes"], ignore_index=True)
    b = streamed.toPandas().sort_values(["lang", "passes"], ignore_index=True)
    pd.testing.assert_frame_equal(
        a[["lang", "passes", "n_docs", "n_words"]],
        b[["lang", "passes", "n_docs", "n_words"]],
        check_dtype=False,
    )
