"""Results must be invariant to the shuffle fan-out.

At 100 TB the partition count is a tuning knob (AQE changes it at
runtime, operators coalesce it, clusters differ) — any query whose
RESULT depends on it is silently nondeterministic at scale. The repo's
determinism conventions (decimal folds for float-order independence,
md5 tie-breaks, total output orders) exist exactly to guarantee this;
this test certifies the property end-to-end for a representative slice
of the risk surface: float-ish aggregation, tie-broken top-k,
order-sensitive concat, hash-routed sampling/packing, banded minhash,
fixed-point iteration, single-partition ntile windows.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

REPRESENTATIVES = [
    "word_count",
    "q1_pricing_summary",
    "sorted_group_concat",
    "topk_per_group",
    "deterministic_sample",
    "training_shuffle",
    "sequence_pack",
    "dedup_minhash_lsh",
    "pagerank_trade",
    "equidepth_deciles",
    "winsorize_stats",
    "mr_wordcount_combiner",
    "perceptron_quality",
    # round-2 fourth-session additions: register-table sketch algebra,
    # integer window quotas, bloom pre-filtered incremental dedup
    "hll_overlap",
    "token_budget_mix",
    "exact_quota_split",
    "dedup_incremental_bloom",
    "pretrain_mix_pipeline",
    # round-3 additions: integer-LUT importance scoring, streaming CDC
    # MERGE through the join-based copy-on-write core
    "dsir_importance_weights",
    "stream_cdc_upsert",
    # round-4 addition: sharded sequential packer (applyInPandas groups
    # must pack identically regardless of upstream partitioning)
    "pack_nextfit_bins",
    # round-4 post-window additions: chunk identity must not depend on
    # how docs are split across tasks; the streaming ingest's per-batch
    # merge must fold to the same cell stats under any fan-out
    "content_chunk_dedup",
    "stream_ann_ingest",
    # late round-4 quality/privacy tier: the CCNet cutpoint window runs
    # over a hash sample (tile assignment must not depend on fan-out);
    # the streaming filter's verdict counters must fold identically
    "perplexity_buckets",
    "stream_quality_filter",
    # round-5 additions: dedup's (client, op) window must pick the same
    # first delivery at any fan-out; the snapshot cut and the migration
    # ledger's per-shard counts are fan-out-free aggregates; streaming
    # dedup state must accept the same ops under any batch partitioning
    "kv_replay_dedup",
    "kv_snapshot_replay",
    "shard_migration",
    "stream_kv_dedup",
    # round-6 additions: codec rungs are row-local (payload -> stats
    # must not depend on which task decodes a doc); the audited
    # approx/equidepth forms embed live sketches whose merge trees DO
    # vary with fan-out — the pinned error-bound booleans must hold
    # regardless
    "jpeg420_decode_stats",
    "png_decode_stats",
    "approx_aggregates",
    "equidepth_sampled",
    # late round-6: crawl front door (row-local walkers + the
    # countDistinct two-phase agg must fold identically at any fan-out)
    "warc_ingest_stats",
    "url_host_stats",
    "html_extract_stats",
]


def _rows(spark, name):
    return sorted(
        tuple(r) for r in entrymod.queries()[name](spark, SF_DIR).collect()
    )


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        high = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert low == high, f"{name} result depends on shuffle fan-out"
