#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Two-lap protocol (VERDICT r7 #3): every query runs twice in the same
session. The WARM lap (second execution — steady state, one-time costs
paid) is the headline value and the number the regression gate judges
against tools/bench_baseline.json; the COLD lap rides along in the full
map so host slowdowns read as a cold/warm gap instead of plan rot. Keys
whose warm wall exceeds 1.5x their recorded baseline are listed in the
output and printed as `# REGRESSION` lines — each needs an isolated
re-measurement (tools/isolated_bench.py) or a documented cause before
round close.

Targets (BASELINE.md): any single query < 120 s at sf0.1; flagship word
count < 180 s; the whole suite here well under the reference's 900 s cap.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from tinymapreduce_spark.session import get_spark  # noqa: E402

# Headline set: flagship + one representative per operator family.
HEADLINE = [
    "word_count",
    "inverted_index",
    "mr_wordcount_shim",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_supplier_concentration",
    "q12_priority_lines",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_parts",
    "q20_promo_heavy_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "global_sort_range",
    "window_running_sum",
    "window_rank_funcs",
    "topk_per_group",
    "resample_ffill",
    "value_histogram",
    "kv_replay",
    "merge_upsert",
    "scd2_history",
    "sessionize",
    "asof_join",
    "tumbling_window_agg",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dup_passage_coverage",
    "bm25_topk",
    "hybrid_rrf_retrieval",
    "hybrid_rrf_ndcg",
    "pagerank_trade",
    "bfs_hops",
    "label_propagation",
    "ann_topk_cosine",
    "fingerprint",
    "token_stats",
    "bucketed_join_revenue",
    "salted_skew_join",
    "zorder_pruned_agg",
    "dpp_partitioned_join",
    "bloom_filter_join",
    "tfidf_top_terms",
    "bpe_train_merges",
    "bigram_novelty",
    "dedup_incremental",
    "dedup_clusters",
    "repetition_score",
    "contamination_check",
    "sequence_pack",
    "doc_chunk_overlap",
    "pack_nextfit_bins",
    "length_curriculum",
    "stream_pack_nextfit",
    "curation_pipeline",
    "cogrouped_asof",
    "triangle_count",
    "cms_heavy_hitters",
    "hll_portable_distinct",
    "digit_bucket_quantiles",
    "dedup_incremental_minhash",
    "window_range_frame",
    "weighted_sample",
    "fuzzy_join_levenshtein",
    "funnel_steps",
    "retention_cohorts",
    "anomaly_zscore",
    "profile_columns",
    "embedding_quantize",
    "dq_checks",
    "snapshot_diff",
    "copurchase_pairs",
    "trend_slope",
    "bigram_lm",
    "csv_roundtrip_agg",
    "orc_roundtrip_agg",
    "mix_weights",
    "sql_interface",
    "sql_pipe_syntax",
    "sql_group_by_all",
    "sql_scripting",
    "custom_source_pushdown",
    "arrow_text_stats",
    "grouped_correlation",
    "equidepth_deciles",
    "kmeans_clusters",
    "perceptron_quality",
    "audio_energy_windows",
    "equidepth_sampled",
    "sql_python_udf",
    "extract_entities",
    "incremental_agg_merge",
    "distribution_drift",
    "time_to_conversion",
    "dedup_survivors",
    "shuffle_hash_join_control",
    "winsorize_stats",
    "event_path_trigrams",
    "rolling_active_users",
    "stickiness_ratio",
    "negative_sampling",
    "rfm_segments",
    "mr_wordcount_combiner",
    "manifest_wap_roundtrip",
    "recursive_cte_hierarchy",
    "lateral_topn_per_group",
    "boilerplate_spans",
    "training_shuffle",
    "char_entropy",
    "sentiment_lexicon",
    "winnow_fingerprints",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "compressibility",
    "observed_metrics",
    "winnow_neardup_pairs",
    "image_header_parse",
    "map_functions",
    "manifest_skipping_scan",
    "manifest_delete_rewrite",
    "hll_overlap",
    "token_budget_mix",
    "join_skew_profile",
    "manifest_append_incremental",
    "manifest_upsert",
    "dedup_incremental_bloom",
    "activity_gaps",
    "exact_quota_split",
    "catalog_partition_overwrite",
    "try_arithmetic",
    "manifest_optimize",
    "grouped_arrow_stats",
    "pseudonymized_join",
    "xml_roundtrip_agg",
    "pretrain_mix_pipeline",
    "sql_execute_immediate",
    "iterator_udf_scoring",
    "manifest_delete_by_table",
    "golden_wc_parity",
    "ann_ivf_recall",
    "dsir_importance_weights",
    "k_anonymity_risk",
    "stream_cdc_upsert",
    "semdedup_drops",
    "semdedup_recall",
    "sketch_error_bounds",
    # new in round 4: real decode paths + CDC apply with deletes
    "image_decode_stats",
    "audio_decode_stats",
    "manifest_apply_changes",
    "stream_cdc_apply_changes",
    "binary_files_decode",
    "stream_binary_files_decode",
    "state_store_read",
    # new in round 4: privacy audit + streaming vector-index ingest
    "l_diversity_audit",
    "stream_ann_ingest",
    "content_chunk_dedup",
    "manifest_expire_vacuum",
    "stream_chunk_ingest",
    "manifest_merge_on_read",
    "manifest_schema_evolution",
    "stream_dv_erasure",
    "perplexity_buckets",
    "randomized_response_estimate",
    "stream_quality_filter",
    "stream_decontaminate",
    "manifest_bloom_skipping",
    "stream_perplexity_buckets",
    # new in round 5: KV exactly-once/compaction + the JPEG codec rung
    # + the K6 shard-migration data plane
    "kv_replay_dedup",
    "kv_snapshot_replay",
    "jpeg_decode_stats",
    "shard_migration",
    "stream_kv_dedup",
    "image_phash_dedup",
    # new in round 6: subsampled + progressive codec rungs (the audited
    # approx_aggregates / equidepth_sampled forms replace the raw ones
    # under their existing entries above)
    "jpeg420_decode_stats",
    "jpeg_progressive_decode_stats",
    "png_decode_stats",
    "gif_decode_stats",
    "g711_decode_stats",
    "warc_ingest_stats",
    "stream_warc_ingest",
    "tar_shard_ingest",
    "stream_tar_ingest",
    "video_decode_stats",
    "manifest_change_feed",
    "manifest_metadata_agg",
    "cdf_incremental_mv",
    "segment_dedup_clean",
    "custom_stream_sink",
    "audio_spectral_bins",
    "wds_image_pipeline",
    "python_udtf_dynamic_schema",
    "autocorrelation_lags",
    "image_augment_stats",
    "mojibake_repair",
    "robots_url_filter",
    "crawl_curation_pipeline",
    "zip_shard_ingest",
    "avro_ingest_stats",
    "tiff_decode_stats",
    "url_host_stats",
    "html_extract_stats",
    "approx_aggregates",
    # round 7: the former rows-only tier (now oracle-backed audit
    # forms; compressibility was already benched above), the codec-
    # boundary rungs, the LM/corpus-stats tier, the storage-format rung
    "hll_distinct_merge",
    "kll_quantile_merge",
    "avro_snappy_ingest",
    "png16_decode_stats",
    "video420_decode_stats",
    "tiff_lzw_decode_stats",
    "jpeg_lossless_decode_stats",
    "png_subbyte_decode_stats",
    "jpeg12_decode_stats",
    "jpeg_arith_decode_stats",
    "jpeg_hier_decode_stats",
    "bwt_transform_stats",
    "audio_adpcm_stats",
    "columnar_encoding_stats",
    "ngram_lm_kneser_ney",
    "ngram_lm_kn_trigram",
    "vocab_growth_stats",
    "corpus_merkle_root",
    "jpeg_hier_dct_decode_stats",
    "jpeg_arith_prog_decode_stats",
    "dedup_sorted_neighborhood",
    "embedding_pca_power",
    "embedding_random_projection",
    "stream_adpcm_ingest",
    # round 8: clusters over the minhash pair graph (the scale path the
    # x100 probe measured; exact-tier clusters stay benched above)
    "dedup_clusters_minhash",
    # round 9: the bloom-sidecar posture twin (externalized bitmaps)
    "manifest_bloom_sidecar",
]


REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(REPO, "tools", "bench_baseline.json")
REGRESSION_GATE = 1.5  # warm-vs-recorded-baseline ratio that flags a key
REGRESSION_FLOOR_SEC = 1.0  # AND the absolute slide must exceed this


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="tms-bench", cpus=cpus)
    queries = entrymod.queries()

    # Warm the JVM/codegen/parquet-footer caches once so per-query numbers
    # measure the queries, not first-touch JIT and class loading.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    # Warm the Python worker daemons + Arrow serde path too (one tiny
    # mapInPandas spanning every core): without this the first
    # pandas/Arrow query in the list absorbs the ~32-worker spawn cost
    # and reads 5-10x slower than its steady state.
    spark.range(256, numPartitions=int(str(cpus).split(",")[0])).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # Two-lap protocol (VERDICT r7 #3). Lap 1 ("cold") pays one-time
    # costs: interpreted-expression compiles, scratch-table builds,
    # trained ANN/semdedup codebooks, whole-stage codegen. Lap 2
    # ("warm") is steady state — the cross-round comparable number and
    # the one the regression gate judges. Host noise shows up as a
    # cold/warm gap, not as a phantom plan regression.
    # Each lap starts with an empty Spark cache + a full GC (VERDICT r8
    # #4's "look at lap ordering/GC around hybrid_rrf_ndcg"): several
    # dedup-tier operators cache() purpose-built frames that live in
    # the CacheManager until explicitly released, so by mid-lap the
    # 16g heap carries ~70 keys' worth of pinned blocks and the keys
    # right AFTER the dedup block (hybrid_rrf_ndcg) absorb the GC
    # pauses — 24-25 s in-lap vs 6.5 s isolated, twice in r8. Clearing
    # between laps also keeps `warm` honest: identical logical plans
    # would otherwise silently REUSE the cold lap's cached data.
    def lap(tag: str) -> dict[str, float]:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        timings: dict[str, float] = {}
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.time()
            # count() forces the full plan without driver-side collect cost.
            n = fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
            print(f"# [{tag}] {name}: {timings[name]:.2f}s ({n} rows)",
                  file=sys.stderr)
        return timings

    cold = lap("cold")
    warm = lap("warm")

    # Regression gate: warm wall vs the committed per-key baseline
    # (tools/bench_baseline.json — refreshed at round close once every
    # flagged key is re-measured isolated or has a documented cause).
    # Two conditions, BOTH required (VERDICT r8 #4 — the ratio-only
    # gate flagged 10-19 sub-second keys per lap, 100% host co-load):
    # ratio > REGRESSION_GATE AND absolute delta > REGRESSION_FLOOR_SEC,
    # so episodic ±2-3x jitter on fast keys can't flag while a real
    # multi-second slide on any key (fast keys included — ADVICE r8's
    # 0.2s -> 2s example trips the 1 s delta) still does.
    baseline: dict[str, float] = {}
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f).get("warm", {})
    regressions = sorted(
        (
            (name, round(warm[name] / baseline[name], 2))
            for name in warm
            if name in baseline
            and warm[name] > REGRESSION_GATE * baseline[name]
            and warm[name] - baseline[name] > REGRESSION_FLOOR_SEC
        ),
        key=lambda kv: -kv[1],
    )
    below_floor = sum(
        1
        for name in warm
        if name in baseline
        and warm[name] > REGRESSION_GATE * baseline[name]
        and warm[name] - baseline[name] <= REGRESSION_FLOOR_SEC
    )
    unseeded = sum(1 for name in warm if name not in baseline)
    if below_floor or unseeded:
        # no silent caps: say what the floor exempted and what has no seed
        print(
            f"# gate note: {below_floor} key(s) over {REGRESSION_GATE}x but"
            f" within the {REGRESSION_FLOOR_SEC}s absolute floor;"
            f" {unseeded} key(s) missing from the baseline",
            file=sys.stderr,
        )
    for name, ratio in regressions:
        print(
            f"# REGRESSION {name}: warm {warm[name]:.2f}s ="
            f" {ratio}x recorded {baseline[name]:.2f}s"
            f" (+{warm[name] - baseline[name]:.2f}s)",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    full = {
        "metric": "headline_suite_wall",
        "value": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": warm,
        "cold_value": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "regressions": dict(regressions),
        "sf": sf_val,
        "n_queries": len(warm),
    }
    # Full per-query map: stderr + sidecar file (the driver's stdout tail
    # capture truncated the 93-query map in round 1 -> "parsed": null).
    print(json.dumps(full), file=sys.stderr)
    with open(os.path.join(REPO, "BENCH_full.json"), "w") as f:
        json.dump(full, f, indent=1)

    # Final stdout line stays well under 1 KB: totals + the 10 slowest.
    worst = dict(sorted(warm.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": full["value"],
                "unit": "sec",
                "queries": worst,
                "cold_value": full["cold_value"],
                "n_regressions": len(regressions),
                "sf": sf_val,
                "n_queries": len(warm),
                "full_map": "BENCH_full.json",
            }
        )
    )


if __name__ == "__main__":
    main()
