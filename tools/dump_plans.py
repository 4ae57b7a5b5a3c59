"""Generate PLANS.md — physical-plan dossier for the headline queries.

Run: python tools/dump_plans.py   (writes PLANS.md at the repo root)

For each selected query this dumps the Catalyst physical plan TREE plus
the scan details (PushedFilters / ReadSchema) — the evidence behind the
plan-regression tests in tests/test_plans.py. Regenerate after any
planner-relevant change.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# query name -> one-line scale rationale (kept next to the plan so the
# reader can check the claim against the tree)
SELECTED = {
    "q1_pricing_summary": "scan-filter-agg: pushdown + map-side partial agg; one shuffle",
    "q6_forecast_revenue": "all predicates at the scan; 2-column read; no shuffle but the final gather",
    "q5_local_supplier_volume": "star join: every dimension broadcast; fact never shuffles",
    "q18_large_orders": "aggregate BEFORE join: tiny qualifying-key set drives the probe",
    "q19_disjunctive_parts": "OR-of-ANDs split per side and pushed to both scans",
    "q21_waiting_suppliers": "correlated EXISTS/NOT EXISTS as residual-condition semi/anti joins",
    "q10_returned_items": "global top-20 as TakeOrderedAndProject, never a full sort",
    "global_sort_range": "total order via rangepartitioning (sampled bounds), no single reducer",
    "q11_supplier_concentration": "global total as window over grouped result: ONE fact scan",
    "bucketed_join_revenue": "co-bucketed fact-fact sort-merge join: ZERO exchanges",
    "salted_skew_join": "deterministic salting spreads hot keys over 16 sub-keys",
    "sequence_pack": "single shuffle reused for group + pack; 2-column read",
    "pack_nextfit_bins": "tokenize before shuffle: only (doc_id, shard, count) exchanges, never text; one Arrow stage packs per shard",
    "length_curriculum": "per-shard window (no global sort) feeding a map-side-combined aggregate",
    "dpp_partitioned_join": "runtime partition pruning: dynamicpruningexpression, no static fallback",
    "zorder_pruned_agg": "Morton-clustered files: min/max stats prune BOTH filter dims",
    "doc_chunk_overlap": "overlapping chunking with zero shuffles (sequence + slice in codegen)",
    "dedup_ngram_jaccard": "prefix-filtered similarity self-join (no hot-shingle blowup)",
    "curation_pipeline": "filters fused to scan; one md5 shuffle; chunk counts as arithmetic",
    "resample_ffill": "per-user calendar via sequence()+explode, data-proportional",
    "window_rank_funcs": "six window functions, one spec, one exchange",
    "triangle_count": "edge relation collapsed by distinct BEFORE the 3-way self-join; edges broadcast",
    "cms_heavy_hitters": "sketch = 4Kx-cell groupBy (map-side partial merge); estimate via broadcast cell join",
    "funnel_steps": "event_type filters pushed to each scan; per-user stage frames broadcast",
    "copurchase_pairs": "basket-bounded self-join on orderkey; global top-k as TakeOrderedAndProject",
    "snapshot_diff": "CDC as ONE full-outer join on the key over row fingerprints",
    "embedding_quantize": "zero-shuffle narrow plan: quantization entirely in codegen over the scan",
    "profile_columns": "per-column aggregates, each a single-field ReadSchema (column-pruned scan)",
    "event_path_trigrams": "session assignment + two LEADs share ONE user_id shuffle; top-k never sorts globally",
    "shuffle_hash_join_control": "SHUFFLE_HASH hint honored: hash join without per-side sorts",
    "rolling_active_users": "sliding exact distinct as pair-explode + hash agg — no per-day rescan",
    "winsorize_stats": "exact percentile cut points broadcast into a clip-in-scan projection",
    "boilerplate_spans": "two shuffles, both on 8-byte span hashes; hot-span set never broadcast",
    "training_shuffle": "per-shard row_number (parallel partitioned sort), no global total order",
    "recursive_cte_hierarchy": "native recursion: per-step narrow self-union, log-depth bounded",
    "lateral_topn_per_group": "correlated LATERAL LIMIT decorrelated to a rank window",
    "mr_wordcount_combiner": "map-side pre-fold: shuffle carries one partial per (batch, key)",
    "winnow_fingerprints": "array-indexed rolling hash; per-doc window, parallel across docs",
    "map_functions": "map HOFs ride the per-user aggregate; two shuffles total",
    "image_header_parse": "binary construction + offset parse entirely in codegen, zero shuffle",
    "bm25_topk": "query terms + idf + corpus stats all broadcast; only matching postings shuffle",
    "hybrid_rrf_retrieval": "dense+lexical fusion: both corpus passes groupBy-reduced pre-join, query sides broadcast, fusion full-outer bounded by |queries|x|pool|",
    "dup_passage_coverage": "window hashes as 8-byte keys; coverage via interval-union windows, O(dup windows)",
    "dedup_minhash_lsh": "banded signatures: one (doc, k*8B) shuffle; candidates from band-bucket equi-join",
    "dedup_clusters_minhash": "clusters scale path: LSH edges (band-bucket equi-join, no cartesian) feed the star-contraction CC loop",
    "doc_ann_topk": "hashed-embedding ANN: query docs broadcast, integer dot products in codegen",
    "perceptron_quality": "trained scoring pass: ONE broadcast weight row, margins in codegen, zero data shuffle",
    "sql_pipe_syntax": "pipe dialect resolves to the same broadcast-dim + decimal-fold plan as ANSI",
    "bfs_hops": "frontier BFS final state: checkpointed visited-set scan + label projection only",
    "hll_portable_distinct": "register table via partial_max groupBy; ALL row = register-MAX union",
    "digit_bucket_quantiles": "exact-count bucket table (partial agg); ALL row = bucket-SUM union",
    "hll_overlap": "ONE fact scan builds per-year registers; unions/overlaps are KB-table arithmetic",
    "token_budget_mix": "O(#sources) allocation broadcast; one per-source window shuffle fills budgets",
    "join_skew_profile": "map-side-combined key counts; one-row stats broadcast; zero extra scans",
    "manifest_skipping_scan": "manifest min/max pruning: the scan lists only range-intersecting files",
    "manifest_delete_rewrite": "copy-on-write delete: untouched files carried by path, candidates re-clustered",
    "manifest_bloom_sidecar": "externalized bloom posture: bitmaps resolved ref+seek-read driver-side; probe math = broadcast bit-test joins, O(#files) metadata only",
    "dedup_incremental_bloom": "bloom bitmap broadcast; k=4 probe joins shuffle-free; only maybe-hits reach exact verify",
    "pseudonymized_join": "token-space analytics: keyed-hash projections in codegen, dims broadcast",
    "try_arithmetic": "NULL-on-error scalar family entirely in codegen over one narrow scan",
    "dsir_importance_weights": "hashed-unigram LUT broadcast; per-doc score is a bigint sum — one token shuffle",
    "k_anonymity_risk": "one map-side-combined aggregate over quasi-identifiers; O(classes) output, no joins",
    "l_diversity_audit": "exact distinct-agg as two hash aggregates; shuffle bounded by classes x segments, no joins",
    "semdedup_drops": "salted within-cell pair join (k*SALT partitions); per-row norms carried once, pair cost = one dot",
    "semdedup_recall": "constant-size exact truth (broadcast NLJ over <=1000-row sample) semi-joined with the index's drops",
    "sketch_error_bounds": "exact sides are partial-agg scans; both approx medians broadcast into ONE shared rank-bracket scan",
    "ann_ivf_topk": "integer centroid distances in codegen (ONE broadcast array-of-arrays row); probes = sorted struct slice, no window; candidates from cid equi-join",
    "ann_pq_topk": "codes = narrow (id,m,code) relation; per-query ADC table broadcast; (m,code) equi-join + hash agg; only the bounded pool sees full-dim math",
    "image_decode_stats": "binary payloads encoded+decoded in two Arrow hops; (doc_id,payload)-only projection keeps text out of the channel",
    "perplexity_buckets": "LM join vocab^2-bounded; NTILE only over the hash sample per lang; O(|lang|) cut table broadcast — no global sort",
    "randomized_response_estimate": "local-DP coin + estimator in codegen over the scan; ONE map-side-combined aggregate, no joins",
    "kv_replay_dedup": "one (client_id, op_id) row_number shuffle suppresses retries; then the K4 key-window fold — two shuffles total",
    "kv_snapshot_replay": "snapshot = prefix fold re-entered as a put at the cut; cut is a 1-row broadcast, never a driver scalar",
    "jpeg_decode_stats": "entropy encode/decode in two Arrow hops over (doc_id,payload) only; the single Exchange is the deliberate CPU fan-out (one input file -> 32 cores), pixels never leave the row",
    "jpeg420_decode_stats": "same two-Arrow-hop shape with 4:2:0 sampled MCUs; plane stats reduce row-locally before the final gather",
    "png_decode_stats": "zlib inflate + filter reconstruction row-local; payload column pruned to (doc_id,payload) at the scan",
    "gif_decode_stats": "LZW decode row-local; identical plan shape to the other codec rungs — no shuffle touches pixel data",
    "warc_ingest_stats": "record walker row-local over (doc_id,payload); gzip members inflate inside the Arrow kernel",
    "tar_shard_ingest": "ustar walker + WebDataset grouping row-local; odd docs .tar.gz through the from-scratch RFC 1951 inflate; no shuffle before the stats",
    "video_decode_stats": "RIFF/AVI walk + per-sampled-frame JPEG decode row-local; skipped frames never reach the pixel kernel",
    "manifest_change_feed": "row-level CDF from the manifest: each commit diffs ONLY its added/removed files; carried majority never scanned",
    "manifest_metadata_agg": "COUNT/MIN/MAX folded from manifest stats driver-side; the plan reads NO data files",
    "cdf_incremental_mv": "IVM: v1 aggregate + O(changes) feed deltas; v2/v3 table scans never happen",
    "segment_dedup_clean": "dedup TRANSFORM: two hash shuffles (segment window, doc reassembly); tokenize/slice/join all codegen",
    "wds_image_pipeline": "container x codec x labels: one fan-out, one Arrow kernel, one label shuffle of (label, sums) — pixels never shuffle",
    "audio_spectral_bins": "integer DFT row-local (numpy int64 matmul per batch); no shuffle",
    "image_augment_stats": "aug stage row-local: numpy views, no copies before the stats fold; no shuffle",
    "autocorrelation_lags": "daily counts once; lag explode + (user, day+L) equi-join over PAIRS, not events; no full-series windows",
    "url_host_stats": "ZERO-Python plan: parse_url + string exprs in whole-stage codegen; two exchanges = the standard distinct-agg expansion of countDistinct(path)",
    "shard_migration": "per-shard sizes from ONE map-side-combined aggregate; config diff broadcast; ledger cost independent of table size",
    "hybrid_rrf_ndcg": "bigram judge: query-doc bigrams broadcast to one tokenize pass; DCG folds over |queries|x10 rows only",
}


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def condense(plan: str) -> str:
    """Plan tree + scan/exchange/join detail lines only."""
    lines = plan.splitlines()
    out, in_tree = [], True
    for ln in lines:
        if in_tree:
            if re.match(r"^\(\d+\) ", ln):
                in_tree = False
            else:
                out.append(ln.rstrip())
                continue
        if re.search(
            r"^\(\d+\) |PushedFilters|ReadSchema|Arguments: (hash|range|Single)|"
            r"Join type|Join condition|Functions \[",
            ln,
        ):
            out.append(ln.rstrip())
    return "\n".join(out)


def main() -> None:
    import __spark_entry__ as mod
    from tinymapreduce_spark.session import get_spark

    spark = get_spark()
    q = mod.queries()
    parts = [
        "# PLANS — physical-plan dossier (generated by tools/dump_plans.py)",
        "",
        f"Catalyst `formatted` plans at `{SF}`; the properties named in",
        "each header are pinned by tests/test_plans.py. Regenerate with",
        "`python tools/dump_plans.py` after planner-relevant changes.",
        "",
    ]
    for name, why in SELECTED.items():
        df = q[name](spark, SF)
        parts += [f"## {name}", "", f"**Scale property:** {why}", "", "```"]
        parts += [condense(plan_of(df)), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(parts))
    print(f"wrote PLANS.md ({len(SELECTED)} plans)")


if __name__ == "__main__":
    main()
