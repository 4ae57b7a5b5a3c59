"""Disk-level scale probe — times representative document operators on
sf0.1 and on a 4x-inflated on-disk copy of its documents table.

Complements tests/test_scale_smoke.py (in-memory 16x linearity of
RESULTS) with wall-clock evidence: the same plans on 4x the bytes
should cost ~4x (x16 with SPARK_GRAFT_PROBE_COPIES=16; candidate-bounded ops may grow a bit faster because
the inflated copies plant extra near-duplicates — each copy's text is
perturbed with a copy tag so exact dedup does not collapse them, but
cross-copy pairs are genuinely near-identical and SHOULD be found).

Run: python tools/scale_probe.py    (prints a table; results recorded
in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# x4 by default; the x16 run (VERDICT r02 item #4: where shuffle sizes
# start to matter and banded-join growth claims are genuinely exercised)
# via SPARK_GRAFT_PROBE_COPIES=16.
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "4"))
PROBES = [
    "word_count",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "tfidf_top_terms",
    "winnow_fingerprints",
    "pretrain_mix_pipeline",
    "token_budget_mix",
    # round-4 sequence-prep tier: the packer is a sharded sequential
    # scan, so its ratio should track input growth ~linearly
    "pack_nextfit_bins",
    "length_curriculum",
    # round-4 CDC chunking: boundary hashing is linear in chars; the
    # chunk-identity aggregate shuffles digests only, so the ratio
    # should track input growth even though the inflated copies plant
    # massive cross-copy chunk duplication (that's the point)
    "content_chunk_dedup",
    # late round-4 quality tier: the CCNet bucketing's LM join is
    # vocab^2-bounded and the cutpoint window runs over the hash sample
    # only, so the ratio should track the bigram-count growth; the
    # streaming filter re-streams the inflated corpus through 8-file
    # micro-batches (per-batch verdict partials stay O(|langs| x 2))
    "perplexity_buckets",
    "stream_quality_filter",
    # final round-4 additions: hybrid fusion's corpus passes are
    # groupBy-reduced before any join and the query sides are fixed at
    # 10 broadcast rows, so the ratio should track input growth; the
    # streaming decontamination's eval-gram set grows with the eval
    # slice but stays broadcast-sized, per-batch cost is one tokenize
    # + one semi-join
    "hybrid_rrf_retrieval",
    "stream_decontaminate",
    # round-5: the regraded nDCG adds a bigram pass + broadcast judge
    # join (should track input growth like the fusion), and the JPEG
    # codec is row-local Arrow kernel work (should track row count)
    "hybrid_rrf_ndcg",
    "jpeg_decode_stats",
    # round-6: subsampled + progressive codec rungs (row-local Arrow
    # kernel work like jpeg_decode_stats — should track row count; the
    # 4:2:0 images carry ~4x the pixels of the baseline rung) and the
    # pHash near-dup (banded Hamming equi-join: candidate-bounded, the
    # x16 corpus grows same-group membership 16x so pair output grows
    # ~quadratically WITHIN groups while the join stays bucketed)
    "jpeg420_decode_stats",
    "jpeg_progressive_decode_stats",
    "image_phash_dedup",
    # round-6 late additions: PNG (zlib inflate + filters), GIF (LZW)
    # and G.711 (stateless expansion) — all row-local like the JPEG
    # rungs, should track row count sub-linearly
    "png_decode_stats",
    "gif_decode_stats",
    "g711_decode_stats",
    # round-6 final additions: WARC walker is row-local; the URL rung
    # is pure Catalyst (one hash aggregation — should be the cheapest
    # scaler in the table)
    "warc_ingest_stats",
    "url_host_stats",
    # round-6 continuation: tar shards are row-local like WARC but odd
    # docs run the PURE-PYTHON inflate (the deliberate verification
    # path — stdlib zlib remains the hot path elsewhere), so this is
    # the tier's slowest constant; video is row-local with half the
    # frames skipped before any pixel work
    "tar_shard_ingest",
    "video_decode_stats",
    # the dedup TRANSFORM shuffles segment strings (bounded by corpus
    # dup structure — the x16 copies multiply cross-copy dup hits);
    # the spectral rung is row-local int64 matmul like the codecs
    "segment_dedup_clean",
    "audio_spectral_bins",
    # continuation closers: all row-local kernels except robots (its
    # rules side is fixed at 50 hosts — pure URL-side growth)
    "wds_image_pipeline",
    "image_augment_stats",
    "mojibake_repair",
    "robots_url_filter",
    "crawl_curation_pipeline",
    "zip_shard_ingest",
    "avro_ingest_stats",
    "tiff_decode_stats",
    # round-7: the codec-boundary rungs are all row-local Arrow kernel
    # work (should track row count): TIFF-LZW, the four new JPEG
    # processes, sub-byte/16-bit PNG, the 4:2:0 AVI, snappy Avro,
    # ADPCM and the Parquet encodings. BWT is row-local but O(len^2
    # log len) per doc in rotation sorting — constant per doc, rows
    # scale it linearly. The KN models are word-keyed shuffles with
    # partial aggregation: the x16 corpus multiplies counts, not
    # distinct grams, so the model tables should grow SUB-linearly
    # while the scan cost tracks input.
    "tiff_lzw_decode_stats",
    "jpeg12_decode_stats",
    "jpeg_arith_decode_stats",
    "jpeg_lossless_decode_stats",
    "jpeg_hier_decode_stats",
    "png16_decode_stats",
    "png_subbyte_decode_stats",
    "video420_decode_stats",
    "avro_snappy_ingest",
    "audio_adpcm_stats",
    "columnar_encoding_stats",
    "bwt_transform_stats",
    "ngram_lm_kneser_ney",
    "ngram_lm_kn_trigram",
]
# The REGISTERED winnow pair join applies the stop-fingerprint filter
# by default since round 4 (fingerprints shared by > WINNOW_HOT_FP_CAP
# docs are dropped in-plan), so the x16 degenerate corpus — 8.5k
# distinct fps over 80k docs, max bucket 61k, 1.9e9 pair rows from one
# bucket under the old uncapped default — now completes bounded and the
# query probes at EVERY scale. The uncapped exact form remains the
# hot_fp_cap=None knob; its quadratic x16 story stays documented in
# BASELINE.md round-3 notes.
PROBES.insert(PROBES.index("pretrain_mix_pipeline"), "winnow_neardup_pairs")


# SPARK_GRAFT_PROBE_VOCAB_GROW=1 switches the documents inflation from
# near-duplicate clones (prefix tag — vocabulary SATURATES, the
# self-similar-crawl axis) to copy-unique tokens (every token suffixed
# per copy — vocabulary grows x COPIES, the adversarial axis for any
# operator whose shuffle is bounded by distinct grams/terms). Dir gets
# a "v" suffix so both corpora can coexist.
VOCAB_GROW = os.environ.get("SPARK_GRAFT_PROBE_VOCAB_GROW") == "1"


def build_inflated(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "documents.parquet", "_SUCCESS")):
        return
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    parts = []
    for i in range(COPIES):
        if VOCAB_GROW:
            text = F.regexp_replace("text", r"([A-Za-z]+)", rf"$1q{i}x")
        else:
            # perturb text per copy so copies are near- (not exact-)
            # duplicates: realistic for crawl re-scrapes
            text = F.concat(F.lit(f"cp{i} "), F.col("text"))
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + 4).alias("n_chars"),
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(max(8, COPIES // 4)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


EVENT_PROBES = [
    "sessionize",
    "asof_join",
    "activity_gaps",
    "rolling_active_users",
    "join_skew_profile",
    # round-5 KV tier over the derived ops log (events-based): dedup =
    # one extra (client, op) shuffle; snapshot replay = two fold slices;
    # the migration ledger is one aggregate + broadcast diff (~flat)
    "kv_replay_dedup",
    "kv_snapshot_replay",
    "shard_migration",
    # round-6: the streaming dedup twin re-streams the inflated events
    # through micro-batches; state is O(1) per client (last op id), so
    # the wall should track input growth plus the fixed streaming
    # machinery floor
    "stream_kv_dedup",
]


def build_inflated_events(spark, out_dir: str) -> None:
    """4x events: user/event ids shifted per copy (4x users, same time
    span — the organic growth axis for per-user window analytics)."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "events.parquet", "_SUCCESS")):
        return
    ev = spark.read.parquet(f"{BASE_SF}/events.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(max(8, COPIES // 4)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )


EMB_PROBES = [
    # round-8 (VERDICT r7 #4): the ANN tier at the decade scale. The
    # brute-force top-k is a linear scan against a broadcast query
    # side; IVF/LSH probe only their buckets (training stays capped-
    # sample driver-side); semdedup pairs are salted within cells.
    "ann_topk_cosine",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "semdedup_drops",
]


def build_inflated_embeddings(spark, out_dir: str) -> None:
    """COPIES x embeddings: vec ids shifted per copy, each copy's
    vectors deterministically nudged (+copy-dependent epsilon on every
    dim) so copies are near- but not exact-duplicates — the SemDeDup /
    near-dup-ANN stress axis, mirroring the documents inflation."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "embeddings.parquet", "_SUCCESS")):
        return
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    parts = []
    for i in range(COPIES):
        eps = (i % 13) * 1e-3
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.expr(
                    f"transform(embedding, x -> cast(x + {eps} AS float))"
                ).alias("embedding"),
                "label",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(max(8, COPIES // 4)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def main() -> None:
    import __spark_entry__ as mod
    from tinymapreduce_spark.session import get_spark

    spark = get_spark(app_name="scale-probe", cpus="32")
    q = mod.queries()
    suffix = "v" if VOCAB_GROW else ""
    out_dir = os.path.join(REPO, ".tmp", f"sfx{COPIES}{suffix}")
    os.makedirs(out_dir, exist_ok=True)
    build_inflated(spark, out_dir)
    if not VOCAB_GROW:  # the vocab-grow corpus probes document ops only
        build_inflated_events(spark, out_dir)
        build_inflated_embeddings(spark, out_dir)

    # warm python workers / codegen like bench.py does
    spark.range(256, numPartitions=32).mapInPandas(lambda it: it, "id long").count()

    # optional CLI filter: python tools/scale_probe.py q1 q2 ...
    # CLI names run verbatim (any registry key), so one-off laps can
    # probe flagship compositions the preset lists don't carry.
    selected = sys.argv[1:]
    names = selected or (PROBES + EVENT_PROBES + EMB_PROBES)
    print(
        f"{'query':28s} {'sf0.1':>8s} {f'x{COPIES}':>8s} {'ratio':>6s}"
        f"  rows(base->x{COPIES})"
    )
    for name in names:
        fn = q[name]
        t0 = time.time()
        n1 = fn(spark, BASE_SF).count()
        t1 = time.time() - t0
        t0 = time.time()
        n2 = fn(spark, out_dir).count()
        t2 = time.time() - t0
        print(
            f"{name:28s} {t1:7.2f}s {t2:7.2f}s {t2 / max(t1, 1e-9):5.1f}x  {n1}->{n2}"
        )


# -- TPC-H relational tier x{COPIES} -----------------------------------

TPCH_SHIFTS = {
    "customer": [("c_custkey", 10_000_000)],
    "supplier": [("s_suppkey", 1_000_000)],
    "part": [("p_partkey", 10_000_000)],
    "orders": [("o_orderkey", 1_000_000_000), ("o_custkey", 10_000_000)],
    "lineitem": [
        ("l_orderkey", 1_000_000_000),
        ("l_partkey", 10_000_000),
        ("l_suppkey", 1_000_000),
    ],
}
TPCH_COPY_VERBATIM = ["region", "nation", "events", "documents", "embeddings"]
TPCH_PROBES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "global_sort_range",
    "rollup_revenue",
    "topk_per_group",
    "merge_upsert",
    "pagerank_trade",
]


def build_inflated_tpch(spark, out_dir: str) -> None:
    """COPIES x the relational star: fact/dimension keys shifted per copy
    so FK joins stay consistent (nation/region shared — the realistic
    axis: more customers/orders/parts, same geography)."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "lineitem.parquet", "_SUCCESS")):
        return
    for t, shifts in TPCH_SHIFTS.items():
        base = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            df = base
            for col, step in shifts:
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(df)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(8).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    for t in TPCH_COPY_VERBATIM:
        spark.read.parquet(f"{BASE_SF}/{t}.parquet").write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )


def main_tpch() -> None:
    import __spark_entry__ as mod
    from tinymapreduce_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe-tpch", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    q = mod.queries()
    out_dir = os.path.join(REPO, ".tmp", f"tpchx{COPIES}")
    os.makedirs(out_dir, exist_ok=True)
    build_inflated_tpch(spark, out_dir)
    spark.range(256, numPartitions=32).mapInPandas(lambda it: it, "id long").count()
    print(
        f"{'query':28s} {'sf0.1':>8s} {f'x{COPIES}':>8s} {'ratio':>6s}"
        f"  rows(base->x{COPIES})"
    )
    # CLI names run verbatim, as in main()
    for name in sys.argv[1:] or TPCH_PROBES:
        fn = q[name]
        t0 = time.time()
        n1 = fn(spark, BASE_SF).count()
        t1 = time.time() - t0
        t0 = time.time()
        n2 = fn(spark, out_dir).count()
        t2 = time.time() - t0
        print(
            f"{name:28s} {t1:7.2f}s {t2:7.2f}s {t2 / max(t1, 1e-9):5.1f}x  {n1}->{n2}"
        )


# -- planted-skew probe (VERDICT r6 #4) --------------------------------
#
# A Zipfian hot-key corpus: SKEW_HOT_PCT% of rows carry ONE join key,
# the rest spread over SKEW_COLD_KEYS. The probe times the same
# shuffle join three ways at x4 and x64 (a 16x growth step with
# measurable walls) so the skew mitigations' value is MEASURED, not
# plan-pinned:
#   unsalted/AQE-off  — the degenerate control: one task owns the hot
#                       partition, wall tracks hot-key rows 1-threaded
#   unsalted/AQE-on   — Spark's runtime skew-join split
#   salted/AQE-off    — the engine's deterministic salting
#                       (layout.salted_skew_join's strategy)
# Reference analog: straggler re-issue (src/mr/coordinator.go:158-186)
# attacks slow TASKS; salting/AQE attack slow KEYS — the data-skew twin.
# Run: SPARK_GRAFT_PROBE_MODE=skew python tools/scale_probe.py
# Results recorded in BASELINE.md round-7 notes.

SKEW_HOT_PCT = 85
SKEW_COLD_KEYS = 50
# 16x growth step sized so the hot partition genuinely binds: at x256
# the planted key owns ~21.8M rows — a single unsalted SMJ task sorts
# all of them 1-threaded while 31 cores idle; at x16 fixed costs still
# dominate every leg (that is the point of the comparison)
SKEW_SCALES = (16, 256)


def build_skewed_events(spark, out_dir: str, copies: int) -> str:
    """Slim (event_id, event_type, value) corpus, event_type re-keyed
    Zipfian-style: one planted hot key + a cold tail. Deterministic
    (xxhash64 of event_id, no rand()) so every run probes identical
    bytes."""
    from pyspark.sql import functions as F

    dest = os.path.join(out_dir, "events.parquet")
    if os.path.exists(os.path.join(dest, "_SUCCESS")):
        return out_dir
    ev = spark.read.parquet(f"{BASE_SF}/events.parquet").select(
        "event_id", "value"
    )
    parts = []
    for i in range(copies):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                "value",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    h = F.pmod(F.xxhash64("event_id"), F.lit(100))
    big = big.withColumn(
        "event_type",
        F.when(h < F.lit(SKEW_HOT_PCT), F.lit("hot")).otherwise(
            F.concat(
                F.lit("cold_"),
                F.pmod(F.xxhash64(F.col("event_id") + F.lit(1)), F.lit(SKEW_COLD_KEYS)).cast("string"),
            )
        ),
    )
    big.repartition(8).write.mode("overwrite").parquet(dest)
    return out_dir


def _skew_probe_join(spark, sf_dir: str, salted: bool):
    """The probe join, mirroring layout.salted_skew_join's shape on the
    slim corpus: big (Zipfian event_type) x dim (one row per key),
    merge-hinted so the shuffle actually happens (broadcast would be the
    right plan for a 51-row dim — the probe deliberately forecloses it
    to exercise the mitigation, the same reason the registered query
    does)."""
    from pyspark.sql import functions as F

    from tinymapreduce_spark.plans.layout import SALT_BUCKETS

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # materialize the (51-row) dim: in the registered query the agg is
    # inline, but AQE's OptimizeSkewedJoin only pattern-matches
    # SMJ(sort(shuffleStage), sort(shuffleStage)) — an aggregate between
    # the dim's exchange and the join defeats it, so the AQE leg would
    # silently measure nothing. A checkpointed dim is also the realistic
    # shape (dims are tables, not inline subqueries, in a real pipeline).
    dim = (
        ev.groupBy("event_type")
        .agg(F.avg("value").alias("type_avg"))
        .localCheckpoint(eager=True)
    )
    if salted:
        big = ev.withColumn(
            "salt",
            F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).cast("int"),
        )
        dim = dim.select(
            "event_type",
            "type_avg",
            F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))).alias("salt"),
        ).hint("merge")
        joined = big.join(dim, ["event_type", "salt"])
    else:
        joined = ev.join(dim.hint("merge"), "event_type")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("value") > F.col("type_avg"), 1)).alias("n_above"),
    )


def main_skew() -> None:
    from tinymapreduce_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-skew", cpus="32")
    dirs = {}
    for c in SKEW_SCALES:
        d = os.path.join(REPO, ".tmp", f"skewx{c}")
        os.makedirs(d, exist_ok=True)
        dirs[c] = build_skewed_events(spark, d, c)
    spark.range(256, numPartitions=32).mapInPandas(lambda it: it, "id long").count()

    legs = [
        ("unsalted_aqe_off", False, "false"),
        ("unsalted_aqe_on", False, "true"),
        ("salted_aqe_off", True, "false"),
    ]
    lo, hi = SKEW_SCALES
    print(f"{'leg':20s} {f'x{lo}':>8s} {f'x{hi}':>8s} {'ratio':>6s}   (16x data growth)")
    results = {}
    thresh = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    advisory = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    force = "spark.sql.adaptive.forceOptimizeSkewedJoin"
    saved = {k: spark.conf.get(k) for k in (thresh, advisory, force)}
    for name, salted, aqe in legs:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe)
        if aqe == "true":
            # the probe corpus is small in BYTES (3 slim columns) even
            # when the hot key owns 21M rows — at the 256 MB default the
            # runtime split never fires; a real cluster tunes this to
            # its partition-size envelope, so the AQE leg does too.
            # forceOptimizeSkewedJoin: the join output feeds a groupBy
            # on the same key, so WITHOUT force AQE declines to split
            # (it would add a shuffle to restore the required hash
            # distribution); force accepts that extra exchange — the
            # trade a real skew victim gladly makes
            spark.conf.set(thresh, "8MB")
            spark.conf.set(advisory, "8MB")
            spark.conf.set(force, "true")
        else:
            for k, v in saved.items():
                spark.conf.set(k, v)
        walls = {}
        for c in SKEW_SCALES:
            # warm run first (codegen + scan cache), then the timed run;
            # counts pin output equality across legs
            _skew_probe_join(spark, dirs[c], salted).count()
            t0 = time.time()
            n = _skew_probe_join(spark, dirs[c], salted).count()
            walls[c] = time.time() - t0
            results[(name, c)] = (walls[c], n)
        print(
            f"{name:20s} {walls[lo]:7.2f}s {walls[hi]:7.2f}s "
            f"{walls[hi] / max(walls[lo], 1e-9):5.1f}x"
        )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    for k, v in saved.items():
        spark.conf.set(k, v)
    # row counts must agree across legs at each scale (salting is
    # result-invariant; a mismatch would invalidate the walls)
    for c in SKEW_SCALES:
        ns = {results[(name, c)][1] for name, _, _ in legs}
        assert len(ns) == 1, f"row-count divergence at x{c}: {ns}"
    print("row counts agree across legs at every scale")


if __name__ == "__main__":
    mode = os.environ.get("SPARK_GRAFT_PROBE_MODE")
    if mode == "tpch":
        main_tpch()
    elif mode == "skew":
        main_skew()
    else:
        main()
