"""Dataset-curation operators: deterministic sampling and splits.

A 100 TB training pipeline samples and splits by CONTENT-STABLE hashes,
never by rand(): retried tasks, re-runs, and incremental arrivals must
route every document identically (the same determinism argument as the
reference's idempotent re-executed tasks,
``/root/reference/src/mr/coordinator.go:158-186``). md5 is the hash here
because both engines (Spark and the DuckDB oracle) implement it
bit-identically, making the sample itself oracle-checkable — not just
its size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tinymapreduce_spark.functions.text import tokens
from tinymapreduce_spark.sources.loaders import documents_for_cpu, load_table

SAMPLE_NUM = 32  # keep 32/256 ≈ 12.5% of documents


def _hash_byte(col: Column) -> Column:
    """First byte of md5(doc_id) as an int in [0, 256) — the routing
    value for sampling/splitting. Hashing the stable id (not the text)
    keeps membership fixed under text re-processing."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 2), 16, 10).cast("int")


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~12.5% document sample, stable across runs/retries/engines:
    keep doc iff first md5 byte < 32. Per-source sampled counts prove
    the sample is unbiased w.r.t. source."""
    docs = documents_for_cpu(spark, sf_dir)
    return (
        docs.where(_hash_byte(F.col("doc_id")) < SAMPLE_NUM)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


DETERMINISTIC_SAMPLE_SQL = f"""
SELECT source,
       COUNT(*) AS n_sampled,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS INT) < {SAMPLE_NUM}
GROUP BY source
"""


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split by hash bucket: bucket = first md5 byte mod 10;
    0-7 train, 8 val, 9 test. Adding documents later never moves an
    existing one between splits (no leakage across re-runs)."""
    docs = documents_for_cpu(spark, sf_dir)
    bucket = F.pmod(_hash_byte(F.col("doc_id")), F.lit(10))
    split = (
        F.when(bucket <= 7, F.lit("train")).when(bucket == 8, F.lit("val")).otherwise(F.lit("test"))
    )
    return docs.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )


TRAIN_VAL_TEST_SQL = """
WITH b AS (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS INT) % 10 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket <= 7 THEN 'train' WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
FROM b GROUP BY 1
"""


# Per-language keep thresholds out of 256 — the downsample-the-majority
# shape every multilingual training mix uses (keep all scarce langs, 25%
# of English). Stratum membership stays hash-stable per document.
STRATA_NUM = {"en": 64, "de": 256, "fr": 256, "es": 256, "zh": 256}
DEFAULT_NUM = 128


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: per-language keep fraction via
    the same md5-byte routing as deterministic_sample, so the selected
    SET (not just its size) is reproducible across runs and engines.
    One scan, no shuffle until the final tiny per-lang aggregate."""
    docs = documents_for_cpu(spark, sf_dir)
    thr = F.lit(DEFAULT_NUM)
    for lang, n in STRATA_NUM.items():
        thr = F.when(F.col("lang") == lang, F.lit(n)).otherwise(thr)
    return (
        docs.where(_hash_byte(F.col("doc_id")) < thr)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
    )


# Benchmark-contamination check: n-gram size and the deterministic
# "held-out eval set" slice (every 97th doc stands in for the benchmark
# suite). Real pipelines use 8-13-gram overlap (GPT-3/PaLM decontam);
# the synthetic corpus needs 3-grams to produce any overlap at all.
GRAM_N = 3
EVAL_MOD = 97


def _grams(d: DataFrame) -> DataFrame:
    """One row per (doc_id, n-gram string) — array built row-local with
    transform-over-sequence (guarded: short docs yield no grams), then
    exploded. At 100 TB the gram would travel as an xxhash64 long (as
    the dedup module does); strings here keep the oracle bit-checkable."""
    gram_arr = F.when(
        F.size("toks") >= GRAM_N,
        F.expr(
            f"transform(sequence(1, size(toks)-{GRAM_N - 1}),"
            f" i -> array_join(slice(toks, i, {GRAM_N}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.explode(gram_arr).alias("gram"))


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    3-gram with the held-out eval slice, counted per source.

    Scale shape: the eval side aggregates to a DISTINCT gram set first
    (tiny — ~1/97th of the corpus), which broadcasts; training grams
    then left-semi join against it with NO shuffle of the training side,
    and only contaminated doc_ids (a tiny set) reach the final
    aggregate. The 100 TB cost is one scan + one broadcast."""
    docs = documents_for_cpu(spark, sf_dir)
    d = docs.select("doc_id", "source", tokens("text").alias("toks"))
    grams = _grams(d)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_grams = grams.where(is_eval).select("gram").distinct()
    contaminated = (
        grams.where(~is_eval)
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        d.where(~is_eval)
        .select("doc_id", "source")
        .join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.count("hit").alias("n_contaminated"),
        )
    )


CONTAMINATION_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
         unnest([array_to_string(list_slice(toks, i, i+{GRAM_N - 1}), ' ')
                 for i in range(1, len(toks)-{GRAM_N - 2})]) AS gram
  FROM t
), e AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = 0
), c AS (
  SELECT DISTINCT doc_id FROM g
  WHERE doc_id % {EVAL_MOD} <> 0 AND gram IN (SELECT gram FROM e)
)
SELECT t.source,
       COUNT(*) AS n_train_docs,
       COUNT(c.doc_id) AS n_contaminated
FROM t LEFT JOIN c ON t.doc_id = c.doc_id
WHERE t.doc_id % {EVAL_MOD} <> 0
GROUP BY t.source
"""


# Sequence packing: concatenate-then-chunk documents into fixed
# token-budget training sequences. Routing is hash-bucketed so packing
# parallelizes; within a bucket the order (doc_id asc) and therefore
# every sequence boundary is deterministic and engine-independent.
SEQ_TOKENS = 256
PACK_BUCKETS = 8


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 256-token training sequences: docs route to
    one of 8 hash buckets, are laid end-to-end in doc_id order, and a
    doc's sequence id is its start offset div 256 (concatenate-then-
    chunk, the GPT-style packing rule). Emits per-sequence doc counts
    and token totals.

    One shuffle total (hash-partition by bucket); the running offset is
    a window sum inside each partition, and the final per-sequence
    aggregate reuses the same partitioning — no second exchange of the
    full data."""
    docs = documents_for_cpu(spark, sf_dir)
    d = docs.select(
        "doc_id",
        F.size(tokens("text")).alias("n_tok"),
        F.pmod(_hash_byte(F.col("doc_id")), F.lit(PACK_BUCKETS)).cast("long").alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return (
        d.withColumn("seq_id", F.floor(cum_before / SEQ_TOKENS))
        .groupBy("bucket", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
        )
    )


SEQUENCE_PACK_SQL = f"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '')) AS n_tok,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS INT) % {PACK_BUCKETS} AS bucket
  FROM documents
), s AS (
  SELECT bucket, doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM d
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(FLOOR(cum_before / {SEQ_TOKENS}.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS seq_tokens
FROM s
GROUP BY 1, 2
"""


_THR_CASE = " ".join(f"WHEN lang = '{lang}' THEN {n}" for lang, n in STRATA_NUM.items())

STRATIFIED_SAMPLE_SQL = f"""
SELECT lang,
       COUNT(*) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS INT)
      < (CASE {_THR_CASE} ELSE {DEFAULT_NUM} END)
GROUP BY lang
"""


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the embedding-pipeline
    primitive: every document becomes ceil(n/stride) chunks of up to
    CHUNK_TOKENS tokens, consecutive chunks sharing
    CHUNK_TOKENS-CHUNK_STRIDE tokens so no span falls on a boundary.

    Scale: pure codegen — tokenize once, `sequence()` generates the
    per-doc start offsets (data-proportional), `slice()` cuts each
    window from the in-row array; no shuffle at all, chunks stream
    straight to the sink. Chunk content is certified by md5 so the
    oracle compares text, not just counts."""
    docs = documents_for_cpu(spark, sf_dir)
    toked = docs.select("doc_id", tokens("text").alias("t")).withColumn(
        "n", F.size("t")
    )
    starts = toked.select(
        "doc_id",
        "t",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
        ).alias("s"),
    ).where(F.col("s") < F.col("n"))
    chunk = F.slice("t", F.col("s") + 1, CHUNK_TOKENS)
    return starts.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


DOC_CHUNK_SQL = f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '') AS t
  FROM documents
), starts AS (
  SELECT doc_id, t, len(t) AS n,
         UNNEST(generate_series(0, GREATEST(len(t) - 1, 0), {CHUNK_STRIDE})) AS s
  FROM toked
)
SELECT doc_id,
       CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(t, s + 1, s + {CHUNK_TOKENS})) AS INT) AS n_tokens,
       md5(array_to_string(list_slice(t, s + 1, s + {CHUNK_TOKENS}), ' ')) AS chunk_md5
FROM starts WHERE s < n
"""


MIN_TOKENS = 20


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline as ONE declarative plan — the
    composition the individual operators exist for:

      language filter (en/de) -> quality gate (>= MIN_TOKENS tokens)
      -> exact dedup (keep min doc_id per normalized-content group)
      -> overlapping chunking -> per (lang, source) corpus stats.

    Scale: expressed as a single DataFrame chain, Catalyst fuses the
    filters into the scan, the dedup is the only wide shuffle (16-byte
    md5 key, min/first per group), and chunk counting is arithmetic on
    the kept rows (ceil(n/stride)) — chunks are never materialized just
    to be counted. One job, two stages, at any corpus size."""
    from tinymapreduce_spark.functions.text import normalized_text, tokens

    docs = documents_for_cpu(spark, sf_dir)
    gated = (
        docs.where(F.col("lang").isin("en", "de"))
        .withColumn("n_tok", F.size(tokens("text")))
        .where(F.col("n_tok") >= MIN_TOKENS)
    )
    kept = (
        gated.select(
            F.md5(normalized_text("text")).alias("content_key"),
            F.struct("doc_id", "lang", "source", "n_tok").alias("rec"),
        )
        .groupBy("content_key")
        .agg(F.min("rec").alias("rec"))  # min doc_id wins (struct order)
        .select("rec.doc_id", "rec.lang", "rec.source", "rec.n_tok")
    )
    n_chunks = F.ceil(F.col("n_tok") / CHUNK_STRIDE)
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum(n_chunks).alias("n_chunks"),
    )


CURATION_PIPELINE_SQL = f"""
WITH gated AS (
  SELECT doc_id, lang, source,
         len(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '')) AS n_tok,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_key
  FROM documents
  WHERE lang IN ('en', 'de')
), sized AS (
  SELECT * FROM gated WHERE n_tok >= {MIN_TOKENS}
), kept AS (
  SELECT content_key,
         MIN({{'doc_id': doc_id, 'lang': lang, 'source': source, 'n_tok': n_tok}}) AS rec
  FROM sized GROUP BY content_key
), flat AS (
  SELECT rec.doc_id AS doc_id, rec.lang AS lang, rec.source AS source, rec.n_tok AS n_tok
  FROM kept
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(CEIL(CAST(n_tok AS DOUBLE) / {CHUNK_STRIDE}) AS BIGINT)) AS BIGINT) AS n_chunks
FROM flat
GROUP BY lang, source
"""

WEIGHTED_K = 50


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sample: top-``WEIGHTED_K`` docs
    by priority ``u / n_chars`` ascending, where ``u`` is a uniform int
    from md5(doc_id) — longer documents draw smaller priorities and are
    proportionally more likely to make the cut (the priority-sampling
    scheme of Duffield et al., with the exponential clock replaced by a
    hash-uniform one).

    Arithmetic is deliberately ln/pow-free: IEEE division is exactly
    rounded, so Spark and DuckDB compute bit-identical priorities and
    the selected SET — not just its size — oracle-checks. At scale this
    is one scan + one top-k (TakeOrderedAndProject), no full sort."""
    docs = documents_for_cpu(spark, sf_dir)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast("long")
    pri = u / F.col("n_chars")
    return (
        docs.select("doc_id", "source", "n_chars", pri.alias("pri"))
        .orderBy(F.asc("pri"), F.asc("doc_id"))
        .limit(WEIGHTED_K)
        .select("doc_id", "source", "n_chars")
    )


WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars
FROM documents
ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT AS DOUBLE) / n_chars ASC,
         doc_id ASC
LIMIT {WEIGHTED_K}
"""


CAP_PER_SOURCE = 8


def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota — the anti-domination rule of web-scale
    mixes (no single domain may contribute more than N docs): keep the
    ``CAP_PER_SOURCE`` longest docs per source, ties broken by doc_id so
    the kept set is deterministic.

    One shuffle on source for the row_number window. At 100 TB with a
    mega-domain the window partition itself skews; the fix is a first
    pass computing each hot source's n_chars cutoff (a tiny aggregate)
    and a broadcast-filtered second scan — same result, no giant
    partition. The direct form here is right while every source fits an
    executor."""
    docs = documents_for_cpu(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= CAP_PER_SOURCE)
    )


PER_SOURCE_CAP_SQL = f"""
SELECT doc_id, source, n_chars, CAST(rk AS INT) AS rk
FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= {CAP_PER_SOURCE}
"""


def mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing weights — given a target of a UNIFORM language
    mix, the per-language sampling weight w = target_share /
    actual_share that a downstream weighted sampler (see
    ``weighted_sample``) applies to hit the target. The last step of
    every corpus-mixing recipe (upweight rare languages / domains,
    downweight the dominant crawl).

    One column-pruned scan + a count aggregate over a handful of groups;
    the share divisions are exactly-rounded doubles from integer counts,
    so weights oracle-check bit-for-bit. At 100 TB the weight table is
    tiny and broadcasts onto the sampling pass."""
    docs = documents_for_cpu(spark, sf_dir)
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("total"), 6).alias("actual_share"),
            F.round(
                (F.col("total").cast("double") / F.col("n_langs")) / F.col("n_docs"), 6
            ).alias("weight"),
        )
    )


MIX_WEIGHTS_SQL = """
WITH counts AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
), totals AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS total, COUNT(*) AS n_langs FROM counts
)
SELECT lang, n_docs,
       ROUND(CAST(n_docs AS DOUBLE) / total, 6) AS actual_share,
       ROUND((CAST(total AS DOUBLE) / n_langs) / n_docs, 6) AS weight
FROM counts, totals
"""


TRAIN_SHUFFLE_EPOCH = 1
TRAIN_SHUFFLE_SHARDS = 8


def training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle for training-data loading: every doc
    routes to one of TRAIN_SHUFFLE_SHARDS worker shards by a stable hash
    and gets a pseudo-random position WITHIN its shard (order by
    md5(epoch, doc_id)) — exactly how distributed loaders consume a
    corpus (each worker streams its own shard in shuffled order; a new
    epoch constant reshuffles everything, reproducibly).

    Scale shape: one shuffle on shard, then a PER-SHARD row_number
    (partitioned window — NOT the single-task global-ntile shape; each
    shard sorts in parallel). No global total order is ever computed,
    because loaders don't need one."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(
        F.concat_ws("-", F.lit(f"epoch{TRAIN_SHUFFLE_EPOCH}"), F.col("doc_id").cast("string"))
    )
    shard = F.pmod(_hash_byte(F.col("doc_id")), F.lit(TRAIN_SHUFFLE_SHARDS))
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        docs.select("doc_id", shard.cast("int").alias("shard"), key.alias("shuffle_key"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


TRAINING_SHUFFLE_SQL = f"""
SELECT doc_id, shard,
       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS pos
FROM (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS INT) % {TRAIN_SHUFFLE_SHARDS} AS INT) AS shard,
         md5('epoch{TRAIN_SHUFFLE_EPOCH}-' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
)
"""


TOKEN_BUDGET_DEN = 5  # global budget = 1/5 of corpus whitespace tokens


def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-BUDGET mixture construction — the pretraining recipe's
    final sizing step. ``mix_weights`` computes per-group rates and
    ``weighted_sample`` thins rows, but a real data mix is specified in
    TOKENS: "300B tokens total, temperature-weighted across sources".
    Here: global budget = corpus_tokens/5, allocated across sources
    ∝ floor(sqrt(source_tokens)) (temperature-0.5 allocation — rare
    sources get super-proportional share, the dominant crawl is
    capped), then each source fills its budget greedily in md5-priority
    order (retry/engine-stable), keeping a doc iff the tokens BEFORE it
    are under budget — so every source overshoots by at most one doc.

    Everything is integer arithmetic (floor-sqrt, DIV allocation,
    windowed running sums), so the chosen set — not just its size —
    replays exactly in the oracle. One scan + one per-source window
    shuffle; the allocation table is O(#sources) and broadcasts."""
    docs = documents_for_cpu(spark, sf_dir)
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    toks = docs.select(
        "doc_id",
        "source",
        F.size(ws).cast("long").alias("n_tok"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("pri"),
    )
    src = toks.groupBy("source").agg(F.sum("n_tok").alias("src_tok"))
    src = src.withColumn(
        "w", F.floor(F.sqrt(F.col("src_tok").cast("double"))).cast("long")
    )
    tot = src.agg(
        F.sum("src_tok").alias("total_tok"), F.sum("w").alias("sum_w")
    )
    # NULLIF: a corpus whose every doc tokenizes to nothing has sum_w=0
    # — allocate zero rather than divide by zero (DuckDB would error)
    alloc = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "src_tok",
        F.expr(
            f"COALESCE((total_tok DIV {TOKEN_BUDGET_DEN}) * w DIV NULLIF(sum_w, 0), 0)"
        ).alias("budget_tok"),
    )
    win = (
        Window.partitionBy("source")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tok").over(win), F.lit(0).cast("long"))
    ranked = toks.join(F.broadcast(alloc), "source").withColumn(
        "cum_before", cum_before
    )
    keep = F.col("cum_before") < F.col("budget_tok")
    return ranked.groupBy("source").agg(
        F.max("src_tok").alias("src_tokens"),
        F.max("budget_tok").alias("budget_tokens"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_docs_kept"),
        F.sum(F.when(keep, F.col("n_tok")).otherwise(0)).cast("long").alias("tokens_kept"),
    )


TOKEN_BUDGET_MIX_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS pri
  FROM documents
), src AS MATERIALIZED (
  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok,
         CAST(FLOOR(SQRT(CAST(SUM(n_tok) AS DOUBLE))) AS BIGINT) AS w
  FROM toks GROUP BY source
), tot AS (
  SELECT CAST(SUM(src_tok) AS BIGINT) AS total_tok, CAST(SUM(w) AS BIGINT) AS sum_w FROM src
), alloc AS MATERIALIZED (
  SELECT source, src_tok,
         COALESCE((total_tok // {TOKEN_BUDGET_DEN}) * w // NULLIF(sum_w, 0), 0) AS budget_tok
  FROM src, tot
), ranked AS (
  SELECT t.source, t.n_tok, a.src_tok, a.budget_tok,
         COALESCE(SUM(t.n_tok) OVER (
           PARTITION BY t.source ORDER BY t.pri, t.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM toks t JOIN alloc a USING (source)
)
SELECT source,
       MAX(src_tok) AS src_tokens,
       MAX(budget_tok) AS budget_tokens,
       CAST(SUM(CASE WHEN cum_before < budget_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(SUM(CASE WHEN cum_before < budget_tok THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
FROM ranked GROUP BY source
"""


def exact_quota_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-quota stratified split — ``train_val_test_split``'s hash
    buckets hit 80/10/10 only in expectation; evaluation protocols often
    need the quota exact PER STRATUM. Within each language, docs are
    ranked by md5 priority (stable across runs/engines) and the first
    floor(n*8/10) go to train, the next floor(n*1/10) to val, the
    remainder to test — integer quota arithmetic, so membership (not
    just counts) replays exactly in the oracle. One per-stratum window
    shuffle; the quota math is constant-space. The trade vs the hash
    split is the known one: adding documents later RESHUFFLES membership
    near quota boundaries (ranks shift), which is why the hash split
    stays the incremental-pipeline default."""
    docs = documents_for_cpu(spark, sf_dir)
    pri = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("lang").orderBy(pri, "doc_id")
    ranked = docs.select("doc_id", "lang", F.length("text").alias("n_chars_txt")).withColumn(
        "rk", F.row_number().over(w)
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("lang")))
    split = (
        F.when(F.col("rk") <= F.expr("n * 8 DIV 10"), F.lit("train"))
        .when(F.col("rk") <= F.expr("n * 8 DIV 10 + n * 1 DIV 10"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return ranked.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("first_doc_id"),
        F.sum("n_chars_txt").alias("total_chars"),
    )


EXACT_QUOTA_SPLIT_SQL = """
WITH ranked AS (
  SELECT doc_id, lang, LENGTH(text) AS n_chars_txt,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id
         ) AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang,
       CASE WHEN rk <= n * 8 // 10 THEN 'train'
            WHEN rk <= n * 8 // 10 + n * 1 // 10 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       MIN(CASE WHEN rk = 1 THEN doc_id END) AS first_doc_id,
       CAST(SUM(n_chars_txt) AS BIGINT) AS total_chars
FROM ranked GROUP BY 1, 2
"""


PIPE2_MIN_WORDS, PIPE2_MAX_WORDS = 10, 100_000
PIPE2_ALPHA_NUM, PIPE2_ALPHA_DEN = 4, 5  # >= 80% words contain a letter


def pretrain_mix_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline composition v2 — the SIZING half of corpus construction,
    chained as ONE declarative plan (the quality/chunking half is
    ``curation_pipeline``):

      Gopher-style gate (word-count bounds + >=80% alpha-words)
      -> exact dedup (keep min doc_id per normalized content)
      -> temperature-0.5 token-budget fill per source
      (floor-sqrt allocation over the SURVIVORS' token mass,
      md5-priority greedy fill — the same integer algebra as
      ``token_budget_mix``, now downstream of gating + dedup).

    Output per source: docs in, gated, surviving dedup, kept by budget,
    tokens kept vs budget. Catalyst fuses the gate into the scan; the
    DATA-SIZED work is exactly one dedup shuffle (16-byte keys) plus
    one per-source window for the fill — every aggregate/join after
    runs on O(#sources) rows (the tiny frames joined with explicit
    broadcasts), and every count is integer-exact so the whole chain
    hash-checks."""
    docs = documents_for_cpu(spark, sf_dir)
    from tinymapreduce_spark.functions.text import normalized_text

    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    base = docs.select(
        "doc_id",
        "source",
        ws.alias("ws"),
        F.md5(normalized_text("text")).alias("content_key"),
    ).withColumn("n_tok", F.size("ws").cast("long"))
    alpha_ok = (
        F.size(F.filter("ws", lambda t: t.rlike("[A-Za-z]"))) * PIPE2_ALPHA_DEN
        >= F.col("n_tok") * PIPE2_ALPHA_NUM
    )
    gated = base.where(
        (F.col("n_tok") >= PIPE2_MIN_WORDS)
        & (F.col("n_tok") <= PIPE2_MAX_WORDS)
        & alpha_ok
    ).select("doc_id", "source", "content_key", "n_tok")
    survivors = (
        gated.select(
            "content_key", F.struct("doc_id", "source", "n_tok").alias("rec")
        )
        .groupBy("content_key")
        .agg(F.min("rec").alias("rec"))
        .select("rec.doc_id", "rec.source", "rec.n_tok")
    )
    src = survivors.groupBy("source").agg(F.sum("n_tok").alias("src_tok"))
    src = src.withColumn(
        "w", F.floor(F.sqrt(F.col("src_tok").cast("double"))).cast("long")
    )
    tot = src.agg(F.sum("src_tok").alias("total_tok"), F.sum("w").alias("sum_w"))
    alloc = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "src_tok",
        F.expr(
            f"COALESCE((total_tok DIV {TOKEN_BUDGET_DEN}) * w DIV NULLIF(sum_w, 0), 0)"
        ).alias("budget_tok"),
    )
    pri = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    win = (
        Window.partitionBy("source")
        .orderBy(pri, "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = survivors.join(F.broadcast(alloc), "source").withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(win), F.lit(0).cast("long"))
    )
    keep = F.col("cum_before") < F.col("budget_tok")
    stage_counts = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("docs_in"))
        .join(
            F.broadcast(
                gated.groupBy("source").agg(F.count(F.lit(1)).alias("docs_gated"))
            ),
            "source",
            "left",
        )
    )
    filled = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_deduped"),
        F.max("budget_tok").alias("budget_tokens"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("docs_kept"),
        F.sum(F.when(keep, F.col("n_tok")).otherwise(0)).cast("long").alias("tokens_kept"),
    )
    return stage_counts.join(F.broadcast(filled), "source", "left").select(
        "source",
        "docs_in",
        F.coalesce("docs_gated", F.lit(0).cast("long")).alias("docs_gated"),
        F.coalesce("docs_deduped", F.lit(0).cast("long")).alias("docs_deduped"),
        F.coalesce("budget_tokens", F.lit(0).cast("long")).alias("budget_tokens"),
        F.coalesce("docs_kept", F.lit(0).cast("long")).alias("docs_kept"),
        F.coalesce("tokens_kept", F.lit(0).cast("long")).alias("tokens_kept"),
    )


PRETRAIN_MIX_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_key
  FROM documents
), counted AS MATERIALIZED (
  SELECT doc_id, source, content_key,
         CAST(len(ws) AS BIGINT) AS n_tok,
         CAST(len(list_filter(ws, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha
  FROM base
), gated AS MATERIALIZED (
  SELECT doc_id, source, content_key, n_tok FROM counted
  WHERE n_tok >= {PIPE2_MIN_WORDS} AND n_tok <= {PIPE2_MAX_WORDS}
    AND n_alpha * {PIPE2_ALPHA_DEN} >= n_tok * {PIPE2_ALPHA_NUM}
), survivors AS MATERIALIZED (
  SELECT doc_id, source, n_tok FROM (
    SELECT doc_id, source, n_tok,
           ROW_NUMBER() OVER (PARTITION BY content_key ORDER BY doc_id) AS rk
    FROM gated
  ) WHERE rk = 1
), src AS MATERIALIZED (
  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok,
         CAST(FLOOR(SQRT(CAST(SUM(n_tok) AS DOUBLE))) AS BIGINT) AS w
  FROM survivors GROUP BY source
), tot AS (
  SELECT CAST(SUM(src_tok) AS BIGINT) AS total_tok, CAST(SUM(w) AS BIGINT) AS sum_w FROM src
), alloc AS MATERIALIZED (
  SELECT source,
         COALESCE((total_tok // {TOKEN_BUDGET_DEN}) * w // NULLIF(sum_w, 0), 0) AS budget_tok
  FROM src, tot
), ranked AS (
  SELECT s.source, s.n_tok, a.budget_tok,
         COALESCE(SUM(s.n_tok) OVER (
           PARTITION BY s.source
           ORDER BY ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 15))::BIGINT, s.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM survivors s JOIN alloc a USING (source)
), filled AS (
  SELECT source,
         COUNT(*) AS docs_deduped,
         MAX(budget_tok) AS budget_tokens,
         CAST(SUM(CASE WHEN cum_before < budget_tok THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
         CAST(SUM(CASE WHEN cum_before < budget_tok THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
  FROM ranked GROUP BY source
), stage AS (
  SELECT c.source, COUNT(*) AS docs_in,
         CAST(SUM(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_gated
  FROM counted c LEFT JOIN gated g USING (doc_id)
  GROUP BY c.source
)
SELECT s.source, s.docs_in,
       COALESCE(s.docs_gated, 0) AS docs_gated,
       COALESCE(f.docs_deduped, 0) AS docs_deduped,
       COALESCE(f.budget_tokens, 0) AS budget_tokens,
       COALESCE(f.docs_kept, 0) AS docs_kept,
       COALESCE(f.tokens_kept, 0) AS tokens_kept
FROM stage s LEFT JOIN filled f USING (source)
"""


# -- DSIR-style importance weighting ---------------------------------

DSIR_BUCKETS = 256  # hashed-unigram feature space (Xie et al. use 10^4 x bigrams)
DSIR_SCALE = 1_000_000  # log-ratio quantization: 1e-6 nats per unit


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    re-expressed Spark-first: score every document by how much more
    likely its hashed-unigram bag is under the TARGET distribution
    (here: the ``lang='en'`` slice, the stand-in for a high-quality
    domain) than under the RAW rest of the corpus.

    Exactness: bucket log-ratios are quantized ONCE per bucket —
    ``round(1e6 * ln((ct+1)(R+B) / ((cr+1)(T+B))))`` over exact integer
    counts (Laplace-smoothed) — and each document's score is then a SUM
    OF BIGINTS, so per-doc aggregation order cannot perturb the result;
    the only float work is one division + ln per bucket, the same
    cross-engine-stable shape as BM25's idf (`retrieval.py`).

    Scale: tokenize/bucket stays in codegen (split + md5 + pmod); the
    bucket-count aggregate is B=256 keys with map-side combine; the LUT
    is a 256-row broadcast; the per-doc sum is one O(corpus tokens)
    shuffle keyed by doc_id. Nothing is all-pairs, nothing collects.
    """
    from tinymapreduce_spark.functions.hashing import h60

    docs = documents_for_cpu(spark, sf_dir)
    B = DSIR_BUCKETS
    tok = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        F.explode(tokens("text")).alias("tok"),
    ).withColumn("b", F.pmod(h60(F.col("tok")), F.lit(B)))
    stats = tok.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("cr"),
    )
    totals = stats.agg(
        F.sum("ct").alias("t_tot"), F.sum("cr").alias("r_tot")
    )
    lut = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.col("ct") + F.lit(1.0)) * (F.col("r_tot") + F.lit(float(B))))
                    / ((F.col("cr") + F.lit(1.0)) * (F.col("t_tot") + F.lit(float(B))))
                )
                * DSIR_SCALE
            )
            .cast("long")
            .alias("w"),
        )
    )
    scores = (
        tok.join(F.broadcast(lut), "b")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("dsir_score"))
    )
    return (
        docs.join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("dsir_score"), F.lit(0)).cast("long").alias("dsir_score"),
            (F.coalesce(F.col("dsir_score"), F.lit(0)) > 0).alias("target_like"),
        )
    )


def _dsir_sql() -> str:
    from tinymapreduce_spark.functions.hashing import H60_SQL_TMPL

    B = DSIR_BUCKETS
    h = H60_SQL_TMPL.format(expr="tok")
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang = 'en' AS is_t,
         ({h}) % {B} AS b
  FROM (
    SELECT doc_id, lang,
           UNNEST(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '')) AS tok
    FROM documents
  )
), stats AS MATERIALIZED (
  SELECT b,
         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
  FROM tok GROUP BY b
), totals AS (
  SELECT SUM(ct) AS t_tot, SUM(cr) AS r_tot FROM stats
), lut AS MATERIALIZED (
  SELECT b,
         CAST(ROUND(ln(
           ((ct + 1.0) * (r_tot + {B}.0))
           / ((cr + 1.0) * (t_tot + {B}.0))
         ) * {DSIR_SCALE}) AS BIGINT) AS w
  FROM stats CROSS JOIN totals
), scores AS (
  SELECT t.doc_id, CAST(SUM(l.w) AS BIGINT) AS dsir_score
  FROM tok t JOIN lut l USING (b)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.dsir_score, 0) AS BIGINT) AS dsir_score,
       COALESCE(s.dsir_score, 0) > 0 AS target_like
FROM documents d LEFT JOIN scores s USING (doc_id)
"""


DSIR_SQL = _dsir_sql()


# --- Corpus Merkle root (round 7) --------------------------------------------
# Content-addressable integrity for the whole corpus: leaves are
# md5(doc_id || ':' || md5(text)) ordered by doc_id, interior nodes
# md5(left_hex || right_hex), an unpaired node promoted UNCHANGED
# (so extra folding levels are no-ops once the root is reached — the
# SQL oracle unrolls a fixed 16 levels, valid to 65536 leaves, while
# the Spark side loops until one row remains). The classic distributed
# tree reduction: each level is one shuffle on pos//2 halving the
# data; at 100 TB (2^40 docs) that is 40 halving shuffles — or fewer
# with a wider fan-in, the same plan shape.
MERKLE_LEVELS = 16


def corpus_merkle_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold the corpus into one Merkle root. Returns a single row
    (n_leaves, height, root_md5). Leaf positions come from a doc-level
    rank (serial over #docs rows only — the two-level prefix-sum note
    in vocab_growth_stats applies here too)."""
    docs = documents_for_cpu(spark, sf_dir).select("doc_id", "text")
    w = Window.orderBy("doc_id")
    level = docs.select(
        (F.row_number().over(w) - 1).alias("pos"),
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.md5(F.col("text")))
        ).alias("h"),
    )
    n_leaves = level.count()
    height = 0
    n = n_leaves
    while n > 1:
        level = (
            level.groupBy((F.col("pos") / 2).cast("long").alias("pos"))
            .agg(
                F.when(
                    F.count("*") == 2,
                    F.md5(
                        F.concat_ws(
                            "",
                            F.array_join(
                                F.transform(
                                    F.array_sort(
                                        F.collect_list(
                                            F.struct(
                                                F.col("pos").alias("p"),
                                                F.col("h").alias("h"),
                                            )
                                        )
                                    ),
                                    lambda s: s["h"],
                                ),
                                "",
                            ),
                        )
                    ),
                )
                .otherwise(F.min("h"))
                .alias("h")
            )
        )
        height += 1
        n = (n + 1) // 2
    root = level.select(F.col("h").alias("root_md5"))
    # cast the driver-side scalars to long: the oracle's BIGINT lands
    # as int64 and the driver's strict compare flags int32 vs int64
    return root.select(
        F.lit(n_leaves).cast("long").alias("n_leaves"),
        F.lit(height).cast("long").alias("height"),
        "root_md5",
    )


def _merkle_sql() -> str:
    fold = []
    prev = "l0"
    for k in range(1, MERKLE_LEVELS + 1):
        fold.append(f""",
l{k} AS (
  SELECT pos // 2 AS pos,
         CASE WHEN COUNT(*) = 2
              THEN md5(string_agg(h, '' ORDER BY pos))
              ELSE MIN(h) END AS h
  FROM {prev} GROUP BY pos // 2
)""")
        prev = f"l{k}"
    return f"""
WITH l0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS pos,
         md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)) AS h
  FROM documents
){"".join(fold)}
SELECT (SELECT COUNT(*) FROM l0) AS n_leaves,
       CAST(CEIL(LOG2((SELECT COUNT(*) FROM l0))) AS BIGINT) AS height,
       h AS root_md5
FROM {prev}
"""


CORPUS_MERKLE_SQL = _merkle_sql()
