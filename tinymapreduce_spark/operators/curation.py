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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymapreduce_spark.sources.loaders import load_table

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
    docs = load_table(spark, sf_dir, "documents")
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
    docs = load_table(spark, sf_dir, "documents")
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
    docs = load_table(spark, sf_dir, "documents")
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
