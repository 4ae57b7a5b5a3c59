"""The reference's concrete MR application queries (SURVEY.md §2.3),
re-expressed as declarative DataFrame plans over the ``documents`` table.

Each is a pure ``(spark, sf_dir) -> DataFrame``; the matching ANSI-SQL
oracle lives in ``__spark_entry__.py::oracle_sql``. The reference computes
all of these with a full sort + linear group scan per reduce partition
(``/root/reference/src/mr/worker.go:158-183``); here Catalyst picks
hash aggregation with map-side partial aggregation — strictly less data
through the shuffle (wc ships (word, partial_count) instead of one "1"
per occurrence — cf. ``/root/reference/src/mrapps/wc.go:29-32``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymapreduce_spark.functions.text import tokens
from tinymapreduce_spark.sources.loaders import load_table, text_documents


def word_count_df(docs: DataFrame) -> DataFrame:
    """Q1 plan body over any ``(filename, contents)`` corpus frame —
    shared by the parquet-backed query and the golden-corpus parity test
    over the reference's real ``pg-*.txt`` files."""
    return (
        docs.select(F.explode(tokens("contents")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — word count (``/root/reference/src/mrapps/wc.go:21-44``).

    Map = tokenize on non-letter runs; Reduce = count per word.
    Scale: explode happens map-side inside codegen; the shuffle carries
    only (word, partial count) thanks to hash-agg partial/final split.
    """
    return word_count_df(text_documents(spark, sf_dir))


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 — inverted index (``/root/reference/src/mrapps/indexer.go:20-39``).

    Per document: DISTINCT words (the reference builds a per-doc set,
    ``indexer.go:21-26``); per word: doc count + comma-joined sorted doc
    list. ``collect_set`` keeps the doc list dedup'd shuffle-side;
    output format mirrors the reference's ``"N doc1,doc2"`` value.
    """
    return inverted_index_df(text_documents(spark, sf_dir))


def inverted_index_df(docs: DataFrame) -> DataFrame:
    """Q2 plan body over any ``(filename, contents)`` corpus frame."""
    per_doc_words = docs.select(
        F.col("filename"), F.explode(F.array_distinct(tokens("contents"))).alias("word")
    )
    return per_doc_words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(F.array_sort(F.collect_set("filename")), ",").alias("doc_list"),
    )


def per_file_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 — per-file record counts (``/root/reference/src/mrapps/early_exit.go:21-40``).

    The reference emits (filename, "1") once per input file; generalized
    here to one count per corpus source partition (``documents.source``),
    the closest analog of "input file" in the testdata.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.col("source")).agg(F.count(F.lit(1)).alias("cnt"))


def sorted_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 — sorted group-concat (``/root/reference/src/mrapps/crash.go:34-55``,
    semantics identical to ``nocrash.go:26-47``).

    Reference Reduce = sort values, join with " ". Keys here are the
    document languages (small fixed key set, like the reference's literal
    keys a-d); values are the distinct sources seen for that language.
    ``sort_array`` + ``array_join`` keeps the whole reduce in codegen.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.col("lang").alias("key")).agg(
        F.array_join(F.array_sort(F.collect_set("source")), " ").alias("value")
    )


GOLDEN_MAIN = "/root/reference/src/main"


def golden_wc_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-golden parity as a driver-checkable query: run the Q1
    plan over the reference's OWN committed corpus
    (``/root/reference/src/main/pg-*.txt``, 8 Project Gutenberg books)
    and return the full (word, cnt) table. The oracle side parses the
    reference engine's committed verified output (``src/main/mymrout``,
    the file ``test-mr.sh:93-103`` diffs against the course golden), so
    a driver hash match IS byte-level parity with the reference engine,
    re-proven independently every round. ``sf_dir`` is unused — the
    corpus under test is the reference's, by design."""
    from tinymapreduce_spark.sources.textfiles import read_whole_text_files

    docs = read_whole_text_files(spark, f"{GOLDEN_MAIN}/pg-*.txt")
    return word_count_df(docs).select("word", F.col("cnt").cast("long"))


GOLDEN_WC_PARITY_SQL = f"""
SELECT word, cnt
FROM read_csv('{GOLDEN_MAIN}/mymrout', delim=' ', header=false,
              columns={{'word': 'VARCHAR', 'cnt': 'BIGINT'}})
WHERE word IS NOT NULL AND word <> ''
"""
