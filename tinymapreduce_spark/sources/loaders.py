"""Parquet sources for the driver testdata star schema (TESTDATA.md).

The reference's only source is a whole-file text scan
(``/root/reference/src/mr/worker.go:78-89`` — SURVEY.md §2.1 S1); here the
engine reads columnar Parquet so Catalyst gets predicate pushdown, column
pruning and partition pruning for free. ``text_documents`` exposes the
reference-shaped ``(filename, contents)`` view over the ``documents`` table
so every MR-era query still runs unchanged.

Scale posture: loaders never collect, never infer schema from data
(Parquet footers carry it), and never coalesce — partition layout is left
to the file scan + AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that are always broadcast-join candidates at any
# scale factor (they grow ~O(1) or ~O(sf) with tiny constants).
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Pure metadata op — no job is triggered.

    ``events.ts`` normalization — the generator has shipped this column as
    both TIMESTAMP(NANOS) and TIMESTAMP_NTZ(MICROS) across rounds, so accept
    either and present one canonical type (session-tz TIMESTAMP, UTC):

    - TIMESTAMP(NANOS) + ``spark.sql.legacy.parquet.nanosAsLong`` → arrives
      as a long; integer-divide to micros (`div`, not `/` — double division
      would lose precision on epoch-nanos > 2^53).
    - TIMESTAMP_NTZ → cast to TIMESTAMP; with the session pinned to UTC the
      wall-clock value is reinterpreted as the same UTC instant, matching
      the DuckDB oracle's naive-as-UTC semantics.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Canonicalize ``events.ts`` to session-tz TIMESTAMP (UTC) regardless
    of which physical form the generator shipped (see load_table docstring).
    Shared by the batch loader and every streaming reader."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def events_stream_source(spark: SparkSession, sf_dir: str, schema=None) -> DataFrame:
    """``readStream`` source for the events table, robust to BOTH
    physical layouts a corpus dir can ship: a single ``events.parquet``
    FILE beside its sibling tables (driver testdata — glob-filter the
    parent dir so the file source lists exactly that file) or an
    ``events.parquet`` DIRECTORY of part files (Spark-written corpora,
    e.g. the ×N scale-probe inflations, where a parent-dir glob on the
    directory NAME matches no leaf file and the stream silently reads
    zero batches). Returns the RAW frame — callers keep their own
    ``normalize_event_ts`` / projection chains."""
    import os

    path = os.path.join(sf_dir, "events.parquet")
    if schema is None:
        schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        return spark.readStream.schema(schema).parquet(path)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread_for_cpu(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Fan a narrowly-partitioned scan out to the session's parallelism
    before CPU-heavy per-row work (shingling, per-token hashing, Python
    UDF batches).

    The driver testdata ships each table as ONE parquet file with ONE
    row group, so however Spark splits the byte range, exactly one task
    ever decodes rows — and any expression-heavy stage fused onto the
    scan runs single-threaded. When the downstream cost is dozens of
    hash/regex evaluations per row, a one-time shuffle of the (tiny)
    source relation is orders of magnitude cheaper than serializing the
    CPU work.

    Scale posture: gated on the FILE COUNT (metadata only, no job). On
    a real 100 TB table the scan has thousands of files/row groups and
    yields >= cores natural splits, so this is a no-op there — the gate
    exists precisely so the small-file fix cannot turn into a
    full-corpus shuffle at scale.
    """
    parallelism = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < parallelism:
        return df.repartition(parallelism)
    return df


def local_literal_frame(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """A tiny driver-literal DataFrame on ONE partition.

    ``spark.createDataFrame(rows)`` parallelizes local data into
    ``sc.defaultParallelism`` slices, so a ONE-ROW frame (broadcast
    centroids, perceptron weights, metadata rows) scans as a 32-task
    stage — and the iterative operators rebuild such a frame EVERY
    round/micro-batch, so each broadcast build paid a full-width task
    wave for one row (round-11 event-log finding: the unexplained
    32-task 0.26 s job per kmeans round / per stream_ann batch was
    exactly this). One explicit slice keeps the scan one task; the
    plan stays an ExistingRDD leaf, so per-round codegen reuse (the
    reason these are data rows, not literal expression trees) is
    unchanged. At any scale these frames are O(K) constants."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def documents_for_cpu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``documents`` table, fanned out for CPU-heavy per-doc work."""
    return spread_for_cpu(spark, load_table(spark, sf_dir, "documents"))


def text_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-shaped corpus view: ``(filename, contents)``.

    Mirrors the map-task input contract ``Map(filename, contents)``
    (``/root/reference/src/mrapps/wc.go:21``): one row per whole document.
    doc_id stands in for the filename (stable, unique). Spread for CPU:
    the consumers of this view run arbitrary Python map functions per
    document (the MR shim), the textbook case for fan-out.
    """
    return documents_for_cpu(spark, sf_dir).select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("filename"),
        F.col("text").alias("contents"),
    )
