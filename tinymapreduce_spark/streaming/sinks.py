"""Streaming sinks with exactly-once-visible output.

Structured Streaming's contract for custom sinks is at-least-once
delivery of micro-batches to ``foreachBatch`` — after a failure the same
(batchId, data) pair can be re-delivered. Exactly-once VISIBILITY is the
sink's job, via idempotent commits keyed by batchId (the published
pattern behind every transactional Spark sink). The WAP manifest table
(sources/manifest_sink.py) gives exactly that: ``publish(snapshot_id=
f"batch-{batch_id}")`` is a no-op when that id already committed, so a
replayed batch can never double-publish.

This is the streaming analog of the reference's exactly-once output
story (temp-file + rename per reduce task,
``/root/reference/src/mr/worker.go:160-184``) lifted to a versioned
multi-file table.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymapreduce_spark.sources.loaders import normalize_event_ts
from tinymapreduce_spark.sources.manifest_sink import ManifestTable
from tinymapreduce_spark.sources.textfiles import SCRATCH


def stream_wap_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals streamed into a WAP manifest table: each
    micro-batch publishes the complete-mode aggregate as one snapshot
    (snapshot_id = batch id), and the query returns the table's CURRENT
    version — which, for bounded input, equals the batch aggregate over
    all events (shared SQL oracle). Batch replays hit the idempotent
    no-op path, so recovery never double-counts."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    stream = normalize_event_ts(stream)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )

    # Fresh table per invocation: micro-batch ids restart at 0 per query,
    # so reusing a table dir across runs would no-op on stale snapshots.
    table = ManifestTable(os.path.join(SCRATCH, f"wap_stream_{uuid.uuid4().hex[:8]}"))

    def publish_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.publish(batch_df, snapshot_id=f"batch-{batch_id}")

    q = agg.writeStream.outputMode("complete").foreachBatch(publish_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return table.read(spark)


STREAM_WAP_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""
