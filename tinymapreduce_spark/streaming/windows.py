"""Structured Streaming forms of the event analytics.

The reference's only stream-like object is the ordered Raft apply channel
(SURVEY.md §1.4); event-time windowing/watermarks are new capability. The
batch twins (plans/events.py) are the SQL-oracle-able forms; these run the
same logic through the streaming engine (micro-batch over the parquet
files, memory sink) to certify the streaming path end-to-end.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts per event_type via readStream +
    watermark, drained synchronously into a memory sink.

    Complete output mode so every window is emitted even though the
    bounded input never advances the watermark past the last window —
    batch-equivalent results, checkable against the same SQL oracle as
    the batch form (window start == date_trunc('hour') for aligned
    windows).
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # File-stream sources need a directory basePath; glob-filter down to
    # the events table within the sf dir.
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # ts arrives as long nanos (see sources/loaders.py) — convert before
    # event-time operations.
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(
        f"""
        SELECT unix_micros(window.start) AS window_start_us, event_type, n, total_value
        FROM {name}
        """
    )
    # Materialize before the memory sink table is dropped by session reuse.
    return out


STREAM_TUMBLING_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""
