"""Watermark / late-data semantics: events arriving after the watermark
has passed their window must be dropped in append mode.

The reference has no event-time notion (SURVEY.md §1.4); this certifies
the NEW capability that Structured Streaming brings: out-of-order input
with a bounded-lateness contract, which is what makes windowed aggs
correct on an unordered 100 TB event feed.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyspark.sql.functions as F


def test_watermark_drops_late_rows(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("late_src"))
    schema = "event_id long, ts timestamp, v long"

    def write_batch(name: str, rows: list[tuple[int, str, int]]) -> None:
        df = spark.createDataFrame(
            [(i, ts, v) for i, ts, v in rows], "event_id long, ts string, v long"
        ).select("event_id", F.to_timestamp("ts").alias("ts"), "v")
        # one parquet file per batch, atomically moved into the source dir
        staging = src + f".stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        shutil.move(os.path.join(staging, part), os.path.join(src, f"{name}.parquet"))
        shutil.rmtree(staging)

    # batch 1: events in hours 10 and 12 -> watermark advances to 12:00 - 1h = 11:00
    write_batch(
        "b1",
        [
            (1, "2024-01-01 10:10:00", 1),
            (2, "2024-01-01 10:20:00", 1),
            (3, "2024-01-01 12:00:00", 1),
        ],
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # batch 2: one on-time event (hour 12) + one LATE event for hour 10,
        # which is behind the 11:00 watermark and must be dropped
        write_batch(
            "b2",
            [
                (4, "2024-01-01 12:30:00", 1),
                (5, "2024-01-01 10:30:00", 99),  # late!
            ],
        )
        q.processAllAvailable()
        # batch 3: advance event time far enough to close every window
        write_batch("b3", [(6, "2024-01-01 15:00:00", 1)])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        r["start"].strftime("%H:%M"): r["n"]
        for r in spark.sql(f"SELECT window.start AS start, n FROM {name}").collect()
    }
    # hour-10 window: only the two on-time events — the late one dropped
    assert rows.get("10:00") == 2
    # hour-12 window: both events (12:00 arrived in b1, 12:30 in b2, both on time)
    assert rows.get("12:00") == 2


def test_watermark_within_lateness_is_kept(spark, tmp_path_factory):
    """An out-of-order row that is late but WITHIN the allowed lateness
    must still be aggregated — bounded disorder, not strict order."""
    src = str(tmp_path_factory.mktemp("inorder_src"))
    schema = "event_id long, ts timestamp, v long"

    def write_batch(name, rows):
        df = spark.createDataFrame(rows, "event_id long, ts string, v long").select(
            "event_id", F.to_timestamp("ts").alias("ts"), "v"
        )
        staging = src + f".stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        shutil.move(os.path.join(staging, part), os.path.join(src, f"{name}.parquet"))
        shutil.rmtree(staging)

    write_batch("b1", [(1, "2024-01-01 10:10:00", 1), (2, "2024-01-01 10:50:00", 1)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"ontime_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # watermark is only 10:50-1h = 09:50 — a 10:05 straggler is within
        # lateness and must count
        write_batch("b2", [(3, "2024-01-01 10:05:00", 1)])
        q.processAllAvailable()
        write_batch("b3", [(4, "2024-01-01 13:00:00", 1)])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        r["start"].strftime("%H:%M"): r["n"]
        for r in spark.sql(f"SELECT window.start AS start, n FROM {name}").collect()
    }
    assert rows.get("10:00") == 3
