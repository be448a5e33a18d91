"""Structured Streaming operators.

The crawl loop itself deliberately uses an explicit batch-round loop
(determinism + golden parity; see ROUND_SEMANTICS.md), mirroring
Structured Streaming's foreachBatch contract. This module provides the
genuinely stream-shaped operators on top of the same primitives:

- windowed fetch-metrics aggregation with watermarked late-data handling
  (the streaming flavor of G7 — metrics/lineage rows arriving per partition)
- streaming exactly-once admission: ``dropDuplicates`` on page_id over a
  watermark (the streaming flavor of P2/J2's seen-set)

Both run with ``trigger(availableNow=True)`` in tests so results are finite
and comparable against the batch equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir))


def windowed_metrics(events: DataFrame, window: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """Per-type hourly counts + value sums with a late-data watermark."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "value_sum"))


def windowed_metrics_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of windowed_metrics (oracle for the streaming test)."""
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "value_sum"))


def streaming_admission(discovered: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """P2/J2 streaming flavor: exactly-once admission of discovered URLs —
    first event per page_id wins inside the watermark horizon."""
    return (discovered.withWatermark("ts", watermark)
            .dropDuplicates(["page_id"]))


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming DF to completion on available data, return the
    result as a batch DF (memory sink)."""
    q = (stream_df.writeStream.format("memory").queryName(query_name)
         .outputMode("complete" if stream_df.isStreaming else "append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
