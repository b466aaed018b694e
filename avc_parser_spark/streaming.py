"""Structured Streaming path: incremental parse→route→aggregate.

The reference is strictly batch (README.md:62-66) and the north rule keeps
it batch with per-partition checkpoint/resume — but a web-scale deployment
often tails a landing zone. This module runs the SAME parse kernel as an
incremental file-source stream:

    pages landing dir → readStream → parse (mapInPandas, stateless)
        → watermarked windowed aggregates / routed sink

Semantics: identical to batch per micro-batch (the kernel is pure); late
data beyond the watermark is dropped from windowed aggs (documented
divergence from exact batch recompute). `trigger=availableNow` gives the
batch-equivalent "process everything then stop" mode used in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from avc_parser_spark.parse.udf import parse_pages

PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over a pages landing directory (parquet)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )


def stream_events(pages_stream: DataFrame) -> DataFrame:
    """Streaming parse: the kernel is stateless, so mapInPandas applies
    unchanged to the unbounded DataFrame."""
    return parse_pages(pages_stream)


def stream_lang_hour_rollup(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked per-lang/per-hour windowed counts (late data beyond the
    watermark is dropped)."""
    return (
        events.filter(F.col("route") == "parse_ok")
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour").alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.col("w.start").alias("hour_start"), "lang", "events"
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    name: str = "avc_stream",
) -> StreamingQuery:
    """availableNow run of the windowed rollup into a memory sink (tests /
    smoke); production would writeStream to a table with the same plan."""
    events = stream_events(stream_pages(spark, landing_dir))
    rollup = stream_lang_hour_rollup(events)
    # complete mode: append-with-watermark only emits a window once the
    # watermark passes its end, which never happens in a bounded
    # availableNow run — production append sinks see it advance naturally.
    return (
        rollup.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_routed_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Continuous routed-event sink: append parquet partitioned by route —
    the streaming twin of sinks.write_routed_tables."""
    events = stream_events(stream_pages(spark, landing_dir))
    return (
        events.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("route")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
