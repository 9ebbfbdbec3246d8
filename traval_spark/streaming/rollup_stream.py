"""Incremental rollup via Structured Streaming (optional engine mode).

The reference is strictly batch (SURVEY.md §1.3: zero streaming
constructs), and the north-rule tiers are batch cascades with
checkpoint/resume. This module adds the natural streaming twin: new
tokenized-sequence files land in a directory, the 1m tier updates
incrementally with watermarked tumbling windows, and the batch cascade
(1h/1d) re-aggregates from the streamed 1m tier — identical tier
semantics, verified against the batch rollup in tests.

Late data: events older than the watermark relative to the max seen ts
are dropped by Spark's state eviction — the batch job remains the
source of truth for full-history rebuilds (standard lambda-style split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: input schema = the graft table (BASELINE.json input_hint) + event time
SEQUENCE_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, "
    "ts timestamp_ntz"
)


def stream_rollup_1m(
    spark: SparkSession,
    input_path: str,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming 1m tier: file-source readStream -> watermark -> tumbling
    window agg. Same measures as the batch tier (count/sum/min/max n_tok).
    """
    stream = (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )
    # watermark requires TIMESTAMP; window start is cast back to NTZ to
    # match the batch tier schema
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy("source", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count("n_tok").alias("n_points"),
            F.sum("n_tok").alias("sum_tok"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
        )
        .select(
            "source",
            F.col("w.start").cast("timestamp_ntz").alias("bucket"),
            "n_points", "sum_tok", "min_tok", "max_tok",
        )
    )
    return agg


def run_incremental_rollup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "2 minutes",
    available_now: bool = True,
):
    """Run the streaming 1m rollup to parquet with exactly-once checkpoints.

    available_now=True drains everything currently in the directory and
    stops (incremental batch catch-up); False runs continuously.
    Append output mode: a window only emits once its watermark passes —
    finalized buckets, never rewritten, exactly the batch tier rows.
    """
    agg = stream_rollup_1m(spark, input_path, watermark)
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
