"""Streaming exact deduplication (the LLM-pipeline ingest guard):
drop byte-identical documents across micro-batches.

Two layers, matching Structured Streaming's state model:
- `dropDuplicatesWithinWatermark` on md5(text) with an event-time
  watermark — state is bounded (hashes older than the watermark are
  evicted), the contract a 100 TB continuous ingest needs: a duplicate
  arriving within the late-data horizon is dropped, one arriving after
  the horizon is re-admitted (and the downstream batch dedupe catches
  it in the nightly compaction).
- deterministic output ids mean any residual replays stay idempotent
  on MERGE, the same discipline as the triples sink.

Reference analogue: none (the reference is batch-only); this is the
streaming twin of operators/dedupe.exact_duplicates.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F


def start_streaming_dedupe(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
    trigger_once: bool = True,
):
    """Stream document parquet appends → deduplicated parquet appends.

    Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    deduped = (
        stream.withColumn("_text_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_text_hash"])
        .drop("_text_hash")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
