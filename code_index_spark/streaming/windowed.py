"""Event-time windowed aggregation with watermarking — the streaming
operators the reference lacks (SURVEY.md §2.10), provided as
first-class components: late transcript appends are bounded by a
watermark on `ts`, and triple/mention throughput is aggregated into
tumbling event-time windows.

At 10^12-turn scale this is the monitoring plane of the pipeline: the
windowed counts per predicate are the live analogue of the per-bucket
lineage metrics (A8), and the watermark bounds state so the query runs
indefinitely with O(windows-in-flight) memory per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_triples
from ..schema import TRANSCRIPTS


def windowed_triple_counts(
    transcripts_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """streaming transcripts → per-window, per-predicate triple counts.

    Works on both batch and streaming DataFrames (same code path —
    Structured Streaming's unified model)."""
    triples = extract_triples_with_ts(transcripts_stream)
    return (
        triples.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "pred")
        .agg(F.count("*").alias("n_triples"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "pred",
            "n_triples",
        )
    )


def extract_triples_with_ts(transcripts: DataFrame) -> DataFrame:
    """Extraction that carries the event-time column through the UDF
    boundary (joining it back by key would force a shuffle; threading
    it through the Arrow batch is free)."""
    import pandas as pd

    from ..rules import RULES_BY_ROLE

    def run(batches):
        for pdf in batches:
            cols = {"conv_id": [], "turn_idx": [], "pred": [], "obj": [], "ts": []}
            for role, grp in pdf.groupby("role", sort=False):
                rules = RULES_BY_ROLE.get(role)
                if not rules:
                    continue
                for conv_id, turn_idx, text, ts in zip(
                    grp["conv_id"].values, grp["turn_idx"].values,
                    grp["text"].values, grp["ts"].values,
                ):
                    if not text:
                        continue
                    for rule in rules:
                        for m in rule.compiled.finditer(text):
                            s, e = m.span(rule.group)
                            cols["conv_id"].append(conv_id)
                            cols["turn_idx"].append(int(turn_idx))
                            cols["pred"].append(rule.category)
                            cols["obj"].append(text[s:e])
                            cols["ts"].append(ts)
            yield pd.DataFrame(cols)

    return transcripts.select("conv_id", "turn_idx", "role", "text", "ts").mapInPandas(
        run, schema="conv_id string, turn_idx int, pred string, obj string, ts timestamp"
    )


def start_windowed_metrics(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
):
    """File-stream → watermarked windowed counts → parquet (append mode:
    only finalized windows — past the watermark — are emitted)."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    counts = windowed_triple_counts(stream, window_duration, watermark_delay)
    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_dir)
        .start()
    )
