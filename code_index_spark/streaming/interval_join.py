"""Stream-stream interval join with watermark state cleanup — the
streaming twin of operators/rangejoin.time_range_join (round 4).

Structured Streaming CAN express a two-stream join natively, but only
under the discipline this module packages: both sides watermarked, an
equality key, and a time-bound condition on both event times — that
triple is what lets the engine evict buffered rows once the watermark
passes their join window, so state stays O(window × arrival-rate)
instead of growing forever. Omit the time bound and the query is
rejected in append mode (unbounded state); omit a watermark and state
never drains. This is precisely the batch operator's window
[left_ts + lower_ms, left_ts + upper_ms] re-expressed as a streaming
join condition, so the batch and streaming forms agree row-for-row on
the same (closed) input — pytest-pinned.

At scale: each micro-batch shuffles both sides by the key; buffered
state lives in the state store partitioned the same way. Skewed keys
behave like any streaming aggregation (salt upstream if one user is a
firehose). Reference analogue: none — the reference is batch-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    watermark: str = "30 minutes",
    suffix: str = "_r",
) -> DataFrame:
    """Inner stream-stream (or batch-batch — unified model) interval
    join: same `on` key and right_ts within [left_ts + lower_ms,
    left_ts + upper_ms]. Both inputs get `watermark` on their event
    time; right columns are suffixed."""
    if upper_ms <= lower_ms:
        raise ValueError(f"empty window: [{lower_ms}, {upper_ms}] ms")
    rcols = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    ).withWatermark(f"{right_ts}{suffix}", watermark)
    l = left.withWatermark(left_ts, watermark)
    rts = F.col(f"{right_ts}{suffix}")
    lts = F.col(left_ts)
    cond = (
        (l[on] == r[on])
        & (rts >= lts + F.expr(f"INTERVAL {lower_ms} MILLISECONDS"))
        & (rts <= lts + F.expr(f"INTERVAL {upper_ms} MILLISECONDS"))
    )
    return l.join(r, cond).drop(r[on])


def start_interval_join(
    spark,
    left_dir: str,
    right_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str,
    on: str,
    ts_col: str = "ts",
    lower_ms: int = -1_800_000,
    upper_ms: int = 0,
    watermark: str = "30 minutes",
    trigger_once: bool = True,
):
    """File-stream wrapper: parquet appends on both sides → joined
    parquet appends. Returns the StreamingQuery."""
    l = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8).parquet(left_dir)
    )
    r = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8).parquet(right_dir)
    )
    joined = interval_join_stream(
        l, r, on=on, left_ts=ts_col, right_ts=ts_col,
        lower_ms=lower_ms, upper_ms=upper_ms, watermark=watermark,
    )
    writer = (
        joined.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
