"""Bucketized time-range (interval) join — match left rows to right
rows of the same key whose timestamp falls in a bounded window around
the left timestamp ("clicks in the 30 minutes before each purchase").

Why not a plain non-equi join: Spark compiles a join whose condition
has no equality component beyond the key into a shuffle join keyed on
the key alone — and with hot keys (or no key) it degenerates to
BroadcastNestedLoop/cartesian per key group. The scalable shape
buckets time by the WINDOW WIDTH: a right row lands in bucket
floor(ts/W); a left row's window [lts+lower, lts+upper] (width W)
covers at most two consecutive buckets, so the left side explodes to
≤2 (key, bucket) probe rows and the join is a pure EQUI-join on
(key, bucket) with an exact range filter after — hash join, bounded
2× fanout, AQE-skew-splittable, no nested loop (asserted in
tests/test_asof.py::test_range_join_plan_is_equi_join).

This is the batch analogue of Structured Streaming's interval join
discipline (stream-stream joins demand exactly such a time-bound), and
the second member of the event-time family with operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join: left rows × right rows with the same `on` key and
    right_ts within [left_ts + lower_ms, left_ts + upper_ms]
    (millisecond precision; lower_ms may be negative — "the 30 minutes
    BEFORE" is lower=-1_800_000, upper=0). Right columns suffixed."""
    from .asof import _check_reserved

    _check_reserved(left, right, ("__bucket",), on, right_ts, suffix)
    if upper_ms <= lower_ms:
        raise ValueError(f"empty window: [{lower_ms}, {upper_ms}] ms")
    width = upper_ms - lower_ms

    def _ms(col):
        # parquet timestamps arrive as TIMESTAMP_NTZ, which unix_millis
        # rejects; the cast interprets them in the session tz (pinned
        # UTC — session.py), matching DuckDB's naive epoch_ms
        return F.unix_millis(col.cast("timestamp"))

    lms = _ms(F.col(left_ts))
    rms = _ms(F.col(right_ts))

    rcols = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on),
        F.floor(rms / width).alias("__bucket"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    )
    lo_b = F.floor((lms + lower_ms) / width)
    hi_b = F.floor((lms + upper_ms) / width)
    l = left.withColumn(
        "__bucket", F.explode(F.array_distinct(F.array(lo_b, hi_b)))
    )
    rts_ms = _ms(F.col(f"{right_ts}{suffix}"))
    lts_ms = _ms(F.col(left_ts))
    return (
        l.join(r, [on, "__bucket"])
        .filter((rts_ms >= lts_ms + lower_ms) & (rts_ms <= lts_ms + upper_ms))
        .drop("__bucket")
    )
