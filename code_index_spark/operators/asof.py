"""Distributed as-of join — match each left row to the most recent
right row at-or-before its timestamp, per key (the event-stream /
point-in-time-correctness operator every training-data pipeline needs
for feature attribution: "state of X when Y happened" without leaking
future information).

Spark has no ASOF JOIN operator (DuckDB and Pandas do), and the naive
formulations both break at scale: a range-condition join explodes to
every qualifying pair before a per-key max, and a broadcast of either
side dies when both are large. This implementation is the
union-and-carry pattern — a composition of existing DataFrame ops, no
UDF:

  1. tag right rows 0 and left rows 1, union them on aligned schemas;
  2. ONE shuffle: window partitioned by key, ordered by (ts, tag);
  3. `last(right_payload, ignorenulls=True)` carries the latest right
     row forward onto each left row;
  4. keep tag=1 rows; optionally null out matches older than
     `tolerance_ms`.

Cost: one shuffle of |L|+|R| rows and a linear per-partition sweep —
the same asymptotics as a sort-merge join, with no pair explosion.
Per-key data need not fit in memory (window frames stream); skewed
keys fall to the standard salting/AQE toolkit (functions.skew).
Tie semantics match DuckDB/pandas asof: a right row AT the left
timestamp matches (tag ordering puts right before left at equal ts).
Right rows must be unique per (key, ts) for a deterministic result —
pre-aggregate duplicates (the oracle-checked driver query keeps the
max event_id per (user_id, ts)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _check_reserved(
    left: DataFrame, right: DataFrame, reserved: tuple[str, ...],
    on: str, right_ts: str, suffix: str,
) -> None:
    """Fail fast on column-name collisions instead of producing
    ambiguous or silently-wrong output (round-4 ADVICE): inputs may
    not contain the operator's internal working names, and no left
    column may equal a suffixed right-column output name."""
    for df, side in ((left, "left"), (right, "right")):
        hit = sorted(set(df.columns) & set(reserved))
        if hit:
            raise ValueError(
                f"{side} input uses reserved internal column name(s) "
                f"{hit}; rename them before the join"
            )
    suffixed = {
        f"{c}{suffix}" for c in right.columns if c != on
    } | {f"{right_ts}{suffix}"}
    clash = sorted(set(left.columns) & suffixed)
    if clash:
        raise ValueError(
            f"left column(s) {clash} collide with suffixed right output "
            f"columns; pass a different suffix= or rename them"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_ms: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the right row with the
    largest right_ts <= left_ts for the same `on` key (right columns
    suffixed; NULL when no prior right row, or when the match is older
    than tolerance_ms)."""
    _check_reserved(
        left, right, ("__ts", "__tag", "__rp", "__match", "__rts"),
        on, right_ts, suffix,
    )
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
    )
    r = right.select(
        F.col(on), F.col(right_ts).alias("__ts"), F.lit(0).alias("__tag"),
        payload.alias("__rp"),
    )
    lcols = [c for c in left.columns if c not in (on, left_ts)]
    l = left.select(
        F.col(on), F.col(left_ts).alias("__ts"), F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        *[F.col(c) for c in lcols],
    )
    # union with aligned schemas: right rows carry NULL left payload
    r_full = r.select(
        on, "__ts", "__tag", "__rp",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__rp", ignorenulls=True).over(w)
    out = (
        l.unionByName(r_full)
        .withColumn("__match", carried)
        .filter(F.col("__tag") == 1)
    )
    if tolerance_ms is not None:
        # the left timestamp is the union's __ts on tag=1 rows; cast
        # through "timestamp" first — TIMESTAMP_NTZ (what parquet
        # scans yield) rejects a direct numeric cast in ANSI mode
        fresh = (
            (
                F.col("__ts").cast("timestamp").cast("double")
                - F.col("__match.__rts").cast("timestamp").cast("double")
            )
            * 1000.0
        ) <= float(tolerance_ms)
        out = out.withColumn("__match", F.when(fresh, F.col("__match")))
    sel = [F.col(on), F.col("__ts").alias(left_ts)]
    sel += [F.col(c) for c in lcols]
    sel.append(F.col("__match.__rts").alias(f"{right_ts}{suffix}"))
    sel += [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in rcols]
    return out.select(*sel)
