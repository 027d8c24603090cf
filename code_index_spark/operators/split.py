"""Deterministic dataset splitting — assign every document to a named
split (train/val/test) by CONTENT-KEY HASH, not by random number.

Why hash-based and not `randomSplit`: a training-data pipeline needs
the SAME document to land in the same split across runs, engines,
cluster sizes, and re-partitions — `randomSplit` is none of those (it
is partition-order dependent), which silently leaks validation docs
into training on any re-run. Here bucket = hash60(id || '|' || salt)
mod 10_000 and splits own contiguous bucket ranges, so assignment is a
pure function of (id, salt): reproducible, shuffle-free (one per-row
projection in codegen), and — because hash60 is the md5-60bit shared
hash (functions/textfns.py) — bit-identical in DuckDB, giving the
split a full per-document value-hash oracle (`split_sql_case`,
driver row `dataset_split`). Changing `salt` re-draws the assignment;
keeping it pins the holdout forever.

Scale: zero shuffles, zero state; the split column partition-prunes
downstream writes (`partitionBy("split")`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textfns import hash60

_BUCKETS = 10_000


def _ranges(fractions: dict[str, float]) -> list[tuple[str, int, int]]:
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    out, lo = [], 0
    for name, frac in fractions.items():  # insertion order is the contract
        hi = lo + int(round(frac * _BUCKETS))
        out.append((name, lo, hi))
        lo = hi
    out[-1] = (out[-1][0], out[-1][1], _BUCKETS)  # absorb rounding residue
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Input plus a `split` column; assignment is a pure function of
    (id, salt)."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = F.pmod(
        hash60(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))),
        F.lit(_BUCKETS),
    )
    expr = None
    for name, lo, hi in _ranges(fractions):
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def split_sql_case(
    id_expr: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> str:
    """DuckDB expression computing exactly hash_split's `split` column —
    generated from the same _ranges, so engine and oracle cannot
    drift."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = (
        f"(CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || '|{salt}'),"
        f" 1, 15)) AS BIGINT) % {_BUCKETS})"
    )
    whens = " ".join(
        f"WHEN {bucket} >= {lo} AND {bucket} < {hi} THEN '{name}'"
        for name, lo, hi in _ranges(fractions)
    )
    return f"(CASE {whens} END)"
