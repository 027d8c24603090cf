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


def _rate_parts(rate: float) -> tuple[int, int]:
    """rate = whole epochs + fractional bucket threshold, both INTS —
    no float arithmetic reaches the engine (the zero-float-arithmetic
    oracle discipline: per-stratum thresholds are computed here once,
    so Spark and DuckDB compare the same integers)."""
    if rate < 0:
        raise ValueError(f"negative sampling rate {rate}")
    k = int(rate)
    return k, int(round((rate - k) * _BUCKETS))


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic training-mixture construction: sample each
    stratum (source/domain/language) at its configured rate, with
    rates > 1 OVERSAMPLING by whole epochs — the standard pretraining
    recipe (up-weight curated sources, down-sample crawl). Every kept
    copy carries an `epoch` column (0..k-1) so downstream shuffles can
    key on (id, epoch).

    A row with stratum rate k+f keeps k copies always and one more iff
    hash-bucket(id, salt) < f·10⁴ — a pure function of (id, salt),
    exactly the hash_split reproducibility argument: same doc, same
    draw, on every run/engine/partitioning (`randomSplit`/`sample` are
    partition-order dependent). Zero shuffle: one codegen projection +
    explode; the rates map is config-scale (a CASE over literals), a
    corpus-scale rate TABLE would broadcast-join instead."""
    kcase = thrcase = None
    for name, r in rates.items():
        k, thr = _rate_parts(float(r))
        cond = F.col(stratum_col) == name
        kcase = F.when(cond, k) if kcase is None else kcase.when(cond, k)
        thrcase = F.when(cond, thr) if thrcase is None else thrcase.when(cond, thr)
    dk, dthr = _rate_parts(float(default_rate))
    kcase = kcase.otherwise(dk) if kcase is not None else F.lit(dk)
    thrcase = thrcase.otherwise(dthr) if thrcase is not None else F.lit(dthr)
    bucket = F.pmod(
        hash60(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))),
        F.lit(_BUCKETS),
    )
    n_copies = kcase + F.when(bucket < thrcase, 1).otherwise(0)
    seq = F.when(n_copies > 0, F.sequence(F.lit(0), n_copies - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(seq))


def mixture_sample_sql(
    id_expr: str,
    stratum_expr: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix-v1",
) -> tuple[str, str]:
    """DuckDB (n_copies_expr, bucket-free) twin generated from the
    same _rate_parts integers; returns the n_copies SQL expression —
    callers wrap it with `unnest([e for e in range(0, n_copies)])` to
    materialize epochs."""
    bucket = (
        f"(CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || '|{salt}'),"
        f" 1, 15)) AS BIGINT) % {_BUCKETS})"
    )
    kw, tw = [], []
    for name, r in rates.items():
        k, thr = _rate_parts(float(r))
        kw.append(f"WHEN {stratum_expr} = '{name}' THEN {k}")
        tw.append(f"WHEN {stratum_expr} = '{name}' THEN {thr}")
    dk, dthr = _rate_parts(float(default_rate))
    kcase = f"(CASE {' '.join(kw)} ELSE {dk} END)" if kw else str(dk)
    thrcase = f"(CASE {' '.join(tw)} ELSE {dthr} END)" if tw else str(dthr)
    return f"({kcase} + CASE WHEN {bucket} < {thrcase} THEN 1 ELSE 0 END)", bucket


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
