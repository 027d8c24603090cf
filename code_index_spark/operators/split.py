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

from ..functions.textfns import HASH60_SQL, hash60

_BUCKETS = 10_000


def _salted_hash_sql(id_expr: str, salt: str) -> str:
    """DuckDB twin of hash60(id || '|' || salt) — built from the shared
    HASH60_SQL template so the md5-60bit scheme has ONE SQL source."""
    return HASH60_SQL.format(x=f"CAST({id_expr} AS VARCHAR) || '|{salt}'")


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
    bucket = f"({_salted_hash_sql(id_expr, salt)} % {_BUCKETS})"
    kw, tw = [], []
    for name, r in rates.items():
        k, thr = _rate_parts(float(r))
        kw.append(f"WHEN {stratum_expr} = '{name}' THEN {k}")
        tw.append(f"WHEN {stratum_expr} = '{name}' THEN {thr}")
    dk, dthr = _rate_parts(float(default_rate))
    kcase = f"(CASE {' '.join(kw)} ELSE {dk} END)" if kw else str(dk)
    thrcase = f"(CASE {' '.join(tw)} ELSE {dthr} END)" if tw else str(dthr)
    return f"({kcase} + CASE WHEN {bucket} < {thrcase} THEN 1 ELSE 0 END)", bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 1024,
    salt: str = "pack-v1",
) -> DataFrame:
    """Deterministic GPT-style sequence packing: concatenate documents
    into a token stream and chop it into fixed-`budget` training
    blocks — the standard pretraining assembly step (docs joined with
    separators, split at exactly `budget` tokens, boundary docs
    straddling two blocks). Emits per doc:

      shard        — which of `n_shards` independent streams the doc
                     packs into (pure function of (id, salt))
      n_tokens     — the doc's token count (copied from `token_col`)
      tok_start    — the doc's offset in its shard's stream
      block_first/ — the budget-sized blocks the doc's span touches
      block_last     (block ids are PER SHARD; block_last = block_first
                     for empty docs, whose span is zero-width)

    Why sharded: a single global ordered cumsum is a sequential prefix
    — one window partition = one task, the anti-scale shape. Sharding
    by id hash gives n_shards independent streams (one shuffle, window
    cumsum per shard), which is what a real pipeline does anyway (packs
    within output shards/files). Within a shard docs order by
    (hash, id) — a pure function of (id, salt), so the entire packing
    layout is reproducible across runs/engines/partitionings (the
    hash_split argument) and fully value-hash oracle-able
    (pack_sql twin below). The orderBy key is UNIQUE (id tie-break),
    so Spark's and DuckDB's default RANGE window frames see
    single-row peer groups and agree exactly.

    Reference parity: code-index chunks per file with
    chunk_size/overlap (code_splitter.py config); packing is the
    corpus-scale inverse — assembling many docs into fixed-size
    training sequences."""
    from pyspark.sql import Window

    ph = hash60(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.pmod(ph, F.lit(n_shards)).cast("int").alias("shard"),
        ph.alias("_ph"),
    )
    w = Window.partitionBy("shard").orderBy("_ph", "doc_id")
    tok_end = F.sum("n_tokens").over(w)
    tok_start = (tok_end - F.col("n_tokens")).alias("tok_start")
    block_first = F.floor((tok_end - F.col("n_tokens")) / budget)
    block_last = F.when(
        F.col("n_tokens") > 0, F.floor((tok_end - 1) / budget)
    ).otherwise(block_first)
    return base.select(
        "doc_id", "shard", "n_tokens", tok_start,
        block_first.alias("block_first"), block_last.alias("block_last"),
    )


def pack_sql(
    id_expr: str,
    token_expr: str,
    budget: int,
    n_shards: int = 1024,
    salt: str = "pack-v1",
    from_clause: str = "documents",
) -> str:
    """DuckDB twin of pack_sequences, generated from the same salt /
    shard / budget constants (single source, like split_sql_case)."""
    h = _salted_hash_sql(id_expr, salt)
    return f"""
WITH b AS (
  SELECT {id_expr} AS doc_id,
         CAST({token_expr} AS BIGINT) AS n_tokens,
         CAST({h} % {n_shards} AS INT) AS shard,
         {h} AS ph
  FROM {from_clause}
), c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY ph, doc_id) AS tok_end
  FROM b
)
SELECT doc_id, shard, n_tokens,
       CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
       CAST(floor((tok_end - n_tokens) * 1.0 / {budget}) AS BIGINT) AS block_first,
       CAST(CASE WHEN n_tokens > 0 THEN floor((tok_end - 1) * 1.0 / {budget})
            ELSE floor((tok_end - n_tokens) * 1.0 / {budget}) END AS BIGINT)
         AS block_last
FROM c ORDER BY doc_id
"""


def split_sql_case(
    id_expr: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> str:
    """DuckDB expression computing exactly hash_split's `split` column —
    generated from the same _ranges, so engine and oracle cannot
    drift."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = f"({_salted_hash_sql(id_expr, salt)} % {_BUCKETS})"
    whens = " ".join(
        f"WHEN {bucket} >= {lo} AND {bucket} < {hi} THEN '{name}'"
        for name, lo, hi in _ranges(fractions)
    )
    return f"(CASE {whens} END)"
