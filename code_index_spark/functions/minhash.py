"""Pure-Catalyst MinHash banding, shared by corpus dedupe and entity
linking (the blocking stage of J1/§2.5 and the minhash path of the
dedup suite).

Signature: sig_i(doc) = min over grams g of hash60(g || '|' || i) for
i in 0..k-1 — a k-table OR-construction with one min-hash per table.
hash60 is the md5-based 60-bit hash every engine computes identically
(functions.textfns.hash60), so signatures, bands, and the collision
join replicate bit-for-bit in DuckDB — banding is fully value-hash
oracle-able, unlike Spark ML's MinHashLSH whose random coefficients
live inside the fitted model.

Recall contract: under the random-permutation approximation,
P(band i collides) = jaccard(a, b), so a true pair at similarity s is
missed with probability (1 - s)^k. `tables_for_recall` inverts that:
given the minimum similarity the caller wants to keep and a target
miss probability, it returns the smallest k that achieves it. This is
the engine's analogue of the reference's tunable-accuracy ANN contract
(vector_store.py:469-477 — Qdrant's hnsw_ef/exact search dial).

Execution shape (the 100 TB story): signatures are per-row array
transforms — zero shuffle, WholeStageCodegen; banding is one explode
to k rows per doc; candidates come from ONE equi-join on (band, h)
whose volume is linear in bucket sizes, never O(n²). AQE skew-join
splits hot buckets (near-identical boilerplate docs).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .textfns import hash60


def tables_for_recall(min_similarity: float, target_miss: float = 0.01) -> int:
    """Smallest k with (1 - min_similarity)^k <= target_miss.

    Examples: s=0.4, miss 1% -> 10 tables; s=0.5, miss 0.3% -> 9;
    s=0.8, miss 1e-6 -> 9. The previous fixed k=5 missed ~8% of true
    pairs at s=0.4 (measured, CLAUDE.md) — exactly what this sizes away.
    """
    if not 0.0 < min_similarity < 1.0:
        return 1
    return max(1, math.ceil(math.log(target_miss) / math.log(1.0 - min_similarity)))


def minhash_bands(df: DataFrame, id_col: str, grams_col: str, num_tables: int) -> DataFrame:
    """(id, band, h): one row per document per table, h = that table's
    min-hash over the gram set. Signature hashing is per-row array
    transforms in codegen; the only data movement is a defensive
    round-robin spread when the input has fewer splits than the
    session's cores (a single small parquet file arrives as ONE
    partition, which would serialize the whole hashing stage on one
    core — the CLAUDE.md broadcast-view trap). Inputs already split
    wider than the core count (any real corpus) skip that shuffle."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)

    def table_sig(i: int):
        # closure factory, NOT a 2-arg transform lambda: the second
        # lambda arg is the element index (CLAUDE.md trap)
        suffix = F.lit("|" + str(i))
        return F.array_min(
            F.transform(F.col(grams_col), lambda g: hash60(F.concat(g, suffix)))
        )

    sig = F.array(*[table_sig(i) for i in range(num_tables)])
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(sig).alias("band", "h")
    )


def band_collision_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (id_a < id_b) candidate pairs sharing >=1 (band, h)
    bucket — the one shuffle of the blocking stage."""
    a = bands.select(F.col("id").alias("id_a"), "band", "h")
    b = bands.select(F.col("id").alias("id_b"), "band", "h")
    return (
        a.join(b, ["band", "h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_bands_sql(grams_cte: str, num_tables: int) -> str:
    """DuckDB twin of minhash_bands: `grams_cte` must yield (id, g)
    rows (one row per document per distinct gram). Returns SQL for
    (id, band, h) with h identical to the engine's hash60 values."""
    return (
        "SELECT id, t.i AS band,"
        " min(CAST(('0x' || substr(md5(g || '|' || CAST(t.i AS VARCHAR)), 1, 15))"
        " AS BIGINT)) AS h"
        f" FROM ({grams_cte}) gr, range(0, {num_tables}) t(i)"
        " GROUP BY id, t.i"
    )
