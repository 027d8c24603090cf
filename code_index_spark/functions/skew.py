"""Skew measurement and mitigation (north_rule: "salted and
range-partitioned on conv_id with explicit skew handling for hot
entities"; SURVEY.md §7.3: skew must be *measured*, not assumed).

Three tools:
  key_frequency_stats — the measurement: per-key counts + concentration
    metrics (top-k share, p99/median ratio). Persist these rows to the
    metrics/lineage table each run; alerting on drift is what catches a
    new hot entity before it melts a join.
  salted_join — the mitigation for hot build-side keys: explode the
    small side into `salt` replicas, scatter the big side's rows across
    replicas with a deterministic pmod(xxhash64) — turning one hot
    reducer into `salt` balanced ones. Semantics identical to the plain
    equi-join (verified by test).
  frequency_cap — the structural fix for pair-generating joins (LSH
    blocking, co-mention): keys above `max_freq` are cut before the
    join; a hot entity in 5% of 10^12 turns would otherwise emit ~10^21
    co-mention pairs. The reference hits the same wall with its
    language groups (batch_scheduler.py:39-72) and only caps
    heuristically; here the cap is explicit and measured.

AQE's skew-join splitting (enabled in session.py) handles residual
imbalance at runtime; these helpers handle the cases AQE cannot —
pair-explosion and single-key reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def key_frequency_stats(df: DataFrame, key: str, top_k: int = 10) -> dict:
    """Concentration metrics for a join/grouping key (driver-side dict;
    one aggregation job)."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    row = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.expr("percentile_approx(n, 0.5)").alias("median_n"),
        F.expr("percentile_approx(n, 0.99)").alias("p99_n"),
    ).first()
    top = counts.orderBy(F.desc("n"), F.asc(key)).limit(top_k).collect()
    top_share = sum(r["n"] for r in top) / max(row["n_rows"], 1)
    return {
        "n_keys": row["n_keys"],
        "n_rows": row["n_rows"],
        "max_key_rows": row["max_n"],
        "median_key_rows": row["median_n"],
        "p99_over_median": row["p99_n"] / max(row["median_n"], 1),
        "top_k_share": round(top_share, 4),
        "top_keys": [(r[key], r["n"]) for r in top],
    }


def salted_join(
    big: DataFrame, small: DataFrame, key: str, salt: int = 8, how: str = "inner"
) -> DataFrame:
    """Equi-join with build-side salting: `small` is exploded `salt`
    times, `big` rows scatter deterministically across replicas.

    Result columns = big's columns + small's non-key columns (exactly
    like big.join(small, key, how)). Only inner/left semantics survive
    salting — for right/full joins an unmatched small-side row would
    surface once per replica, so those modes are rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join preserves only inner/left semantics, got how={how!r}: "
            "an unmatched small-side row appears `salt` times under right/full"
        )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def frequency_cap(
    df: DataFrame, key: str, max_freq: int
) -> tuple[DataFrame, DataFrame]:
    """Split df into (kept, cut) by per-key frequency. `cut` carries the
    hot keys and their counts for the metrics table — dropped rows are
    never silent."""
    counts = df.groupBy(key).agg(F.count("*").alias("_freq"))
    hot = counts.filter(F.col("_freq") > max_freq)
    kept = df.join(F.broadcast(hot.select(key)), key, "left_anti")
    return kept, hot.withColumnRenamed("_freq", "n_rows")
