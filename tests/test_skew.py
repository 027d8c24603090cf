"""Skew measurement + mitigation: stats detect the planted hot entity,
salted join preserves plain-join semantics, frequency cap never drops
rows silently."""

from pyspark.sql import functions as F

from code_index_spark.functions.skew import (
    frequency_cap,
    key_frequency_stats,
    salted_join,
)
from code_index_spark.operators.extract import extract_triples
from code_index_spark.schema import TRANSCRIPTS
from code_index_spark.synth import HOT_SURFACE, synthesize


def test_hot_entity_is_measured(spark, synth_corpus):
    transcripts_pdf, _ = synth_corpus
    tdf = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS)
    mentions = extract_triples(tdf).filter(F.col("pred") == "class")
    stats = key_frequency_stats(mentions, "obj")
    top_keys = [k for k, _ in stats["top_keys"]]
    assert top_keys[0] == HOT_SURFACE  # planted in >5% of turns
    assert stats["max_key_rows"] > 10 * stats["median_key_rows"]
    assert 0 < stats["top_k_share"] <= 1


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(i, f"k{i % 3}") for i in range(1000)] + [(9999, "hot")] * 500,
        "id long, k string",
    )
    small = spark.createDataFrame(
        [("k0", "a"), ("k1", "b"), ("hot", "H")], "k string, v string"
    )
    plain = big.join(small, "k").groupBy("k", "v").agg(F.count("*").alias("n"))
    salted = salted_join(big, small, "k", salt=4).groupBy("k", "v").agg(
        F.count("*").alias("n")
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
    # k2 had no match in small: inner semantics preserved
    assert salted_join(big, small, "k").filter(F.col("k") == "k2").count() == 0
    # left semantics: unmatched big-side keys survive exactly once each
    left = salted_join(big, small, "k", salt=4, how="left")
    assert left.count() == big.count()
    # right/full would duplicate unmatched small rows salt× — rejected
    import pytest as _pytest
    for bad in ("right", "full", "outer"):
        with _pytest.raises(ValueError):
            salted_join(big, small, "k", how=bad)


def test_frequency_cap_accounts_for_cuts(spark):
    df = spark.createDataFrame(
        [("hot",)] * 100 + [("cold1",), ("cold2",)], "k string"
    )
    kept, cut = frequency_cap(df, "k", max_freq=10)
    assert kept.count() == 2
    cuts = cut.collect()
    assert len(cuts) == 1 and cuts[0]["k"] == "hot" and cuts[0]["n_rows"] == 100
    # invariant: kept + cut rows account for every input row
    assert kept.count() + sum(r["n_rows"] for r in cuts) == df.count()
