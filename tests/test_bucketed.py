"""Bucketed-table store (sources/bucketed.py): the persisted
co-located-join layout. The plan test is the point — a join of two
tables bucketed on the join key must contain ZERO Exchange nodes —
plus result parity with the plain shuffled join and the
superset-clustering property (groupBy on the bucket key is also
exchange-free)."""

import pytest
from pyspark.sql import functions as F

from code_index_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-join planning so the plan test proves bucketing
    (not broadcast) removed the exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def two_tables(spark, tmp_path):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("source"),
    )
    labels = spark.range(0, 500, 2).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "keep").otherwise("drop").alias("reason"),
    )
    write_bucketed(docs, "b_docs", "doc_id", 8,
                   path=str(tmp_path / "docs"))
    write_bucketed(labels, "b_labels", "doc_id", 8,
                   path=str(tmp_path / "labels"))
    yield docs, labels
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_labels")


def test_bucketed_join_has_zero_exchanges(spark, two_tables, no_broadcast):
    docs, labels = two_tables
    j = read_bucketed(spark, "b_docs").join(
        read_bucketed(spark, "b_labels"), "doc_id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan           # the co-location claim
    assert "SortMergeJoin" in plan
    # parity with the plain shuffled join
    want = sorted(map(tuple, docs.join(labels, "doc_id").collect()))
    assert sorted(map(tuple, j.collect())) == want


def test_bucketed_groupby_has_zero_exchanges(spark, two_tables):
    """Bucketing satisfies any clustering on a SUPERSET of the bucket
    key — aggregation on the key needs no exchange either."""
    agg = read_bucketed(spark, "b_docs").groupBy("doc_id").agg(
        F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == 500


def test_unbucketed_join_pays_the_exchanges(spark, two_tables, no_broadcast):
    """Control: the same join off raw parquet-path reads (which forget
    the bucket spec) shuffles both sides — the cost bucketing removes."""
    a = spark.table("b_docs").inputFiles()[0].rsplit("/", 1)[0]
    b = spark.table("b_labels").inputFiles()[0].rsplit("/", 1)[0]
    j = spark.read.parquet(a).join(spark.read.parquet(b), "doc_id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") >= 2


def test_write_is_one_file_per_bucket(spark, two_tables):
    """The repartition-before-write discipline: W writer tasks × n
    buckets small-file explosion is prevented — exactly n_buckets
    files (so sorted buckets feed sort-merge joins without re-sorts)."""
    files = [f for f in spark.table("b_docs").inputFiles()]
    assert len(files) == 8


def test_register_bucketed_recovers_spec_in_new_session(
    spark, two_tables, no_broadcast
):
    """Cross-run story: the in-memory catalog forgets tables when the
    session ends — register_bucketed re-attaches the bucket spec to
    the existing files (simulated here by dropping the catalog entries)
    and the join is exchange-free again."""
    from code_index_spark.sources.bucketed import register_bucketed

    a = spark.table("b_docs").inputFiles()[0].rsplit("/", 1)[0]
    b = spark.table("b_labels").inputFiles()[0].rsplit("/", 1)[0]
    spark.sql("DROP TABLE b_docs")
    spark.sql("DROP TABLE b_labels")

    d = register_bucketed(spark, "b_docs", a, "doc_id", 8)
    l = register_bucketed(spark, "b_labels", b, "doc_id", 8)
    j = d.join(l, "doc_id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert j.count() == 250


def test_bm25_index_bucketed_serving_prunes_buckets(spark, tmp_path):
    """The BM25 serving contract at scale: stored bucketed by term,
    a query's IN-filter lets Spark read ONLY the buckets that can
    contain the query terms (SelectedBucketsCount < total), and the
    pruned read returns the same top-k as the in-memory index."""
    from code_index_spark.operators.rank import bm25_index, bm25_topk

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta word"),
            (F.col("id") % 13).cast("string"),
            F.lit(" word"), (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )
    idx = bm25_index(docs, "doc_id", "text").localCheckpoint(eager=True)
    write_bucketed(idx, "b_bm25", "term", 16,
                   path=str(tmp_path / "bm25"))
    # serving sessions pin autoBucketedScan off: Spark's
    # DisableUnnecessaryBucketedScan rule only credits bucketed scans
    # that remove an Exchange, not bucket PRUNING, so with the default
    # it silently falls back to a plain scan (row-group pruning only)
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        served = bm25_topk(read_bucketed(spark, "b_bm25"), "alpha word3", k=5)
        plan = served._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan
        n_sel = int(plan.split("SelectedBucketsCount: ")[1].split(" out of")[0])
        assert n_sel <= 2          # ≤ one bucket per query term
        want = [(r["doc_id"], r["score_micros"])
                for r in bm25_topk(idx, "alpha word3", k=5).collect()]
        got = [(r["doc_id"], r["score_micros"]) for r in served.collect()]
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old)
        spark.sql("DROP TABLE IF EXISTS b_bm25")


def test_register_bucketed_spec_sidecar(spark, two_tables):
    """The spec travels WITH the files (_bucket_spec.json): a fresh
    session re-attaches without re-declaring the layout, and an
    explicit declaration that CONTRADICTS the sidecar raises instead
    of silently registering a wrong bucketing (the wrong-joins hazard
    in the register_bucketed docstring)."""
    from code_index_spark.sources.bucketed import (
        read_bucket_spec,
        register_bucketed,
    )

    a = spark.table("b_docs").inputFiles()[0].rsplit("/", 1)[0]
    assert read_bucket_spec(spark, a) == {
        "key": "doc_id", "n_buckets": 8, "sort": True}
    spark.sql("DROP TABLE b_docs")

    # spec-driven: no layout args at all
    d = register_bucketed(spark, "b_docs", a)
    assert d.count() == 500

    spark.sql("DROP TABLE b_docs")
    with pytest.raises(ValueError, match="n_buckets=4"):
        register_bucketed(spark, "b_docs", a, "doc_id", 4)
    with pytest.raises(ValueError, match="key='source'"):
        register_bucketed(spark, "b_docs", a, "source", 8)
    # matching explicit args still pass (pre-sidecar call sites)
    register_bucketed(spark, "b_docs", a, "doc_id", 8)


def test_register_bucketed_without_sidecar_requires_spec(spark, tmp_path):
    """Stores that predate the sidecar: explicit key+n_buckets required
    (the caller owns consistency), absence raises rather than guessing."""
    import os

    from code_index_spark.sources.bucketed import register_bucketed

    docs = spark.range(50).select(F.col("id").alias("doc_id"))
    p = str(tmp_path / "legacy")
    write_bucketed(docs, "b_legacy", "doc_id", 4, path=p)
    os.remove(os.path.join(p, "_bucket_spec.json"))
    spark.sql("DROP TABLE b_legacy")
    with pytest.raises(ValueError, match="no _bucket_spec.json"):
        register_bucketed(spark, "b_legacy", p)
    d = register_bucketed(spark, "b_legacy", p, "doc_id", 4)
    assert d.count() == 50
    spark.sql("DROP TABLE IF EXISTS b_legacy")
