"""Collection DDL / catalog operations (S9/S10): create a bucketed
external table, list/info it, delete-by-predicate with whole-bucket
rewrite (including the all-rows-deleted bucket), drop it."""

import os

from pyspark.sql import functions as F

from code_index_spark.sources.collections import (
    collection_info,
    collection_name,
    create_collection,
    drop_collection,
    list_collections,
    prune_collection,
)


def test_collection_lifecycle(spark, tmp_path):
    name = collection_name("workspace-alpha")
    assert name.startswith("ws_") and len(name) == 19
    df = spark.createDataFrame(
        [(i, f"doc-{i:03d}", f"text {i}") for i in range(200)],
        "id long, doc string, text string",
    )
    path = str(tmp_path / "coll")
    create_collection(spark, name, df, key_col="doc", path=path, n_buckets=8)
    assert name in list_collections(spark)
    info = collection_info(spark, name)
    assert info["n_rows"] == 200
    assert info["n_buckets_present"] == 8
    assert info["schema"]["id"] == "bigint"

    # prune a predicate slice: exact rows gone, others intact
    deleted = prune_collection(spark, name, F.col("id") % 10 == 3)
    assert deleted == 20
    t = spark.table(name)
    assert t.count() == 180
    assert t.filter(F.col("id") % 10 == 3).count() == 0

    # prune EVERYTHING in some buckets: their partition dirs must go
    deleted = prune_collection(spark, name, F.col("id") >= 0)
    assert deleted == 180
    assert spark.table(name).count() == 0
    assert not any(
        d.startswith("bucket=") for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
        and os.listdir(os.path.join(path, d))
    )

    drop_collection(spark, name)
    assert name not in list_collections(spark)


def test_prune_keeps_null_predicate_rows(spark, tmp_path):
    """Three-valued logic: rows where the predicate evaluates to NULL are
    NOT victims and must survive a rewrite of their bucket (previously
    filter(~predicate) dropped them alongside the true victims)."""
    name = collection_name("workspace-nulls")
    # one bucket (n_buckets=1) so every row shares the rewritten bucket
    df = spark.createDataFrame(
        [(1, "drop-me"), (2, None), (3, "keep"), (4, None)],
        "id long, tag string",
    )
    p = str(tmp_path / "c3")
    create_collection(spark, name, df, key_col="id", path=p, n_buckets=1)
    deleted = prune_collection(spark, name, F.col("tag") == "drop-me")
    assert deleted == 1
    left = {r["id"] for r in spark.table(name).collect()}
    assert left == {2, 3, 4}  # NULL-tag rows survived
    # string predicates are accepted too
    deleted = prune_collection(spark, name, "tag = 'keep'")
    assert deleted == 1
    assert {r["id"] for r in spark.table(name).collect()} == {2, 4}
    drop_collection(spark, name)


def test_create_is_idempotent_replace(spark, tmp_path):
    name = collection_name("workspace-beta")
    a = spark.createDataFrame([(1, "x")], "id long, k string")
    b = spark.createDataFrame([(2, "y"), (3, "z")], "id long, k string")
    p = str(tmp_path / "c2")
    create_collection(spark, name, a, key_col="k", path=p, n_buckets=4)
    create_collection(spark, name, b, key_col="k", path=p, n_buckets=4)
    assert spark.table(name).count() == 2
    drop_collection(spark, name)
