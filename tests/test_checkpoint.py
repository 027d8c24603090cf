"""Checkpoint/lineage + idempotent resume (north_rule): a second run
over unchanged input processes zero buckets; changed conversations
re-process only their bucket; triple set identical after kill-resume."""

import os

from pyspark.sql import functions as F

from code_index_spark.operators.extract import extract_triples
from code_index_spark.schema import TRANSCRIPTS
from code_index_spark.sources.checkpoint import (
    CheckpointStore,
    bucket_hashes,
    run_with_resume,
)
from code_index_spark.synth import synthesize


def _tdf(spark, n=30):
    pdf, _ = synthesize(n, seed=42)
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS)


def test_resume_skips_unchanged(spark, tmp_path):
    tdf = _tdf(spark)
    ckpt = CheckpointStore(spark, str(tmp_path / "ckpt"))
    triples_path = str(tmp_path / "triples")
    r1 = run_with_resume(spark, tdf, triples_path, ckpt, extract_triples, n_buckets=16)
    assert r1["processed_buckets"] > 0
    n1 = spark.read.parquet(triples_path).count()
    r2 = run_with_resume(spark, tdf, triples_path, ckpt, extract_triples, n_buckets=16)
    assert r2["processed_buckets"] == 0
    assert spark.read.parquet(triples_path).count() == n1


def test_resume_reprocesses_changed_bucket_only(spark, tmp_path):
    tdf = _tdf(spark)
    ckpt = CheckpointStore(spark, str(tmp_path / "ckpt"))
    triples_path = str(tmp_path / "triples")
    run_with_resume(spark, tdf, triples_path, ckpt, extract_triples, n_buckets=16)
    baseline = (
        spark.read.parquet(triples_path)
        .select("conv_id", "turn_idx", "pred", "obj", "span_start", "rule_id")
        .toPandas()
    )
    # mutate one conversation's text
    changed = tdf.withColumn(
        "text",
        F.when(F.col("conv_id") == "conv-00000005",
               F.concat(F.col("text"), F.lit(" appended `new_ident` tail")))
        .otherwise(F.col("text")),
    )
    r = run_with_resume(spark, changed, triples_path, ckpt, extract_triples, n_buckets=16)
    assert r["processed_buckets"] >= 1
    # buckets without conv-5 were untouched
    after = spark.read.parquet(triples_path)
    new_rows = after.filter(
        (F.col("conv_id") == "conv-00000005") & (F.col("obj") == "new_ident")
    ).count()
    assert new_rows > 0
    # unchanged conversations produce the identical triple set
    keys = ["conv_id", "turn_idx", "pred", "obj", "span_start", "rule_id"]
    before_others = {tuple(r) for r in baseline[baseline.conv_id != "conv-00000005"].itertuples(index=False)}
    after_others = {
        tuple(r)
        for r in after.filter(F.col("conv_id") != "conv-00000005")
        .select(*keys).toPandas().itertuples(index=False)
    }
    assert before_others == after_others


def test_bucket_hash_orderinsensitive(spark):
    tdf = _tdf(spark, 10)
    h1 = {r["partition_id"]: r["content_hash"]
          for r in bucket_hashes(tdf, 8).collect()}
    h2 = {r["partition_id"]: r["content_hash"]
          for r in bucket_hashes(tdf.orderBy(F.desc("text")), 8).collect()}
    assert h1 == h2
