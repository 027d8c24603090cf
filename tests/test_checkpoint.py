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


def test_killed_run_resumes_to_identical_result(spark, tmp_path):
    """north_rule: a killed run resumes idempotently. Simulate a crash
    after 5 of 16 buckets by running the extraction restricted to a
    subset and checkpointing only those buckets, then resume on the
    full input and compare against an uninterrupted run."""
    tdf = _tdf(spark)

    # ground truth: uninterrupted run
    full_ckpt = CheckpointStore(spark, str(tmp_path / "full_ckpt"))
    full_path = str(tmp_path / "full_triples")
    run_with_resume(spark, tdf, full_path, full_ckpt, extract_triples, n_buckets=16)
    keys = ["conv_id", "turn_idx", "pred", "obj", "span_start", "rule_id"]
    want = {
        tuple(r) for r in
        spark.read.parquet(full_path).select(*keys).toPandas().itertuples(index=False)
    }

    # "crashed" run: only buckets 0-4 were completed before the kill
    from code_index_spark.sources.checkpoint import with_partition_id

    crash_ckpt = CheckpointStore(spark, str(tmp_path / "crash_ckpt"))
    crash_path = str(tmp_path / "crash_triples")
    survived = with_partition_id(tdf, 16).filter(F.col("partition_id") < 5).drop(
        "partition_id"
    )
    run_with_resume(spark, survived, crash_path, crash_ckpt, extract_triples, 16)
    # resume over the FULL input: the done buckets must be skipped
    r = run_with_resume(spark, tdf, crash_path, crash_ckpt, extract_triples, 16)
    assert 0 < r["processed_buckets"] <= 11
    got = {
        tuple(r) for r in
        spark.read.parquet(crash_path).select(*keys).toPandas().itertuples(index=False)
    }
    assert got == want


def _bucket_of(spark, tdf, conv_id, n_buckets=16):
    from code_index_spark.sources.checkpoint import with_partition_id

    return (
        with_partition_id(tdf, n_buckets)
        .filter(F.col("conv_id") == conv_id)
        .select("partition_id")
        .first()["partition_id"]
    )


def test_zero_triple_bucket_cleans_stale_partition(spark, tmp_path):
    """A changed bucket whose new content matches no rule must not leave
    the previous run's triples on disk (dynamic partition overwrite
    writes nothing for an empty partition — the engine deletes it)."""
    tdf = _tdf(spark)
    ckpt = CheckpointStore(spark, str(tmp_path / "ckpt"))
    triples_path = str(tmp_path / "triples")
    run_with_resume(spark, tdf, triples_path, ckpt, extract_triples, n_buckets=16)
    pid = _bucket_of(spark, tdf, "conv-00000005")
    from code_index_spark.sources.checkpoint import with_partition_id

    bucket_convs = [
        r["conv_id"]
        for r in with_partition_id(tdf, 16)
        .filter(F.col("partition_id") == pid)
        .select("conv_id").distinct().collect()
    ]
    before = spark.read.parquet(triples_path)
    assert before.filter(F.col("partition_id") == pid).count() > 0
    # blank the whole bucket to rule-free text → zero triples for it
    changed = tdf.withColumn(
        "text",
        F.when(F.col("conv_id").isin(bucket_convs),
               F.lit("nothing matches in this text at all"))
        .otherwise(F.col("text")),
    )
    r = run_with_resume(spark, changed, triples_path, ckpt, extract_triples, n_buckets=16)
    assert r["processed_buckets"] >= 1
    after = spark.read.parquet(triples_path)
    assert after.filter(F.col("partition_id") == pid).count() == 0
    assert not os.path.exists(os.path.join(triples_path, f"partition_id={pid}"))
    # and the checkpoint recorded the bucket done with zero triples
    row = ckpt.read().filter(F.col("partition_id") == pid).first()
    assert row["status"] == "done" and row["triple_count"] == 0


def test_vanished_bucket_reconciled(spark, tmp_path):
    """A bucket whose conversations were all removed from the input must
    lose both its stale triples partition and its checkpoint row."""
    tdf = _tdf(spark)
    ckpt = CheckpointStore(spark, str(tmp_path / "ckpt"))
    triples_path = str(tmp_path / "triples")
    run_with_resume(spark, tdf, triples_path, ckpt, extract_triples, n_buckets=16)
    pid = _bucket_of(spark, tdf, "conv-00000005")
    from code_index_spark.sources.checkpoint import with_partition_id

    shrunk = (
        with_partition_id(tdf, 16)
        .filter(F.col("partition_id") != pid)
        .drop("partition_id")
    )
    # default (incremental-safe): absent buckets are NOT touched
    r = run_with_resume(spark, shrunk, triples_path, ckpt, extract_triples, n_buckets=16)
    assert r["reconciled_buckets"] == 0
    assert os.path.exists(os.path.join(triples_path, f"partition_id={pid}"))
    assert ckpt.read().filter(F.col("partition_id") == pid).count() == 1
    # full-corpus mode: vanished bucket reconciled away
    r = run_with_resume(
        spark, shrunk, triples_path, ckpt, extract_triples, n_buckets=16,
        reconcile_missing=True,
    )
    assert r["reconciled_buckets"] == 1
    assert not os.path.exists(os.path.join(triples_path, f"partition_id={pid}"))
    assert ckpt.read().filter(F.col("partition_id") == pid).count() == 0
    # untouched buckets keep their triples
    assert spark.read.parquet(triples_path).count() > 0


def test_bucket_hash_orderinsensitive(spark):
    tdf = _tdf(spark, 10)
    h1 = {r["partition_id"]: r["content_hash"]
          for r in bucket_hashes(tdf, 8).collect()}
    h2 = {r["partition_id"]: r["content_hash"]
          for r in bucket_hashes(tdf.orderBy(F.desc("text")), 8).collect()}
    assert h1 == h2
