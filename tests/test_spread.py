"""Narrow-scan spread (functions/spread.py): the guard is SIZE-based,
not file-count-based — a single small file must be spread, a few LARGE
files (which Spark already splits by maxPartitionBytes) must pass
through untouched, since reshuffling them would pay a pointless
corpus-sized exchange."""

from pyspark.sql import functions as F

from code_index_spark.functions.spread import (
    estimated_scan_splits,
    spread_narrow_scan,
)


def _one_file_df(spark, tmp_path, n=200):
    p = str(tmp_path / "one")
    spark.range(n).coalesce(1).select(
        F.col("id").alias("doc_id"),
        F.repeat(F.lit("lorem ipsum "), 20).alias("text"),
    ).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) == 1
    return df


def test_single_small_file_is_spread(spark, tmp_path):
    df = _one_file_df(spark, tmp_path)
    width = spark.sparkContext.defaultParallelism
    out = spread_narrow_scan(df)
    assert out is not df
    assert out.rdd.getNumPartitions() == width
    assert out.count() == 200


def test_few_large_files_pass_through(spark, tmp_path):
    """The false positive the file-count probe had: with a small
    maxPartitionBytes (standing in for 8 × 1 GB files at the default
    128 MB), one file already splits wider than the session — the
    helper must NOT add a shuffle."""
    df = _one_file_df(spark, tmp_path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
    try:
        width = spark.sparkContext.defaultParallelism
        assert estimated_scan_splits(df, stop_at=width) >= width
        assert spread_narrow_scan(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_non_file_inputs_use_rdd_probe(spark):
    width = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    assert spread_narrow_scan(narrow).rdd.getNumPartitions() == width
    wide = spark.range(1000).repartition(width)
    assert spread_narrow_scan(wide) is wide


def test_encode_bpe_carries_string_ids(spark):
    """encode_bpe's output id column carries the INPUT id type — a
    string-keyed corpus must encode, not fail in the Arrow serializer
    after the training pass."""
    from code_index_spark.operators.bpe import encode_bpe, train_bpe

    docs = spark.createDataFrame(
        [("a-1", "low lower lowest"), ("b-2", "low low newest")],
        "doc_id string, text string",
    )
    merges = train_bpe(docs, n_merges=8)
    enc = encode_bpe(docs, merges)
    assert dict(enc.dtypes)["doc_id"] == "string"
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert set(rows) == {"a-1", "b-2"}
    for r in rows.values():
        assert r["n_pretokens"] <= r["learned_tokens"] <= r["base_chars"]
