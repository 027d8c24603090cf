"""Streaming entity-linking twin (streaming/link_stream.py): the
incrementally maintained state must (a) survive restart without
duplicating pairs and (b) produce EXACTLY the batch link_mentions
result over the same accumulated corpus — candidate generation is
incremental (gram Jaccard is vocab-independent), the idf-dependent
cosine rescore happens at read time over the final vocab."""

import pytest
from pyspark.sql import functions as F

from code_index_spark.operators.extract import extract_triples_sql
from code_index_spark.operators.link import link_mentions
from code_index_spark.schema import TRANSCRIPTS
from code_index_spark.streaming.link_stream import (
    linked_pairs_view,
    start_incremental_linking,
)


def _pairs_set(df):
    return {
        (r["surface_a"], r["surface_b"], round(r["jaccard"], 4),
         round(r["cosine"], 4))
        for r in df.collect()
    }


def test_incremental_linking_matches_batch_and_survives_restart(
    spark, tmp_path, synth_corpus
):
    pdf, _ = synth_corpus
    convs = sorted(pdf["conv_id"].unique())
    half = set(convs[: len(convs) // 2])
    first = pdf[pdf["conv_id"].isin(half)]
    second = pdf[~pdf["conv_id"].isin(half)]
    assert len(first) and len(second)

    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ck_dir = str(tmp_path / "ck")
    spark.createDataFrame(first, schema=TRANSCRIPTS).write.mode(
        "overwrite"
    ).parquet(in_dir)

    start_incremental_linking(spark, in_dir, state_dir, ck_dir).awaitTermination(180)
    after_first = _pairs_set(linked_pairs_view(spark, state_dir))
    n_pairs_state_1 = spark.read.parquet(state_dir + "/pairs").count()

    # restart with NO new input: checkpoint skips everything — state
    # and result unchanged (no re-linking, no duplicate pairs)
    start_incremental_linking(spark, in_dir, state_dir, ck_dir).awaitTermination(180)
    assert spark.read.parquet(state_dir + "/pairs").count() == n_pairs_state_1
    assert _pairs_set(linked_pairs_view(spark, state_dir)) == after_first

    # append the second half; only the new surfaces get linked
    spark.createDataFrame(second, schema=TRANSCRIPTS).write.mode(
        "append"
    ).parquet(in_dir)
    start_incremental_linking(spark, in_dir, state_dir, ck_dir).awaitTermination(180)

    streamed = _pairs_set(linked_pairs_view(spark, state_dir))

    # batch parity over the full corpus
    full = spark.createDataFrame(pdf, schema=TRANSCRIPTS)
    batch = _pairs_set(link_mentions(extract_triples_sql(full)))
    assert streamed == batch
    assert batch, "parity check is vacuous on an empty pair set"

    # the surface state must equal the batch vocabulary (counts merged)
    from code_index_spark.operators.link import mention_surfaces

    got = {
        (r["surface"], r["mention_count"])
        for r in spark.read.parquet(state_dir + "/surfaces")
        .select("surface", "mention_count").collect()
    }
    want = {
        (r["surface"], r["mention_count"])
        for r in mention_surfaces(extract_triples_sql(full))
        .select("surface", "mention_count").collect()
    }
    assert got == want
