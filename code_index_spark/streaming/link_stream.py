"""Incremental entity linking via Structured Streaming (round-4
VERDICT #7) — the streaming twin of operators/link.py's batch path,
completing the streaming story for the pipeline's middle stage
(extraction, windows, first-mentions and exact dedupe already have
streaming forms).

Decomposition that makes linking incremental-safe:

- The SURFACES table (distinct mention surfaces + counts) merges per
  micro-batch: counts add, previously-unseen surfaces are NEW.
- CANDIDATE PAIRS are append-only: gram Jaccard between two surfaces
  depends only on the two strings, never on the rest of the
  vocabulary, so each batch links ONLY its new surfaces against the
  merged vocab (new×old + new×new, one gram equi-join whose left side
  is the new-surface sliver) and appends the qualifying pairs. Old×old
  pairs are already in state and are never recomputed — that is the
  incremental win: per-batch cost is proportional to the NEW
  vocabulary, not the total.
- TF-IDF COSINE is NOT incremental-safe (idf moves with every vocab
  change), so it is not stored: `linked_pairs_view` rescores the
  stored candidates against the CURRENT vocab on read (vocab-scale
  work, exactly operators/link.tfidf_cosine), which makes the final
  pairs EQUAL to the batch link_mentions over the same corpus — the
  parity pytest pins it.

State layout under `state_dir/`: `surfaces/` (overwrite per batch,
vocab-scale, materialized before the overwrite so the read never races
its own rewrite) and `pairs/` (append-only; the view dedupes, so a
replayed batch cannot double-link — restart-no-dup is pytest-gated).

At 100 TB: the per-batch join is new-sliver × vocab on the gram key —
broadcastable sliver, AQE skew-split for stop-grams; state tables stay
orders of magnitude smaller than the corpus (reference analogue: the
incremental file-hash skip cache + Qdrant upsert, cache.py /
vector_store.py:337-376, re-expressed as streaming state)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_triples_sql
from ..operators.link import mention_surfaces, tfidf_cosine
from ..schema import TRANSCRIPTS

_SURFACES_DDL = (
    "surface string, mention_count bigint, norm string, grams array<string>"
)
_PAIRS_DDL = "surface_a string, surface_b string, jaccard double"


def _read_state(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return spark.read.schema(ddl).parquet(path)
    return spark.createDataFrame([], ddl)


def _new_pairs(
    new: DataFrame, vocab: DataFrame, min_jaccard: float
) -> DataFrame:
    """Gram-Jaccard pairs touching ≥1 NEW surface: one equi-join on the
    gram key, left side restricted to the new-surface sliver. New×new
    pairs are found from both ends — canonical ordering + distinct
    collapses them."""
    ta = new.select(
        F.col("surface").alias("sa"),
        F.size("grams").alias("za"),
        F.explode("grams").alias("gram"),
    )
    tb = vocab.select(
        F.col("surface").alias("sb"),
        F.size("grams").alias("zb"),
        F.explode("grams").alias("gram"),
    )
    inter = (
        ta.join(tb, "gram")
        .filter(F.col("sa") != F.col("sb"))
        .groupBy("sa", "sb", "za", "zb")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter") / (F.col("za") + F.col("zb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            F.least("sa", "sb").alias("surface_a"),
            F.greatest("sa", "sb").alias("surface_b"),
            "jaccard",
        )
        .dropDuplicates(["surface_a", "surface_b"])
    )


def start_incremental_linking(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    min_jaccard: float = 0.4,
    trigger_once: bool = True,
):
    """Stream transcript parquet appends → incrementally maintained
    (surfaces, candidate pairs) linking state. Returns the
    StreamingQuery; read the result with `linked_pairs_view`."""
    surf_path = os.path.join(state_dir, "surfaces")
    pairs_path = os.path.join(state_dir, "pairs")
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        batch_surf = mention_surfaces(extract_triples_sql(batch_df))
        old = _read_state(spark, surf_path, _SURFACES_DDL)
        # merge counts; carry norm/grams from whichever side has them
        merged = (
            old.select("surface", F.col("mention_count").alias("c_old"),
                       "norm", "grams")
            .join(
                batch_surf.select(
                    "surface", F.col("mention_count").alias("c_new"),
                    F.col("norm").alias("norm_b"), F.col("grams").alias("grams_b"),
                ),
                "surface", "full_outer",
            )
            .select(
                "surface",
                (F.coalesce("c_old", F.lit(0)) + F.coalesce("c_new", F.lit(0)))
                .alias("mention_count"),
                F.coalesce("norm", "norm_b").alias("norm"),
                F.coalesce("grams", "grams_b").alias("grams"),
            )
        )
        # materialize BEFORE overwriting the directory the plan reads
        merged = merged.localCheckpoint(eager=True)
        new = batch_surf.join(
            old.select("surface"), "surface", "left_anti"
        ).localCheckpoint(eager=True)
        pairs = _new_pairs(
            new.select("surface", "grams"),
            merged.select("surface", "grams"),
            min_jaccard,
        )
        pairs.write.mode("append").parquet(pairs_path)
        merged.write.mode("overwrite").parquet(surf_path)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def linked_pairs_view(
    spark: SparkSession, state_dir: str, min_cosine: float = 0.5
) -> DataFrame:
    """Current linked pairs from streaming state: stored gram-Jaccard
    candidates rescored with TF-IDF cosine over the CURRENT vocab —
    identical formula (and, the parity test pins, identical result) to
    the batch link_mentions over the same accumulated corpus."""
    surfaces = _read_state(
        spark, os.path.join(state_dir, "surfaces"), _SURFACES_DDL
    ).localCheckpoint(eager=True)
    pairs = _read_state(
        spark, os.path.join(state_dir, "pairs"), _PAIRS_DDL
    ).dropDuplicates(["surface_a", "surface_b"])
    if surfaces.rdd.isEmpty():
        return spark.createDataFrame(
            [], "surface_a string, surface_b string, jaccard double, cosine double"
        )
    scored = tfidf_cosine(pairs, surfaces, n_docs=surfaces.count())
    return scored.filter(F.col("cosine") >= min_cosine)
