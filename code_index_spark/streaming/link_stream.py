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

State layout under `state_dir/`: `surfaces/v=<batch_id>/` (one
immutable snapshot per applied batch, vocab-scale) and `pairs/`
(append-only; the view dedupes, so a replayed batch cannot
double-link — restart-no-dup is pytest-gated).

Replay safety (round-4 ADVICE): foreachBatch is at-least-once, so a
batch can re-run after its state writes succeeded but before the
checkpoint commit. Pair appends are read-time deduped, but the count
merge is NOT naturally idempotent — so the surfaces snapshot for batch
N is always derived from the latest snapshot with version < N and
written to its own `v=N` directory. A replay of batch N re-reads the
same pre-batch snapshot and rewrites `v=N` with identical content
instead of double-adding mention_counts onto its own output. Snapshots
older than the current batch's base are pruned after the write (only
the last uncommitted batch can ever replay).

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
from .state import guard_batch_id, prune_below_base, read_latest_snapshot

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


def _read_surfaces(
    spark: SparkSession, surf_root: str, below: int | None = None
) -> DataFrame:
    """Latest surfaces snapshot — optionally the latest with version
    strictly below `below` (the replay-safe base for applying batch
    `below`). Shared machinery: streaming/state.py; flat_fallback
    covers the pre-versioning layout (parquet files directly under
    surfaces/) as the base for the first versioned batch — the write
    path deletes the flat files once a versioned base exists."""
    return read_latest_snapshot(
        spark, surf_root, _SURFACES_DDL, below=below, flat_fallback=True
    )


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


def _apply_batch(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    min_jaccard: float,
) -> None:
    """Apply one micro-batch to the linking state, idempotently: the
    merge base is the latest surfaces snapshot with version < batch_id,
    so re-applying the same batch (at-least-once replay after a crash
    between the state writes and the checkpoint commit) recomputes and
    rewrites the identical `v=batch_id` snapshot instead of
    double-adding its mention counts; the pair append may duplicate
    rows, which the read path dedupes."""
    surf_root = os.path.join(state_dir, "surfaces")
    pairs_path = os.path.join(state_dir, "pairs")
    guard_batch_id(surf_root, batch_id)
    batch_surf = mention_surfaces(extract_triples_sql(batch_df))
    old = _read_surfaces(spark, surf_root, below=batch_id)
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
    # materialize before any state write (the new-surface anti-join and
    # the pair join both read `old`, which pruning may remove below)
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
    merged.write.mode("overwrite").parquet(
        os.path.join(surf_root, f"v={batch_id}")
    )
    # prune snapshots older than this batch's merge base (only the last
    # uncommitted batch can replay) and any superseded pre-versioning
    # flat-layout files — shared machinery: streaming/state.py
    prune_below_base(surf_root, batch_id, drop_flat=True)


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
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        _apply_batch(spark, state_dir, batch_df, batch_id, min_jaccard)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def surfaces_state_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current merged surface vocabulary (the latest applied-batch
    snapshot) — the public reader for the versioned surfaces state."""
    return _read_surfaces(spark, os.path.join(state_dir, "surfaces"))


def linked_pairs_view(
    spark: SparkSession, state_dir: str, min_cosine: float = 0.5
) -> DataFrame:
    """Current linked pairs from streaming state: stored gram-Jaccard
    candidates rescored with TF-IDF cosine over the CURRENT vocab —
    identical formula (and, the parity test pins, identical result) to
    the batch link_mentions over the same accumulated corpus."""
    surfaces = _read_surfaces(
        spark, os.path.join(state_dir, "surfaces")
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
