"""Incremental corpus preparation via Structured Streaming — the
streaming twin of operators/prepare.prepare_corpus, for the ingest
shape a 100 TB pipeline actually has: crawl snapshots arrive
continuously, and each new batch must be labeled against EVERYTHING
already ingested, not just against itself.

Per micro-batch:
- the stateless per-row signals (quality score, language vote, PII
  flag, deterministic split bucket, decontamination overlap against
  the static eval suite) are the SAME fused codegen projections as the
  batch operator — they depend only on the row, so streaming changes
  nothing;
- exact duplication is checked against the ACCUMULATED hash registry:
  a doc whose md5(text) was seen in any earlier batch is an exact_dup,
  and within a batch the min-id doc wins (so the survivor policy is
  first-seen-batch, then min-id — identical to the batch operator's
  global min-id whenever ids arrive in batch order, which the parity
  test pins);
- near-dup detection is DEFERRED to the nightly batch compaction
  (operators/curate.reject_sets): minhash banding against the full
  accumulated corpus is not proportional to the new sliver, and the
  dedupe_stream watermark argument applies — a residual near-dup
  admitted by the stream is caught in compaction. The stream's labels
  therefore never say 'near_dup'; the reason priority is otherwise the
  batch operator's (exact_dup > contaminated > low_quality > non_en >
  keep).

State layout under `state_dir/` (the link_stream replay discipline —
foreachBatch is at-least-once, so every write is keyed by batch_id and
derived from the latest snapshot with version < batch_id; a replayed
batch recomputes byte-identical output instead of double-applying):
- `hashes/v=<batch_id>/`  — (text_hash, keep_id), the accumulated
  exact-dup registry; snapshots older than the current merge base are
  pruned after the write;
- `labels/v=<batch_id>/`  — this batch's (doc_id, reason, split,
  has_pii, doc_chars); overwritten in place on replay.

At 100 TB: the hash registry is (32-char hash + long) per UNIQUE doc —
orders of magnitude smaller than the corpus — and the per-batch work
is one batch-sized scan plus a batch×registry hash equi-join (AQE
broadcasts the batch sliver). Reference analogue: the per-file
hash-skip cache (cache.py:134-197) re-expressed as streaming state,
upgraded from skip-unchanged to corpus-wide content dedup.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.decontam import decontaminate, eval_gram_set
from ..operators.pii import pii_features
from ..operators.split import hash_split
from ..operators.textstats import lang_id, quality_features

_HASHES_DDL = "text_hash string, keep_id bigint"
_LABELS_DDL = (
    "doc_id bigint, reason string, split string, has_pii boolean,"
    " doc_chars int"
)


def _versions(root: str) -> list[int]:
    """Applied-batch snapshot versions under a state root, ascending."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def _read_snapshot(
    spark: SparkSession, root: str, ddl: str, below: int | None = None
) -> DataFrame:
    """Latest snapshot — optionally the latest strictly below `below`
    (the replay-safe merge base for applying batch `below`)."""
    versions = _versions(root)
    if below is not None:
        versions = [v for v in versions if v < below]
    if versions:
        return spark.read.schema(ddl).parquet(
            os.path.join(root, f"v={versions[-1]}")
        )
    return spark.createDataFrame([], ddl)


def batch_labels(
    batch_df: DataFrame,
    old_registry: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.7,
    keep_lang: str = "en",
    decontam_gram_n: int = 8,
    decontam_min_matches: int = 1,
    fractions: dict[str, float] | None = None,
    split_salt: str = "split-v1",
    eval_grams: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The stream's per-batch labeling as a PURE function:
    (labels, batch_winners) for one micro-batch against the
    accumulated (text_hash, keep_id) registry `old_registry` (empty
    DataFrame for the first batch — or for labeling a whole corpus as
    one batch, which is how the driver row `prepare_compacted_labels`
    proves the stream+compaction contract against the batch oracle).
    Reasons here never say 'near_dup' — that stage is compaction's
    (operators/prepare.compact_prepared_labels)."""
    docs = batch_df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).withColumn("text_hash", F.md5("text"))

    winners = docs.groupBy("text_hash").agg(
        F.min("doc_id").alias("batch_keep"))
    # a hash seen in ANY earlier batch makes every copy here a dup;
    # otherwise the within-batch min id survives
    flagged = (
        docs
        .join(old_registry.select("text_hash",
                                  F.col("keep_id").alias("old_keep")),
              "text_hash", "left")
        .join(winners, "text_hash")
        .withColumn(
            "r_exact",
            (F.col("old_keep").isNotNull()
             | (F.col("doc_id") != F.col("batch_keep"))).cast("int"),
        )
        .drop("old_keep", "batch_keep")
    )

    contam = (
        decontaminate(docs, eval_df.select(F.col(text_col).alias("text")),
                      "doc_id", "text", gram_n=decontam_gram_n,
                      eval_grams=eval_grams)
        .filter(F.col("n_shared_grams") >= decontam_min_matches)
        .select("doc_id")
        .withColumn("r_contam", F.lit(1))
    )
    perrow = hash_split(
        lang_id(quality_features(pii_features(flagged, "text"), "text"),
                "text"),
        "doc_id", fractions, split_salt,
    ).select(
        "doc_id", "r_exact", F.length("text").alias("doc_chars"),
        "quality_score", "pred_lang", "has_pii", "split",
    )
    reason = (
        F.when(F.col("r_exact") == 1, "exact_dup")
        .when(F.col("r_contam") == 1, "contaminated")
        .when(F.col("quality_score") < min_quality, "low_quality")
        .when(F.col("pred_lang") != keep_lang, "non_en")
        .otherwise("keep")
    )
    labels = (
        perrow.join(contam, "doc_id", "left")
        .select("doc_id", reason.alias("reason"), "split", "has_pii",
                "doc_chars")
    )
    return labels, winners


def _apply_batch(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float,
    keep_lang: str,
    decontam_gram_n: int,
    decontam_min_matches: int,
    fractions: dict[str, float] | None,
    split_salt: str,
    eval_grams: DataFrame | None = None,
) -> None:
    hash_root = os.path.join(state_dir, "hashes")
    label_root = os.path.join(state_dir, "labels")
    old = _read_snapshot(spark, hash_root, _HASHES_DDL, below=batch_id)
    labels, winners = batch_labels(
        batch_df, old, eval_df, id_col, text_col, min_quality,
        keep_lang, decontam_gram_n, decontam_min_matches, fractions,
        split_salt, eval_grams,
    )
    # materialize the new-hash merge BEFORE any state write (it reads
    # `old`, which pruning removes below)
    merged = (
        old.unionByName(
            winners.join(old.select("text_hash"), "text_hash", "left_anti")
            .select("text_hash", F.col("batch_keep").alias("keep_id"))
        )
        .localCheckpoint(eager=True)
    )
    labels.write.mode("overwrite").parquet(
        os.path.join(label_root, f"v={batch_id}"))
    merged.write.mode("overwrite").parquet(
        os.path.join(hash_root, f"v={batch_id}"))
    # the checkpoint blocks served only the two writes above — later
    # batches read the parquet snapshot, not this DataFrame. Without
    # this release a long-running stream pins EVERY batch's registry
    # snapshot in executor storage (measured: the accumulation starved
    # broadcast build memory by batch 10 of a 2M-doc run)
    merged.unpersist()
    # prune hash snapshots older than this batch's merge base: only the
    # last uncommitted batch can replay, and its base is the newest
    # v < id (labels dirs are per-batch output, never merged — kept)
    base = [v for v in _versions(hash_root) if v < batch_id]
    for v in base[:-1]:
        shutil.rmtree(os.path.join(hash_root, f"v={v}"),
                      ignore_errors=True)


def start_incremental_prepare(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    eval_df: DataFrame,
    schema: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.7,
    keep_lang: str = "en",
    decontam_gram_n: int = 8,
    decontam_min_matches: int = 1,
    fractions: dict[str, float] | None = None,
    split_salt: str = "split-v1",
    max_files_per_trigger: int = 1,
    trigger_once: bool = True,
):
    """Stream document parquet appends → incrementally maintained
    (labels, hash registry) preparation state. Returns the
    StreamingQuery; read the result with `prepared_labels_view`."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    # the eval gram set is per-STREAM state, not per-batch work: build
    # it once, eagerly, and reuse across every micro-batch — otherwise
    # each batch re-explodes the full eval suite to rebuild the
    # decontamination broadcast (a per-batch cost proportional to the
    # eval suite, measured dominant in bench/prepare_stream_scale.py).
    # localCheckpoint caveat (the functions/minhash.py discipline): on
    # a real cluster an executor loss makes the NEXT batch fail rather
    # than recompute — acceptable here because the stream restarts
    # from its checkpoint and rebuilds this table on startup; use
    # reliable checkpointing if restarts are expensive.
    ev_grams = eval_gram_set(
        eval_df.select(F.col(text_col).alias(text_col)),
        text_col, decontam_gram_n,
    ).localCheckpoint(eager=True)

    def process_batch(batch_df, batch_id: int) -> None:
        _apply_batch(
            spark, state_dir, batch_df, batch_id, eval_df, id_col,
            text_col, min_quality, keep_lang, decontam_gram_n,
            decontam_min_matches, fractions, split_salt,
            eval_grams=ev_grams,
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def prepared_labels_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """All per-doc labels across applied batches. Each doc appears in
    exactly one batch's labels dir (a replay overwrites the same dir),
    so no read-time dedup is needed."""
    label_root = os.path.join(state_dir, "labels")
    versions = _versions(label_root)
    if not versions:
        return spark.createDataFrame([], _LABELS_DDL)
    return spark.read.schema(_LABELS_DDL).parquet(
        *[os.path.join(label_root, f"v={v}") for v in versions]
    )


def hash_state_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current accumulated exact-dup registry (latest snapshot)."""
    return _read_snapshot(
        spark, os.path.join(state_dir, "hashes"), _HASHES_DDL
    )


def compact_labels(
    spark: SparkSession,
    state_dir: str,
    docs_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_threshold: float = 0.8,
    near_dup_max_bucket: int | None = None,
) -> DataFrame:
    """The nightly compaction the module docstring defers near-dup to:
    run the batch near-dup stage over the accumulated corpus
    (`docs_df` — everything ingested so far, e.g. the streamed input
    dir read as a batch table) and upgrade the stream's labels. The
    result is row-identical to prepare_corpus over the same corpus
    under the stream-parity precondition (ids in batch order); see
    operators/prepare.compact_prepared_labels for the rule."""
    from ..operators.prepare import compact_prepared_labels

    return compact_prepared_labels(
        docs_df, prepared_labels_view(spark, state_dir),
        id_col, text_col, near_dup_threshold, near_dup_max_bucket,
    )
