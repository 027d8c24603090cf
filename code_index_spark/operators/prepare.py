"""Composed corpus preparation — the full pretraining-data pass over a
raw corpus as ONE operator: curation (exact dedupe → minhash-verified
near-dup removal → quality filter → language filter) → benchmark
decontamination against an eval suite → PII scrub → deterministic
train/val/test assignment. This is the pipeline a 100 TB run actually
executes end-to-end; the stages are the individually-oracled operators
(curate.reject_sets, decontam.decontaminate, pii.pii_features,
split.hash_split, textstats.quality_features/lang_id) composed under
one reason-priority policy, and the whole composition carries a full
DuckDB value-hash oracle (driver rows `corpus_prepare_labels` /
`corpus_prepare_summary`).

Reason priority (first rejecting stage wins):
    exact_dup > near_dup > contaminated > low_quality > non_en > keep
Contamination sits between dedup and the per-row filters: a duplicate
is removed for being a duplicate whether or not it also overlaps the
eval suite, while a contaminated doc must never reach training even if
its quality is also low — ordering the reasons this way makes the
summary's `contaminated` row the complete leak count among surviving
unique docs.

Scale shape (the part that matters at 100 TB):
  - ONE corpus scan computes every per-row signal — PII counts,
    quality features, language vote, split bucket — as chained
    WholeStageCodegen projections (each stage is withColumn-shaped, so
    they fuse; no Python workers anywhere).
  - The corpus crosses the wire only in the dedup stages (md5
    hash-groupBy; minhash banding linear in bucket sizes) — the same
    invariant as curate.py.
  - The eval-suite gram set is broadcast inside decontaminate (eval
    suites are bounded by construction); the three reject-set joins
    carry NO broadcast hint — their size is duplication-/leak-rate-
    dependent, so AQE picks the strategy (round-4 ADVICE discipline).
  - Split assignment is a pure function of (doc_id, salt): zero
    shuffle, reproducible across runs/engines/partitionings, and the
    `split` column partition-prunes the downstream corpus write.

Reference parity: code-index runs its per-file pipeline (ignore-filter
→ parse → extract → embed → upsert) as one orchestrated pass
(indexing_orchestrator.py:60-140); prepare_corpus is the corpus-scale
counterpart with the training-data stages in place of embed/upsert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .curate import reject_sets
from .decontam import decontaminate
from .pii import pii_features
from .split import hash_split
from .textstats import lang_id, quality_features

REASONS = ("exact_dup", "near_dup", "contaminated", "low_quality",
           "non_en", "keep")


def prepare_corpus(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_threshold: float = 0.8,
    min_quality: float = 0.7,
    keep_lang: str = "en",
    decontam_gram_n: int = 8,
    decontam_min_matches: int = 1,
    fractions: dict[str, float] | None = None,
    split_salt: str = "split-v1",
    near_dup_max_bucket: int | None = None,
    checkpoint: bool = False,
) -> DataFrame:
    """(doc_id, reason, split, has_pii, doc_chars) per training doc.

    `reason` is the first rejecting stage (priority above); `split` is
    the doc's deterministic hash_split assignment (computed for every
    doc — it is a pure function of (doc_id, salt) — so downstream
    consumers filter reason = 'keep' and group by split); `has_pii`
    flags docs whose text matched any pii.PII_PATTERNS class (the
    publishable corpus is the keep-set joined back to
    pii.redact_pii's output).

    near_dup_max_bucket → dedupe.minhash_verified_pairs stop-bucket
    cap; crawl corpora with boilerplate cliques should set it (~1000),
    see curate.curation_labels.

    checkpoint=True eagerly localCheckpoints the three (small) reject
    sets, truncating the minhash-banding subtree out of the final
    plan: every AQE stage re-plan then walks a 3-leaf join instead of
    the full banding tree. Worth it on large corpora (measured in
    bench/prepare_scale.py); leave False for small/oracle runs, where
    the 3 extra eager jobs cost more than the analysis they save
    (~1-2s fixed per job in this sandbox), and where executor loss
    would fail the job instead of recomputing (the
    functions/minhash.py truncation caveat)."""
    docs = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))
    ev = eval_df.select(F.col(text_col).alias("text"))
    exact_removed, near_removed = reject_sets(
        docs, near_dup_threshold, near_dup_max_bucket
    )
    contam = (
        decontaminate(docs, ev, "doc_id", "text", gram_n=decontam_gram_n)
        .filter(F.col("n_shared_grams") >= decontam_min_matches)
        .select("doc_id")
        .withColumn("r_contam", F.lit(1))
    )
    if checkpoint:
        exact_removed = exact_removed.localCheckpoint(eager=True)
        near_removed = near_removed.localCheckpoint(eager=True)
        contam = contam.localCheckpoint(eager=True)
    # every per-row signal in one fused projection chain over one scan
    perrow = hash_split(
        lang_id(quality_features(pii_features(docs, "text"), "text"), "text"),
        "doc_id", fractions, split_salt,
    ).select(
        "doc_id", F.length("text").alias("doc_chars"),
        "quality_score", "pred_lang", "has_pii", "split",
    )
    base = (
        perrow
        .join(exact_removed, "doc_id", "left")
        .join(near_removed, "doc_id", "left")
        .join(contam, "doc_id", "left")
    )
    reason = (
        F.when(F.col("r_exact") == 1, "exact_dup")
        .when(F.col("r_near") == 1, "near_dup")
        .when(F.col("r_contam") == 1, "contaminated")
        .when(F.col("quality_score") < min_quality, "low_quality")
        .when(F.col("pred_lang") != keep_lang, "non_en")
        .otherwise("keep")
    )
    return base.select(
        "doc_id", reason.alias("reason"), "split", "has_pii", "doc_chars"
    )


def compact_prepared_labels(
    docs: DataFrame,
    stream_labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_threshold: float = 0.8,
    near_dup_max_bucket: int | None = None,
) -> DataFrame:
    """The nightly COMPACTION that closes the streaming twin's one
    deferred stage (streaming/prepare_stream.py defers near-dup by
    design: minhash banding against the accumulated corpus is not
    proportional to a micro-batch sliver). Run the same
    minhash-verified near-dup detection prepare_corpus runs — over the
    FULL accumulated corpus — and upgrade the stream's labels:

      exact_dup stays exact_dup (it outranks near_dup in the batch
      reason priority); any other stream reason whose doc is in the
      near reject set becomes near_dup; everything else is unchanged.

    The result is row-identical to prepare_corpus over the same corpus
    whenever the stream-parity precondition holds (ids arrive in batch
    order, so the stream's first-seen-batch-then-min-id exact survivor
    equals the batch global min-id survivor) — pinned by pytest.

    Scale shape: the compaction pays one full-corpus near-dup pass —
    the same cost the batch pipeline pays on EVERY run — once per
    compaction window; per-batch streaming cost stays proportional to
    the sliver plus a hash-registry join. The upgrade itself is one
    labels×reject-set join (no broadcast hint — reject size is
    dup-rate-dependent, the round-4 ADVICE discipline)."""
    from .curate import near_reject_set

    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"))
    near_removed = near_reject_set(
        d, near_dup_threshold, near_dup_max_bucket
    )
    reason = (
        F.when(F.col("reason") == "exact_dup", "exact_dup")
        .when(F.col("r_near") == 1, "near_dup")
        .otherwise(F.col("reason"))
    )
    return (
        stream_labels.join(near_removed, "doc_id", "left")
        .select("doc_id", reason.alias("reason"), "split", "has_pii",
                "doc_chars")
    )


def summarize_labels(labels: DataFrame) -> DataFrame:
    """(reason, split, n_docs, n_chars, n_pii_docs) from an existing
    prepare_corpus labels table — the single definition of the run
    report, shared by prepare_summary (recompute path, oracled) and
    jobs/prepare_corpus.py (which consumes its already-checkpointed
    labels instead of re-running the pipeline)."""
    return (
        labels.groupBy("reason", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_chars").cast("long").alias("n_chars"),
            F.sum(F.col("has_pii").cast("int")).cast("long").alias("n_pii_docs"),
        )
        .orderBy("reason", "split")
    )


def prepare_summary(df: DataFrame, eval_df: DataFrame, **kwargs) -> DataFrame:
    """(reason, split, n_docs, n_chars, n_pii_docs) — the run report a
    pipeline operator reads: what survived, where it landed, how much
    was scrubbed."""
    return summarize_labels(prepare_corpus(df, eval_df, **kwargs))


def snapshot_diff(
    old_df: DataFrame, new_df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Corpus snapshot diff — the added/removed/changed/unchanged
    computation an incremental pipeline runs to decide what work the
    next pass owes (the corpus-level generalization of the
    checkpoint store's changed-file incremental skip,
    sources/checkpoint.py; reference bar: code-index reindexes a file
    when its hash changes, file_processing_helpers hash gate).

      doc_id    — union of both snapshots' ids
      status    — 'added' (new only) / 'removed' (old only) /
                  'changed' (both, text hash differs) / 'unchanged'
      old_hash / new_hash — md5 of the text on each side (NULL on the
                  absent side), so downstream stages can route work
                  without re-reading either snapshot

    Scale shape: each side is hashed in its own scan BEFORE the one
    full-outer shuffle on the id — the wide text column never crosses
    the wire, only (id, 32-char hash). No collects, no windows."""
    oh = old_df.select(
        F.col(id_col).alias("doc_id"), F.md5(text_col).alias("old_hash")
    )
    nh = new_df.select(
        F.col(id_col).alias("doc_id"), F.md5(text_col).alias("new_hash")
    )
    j = oh.join(nh, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") != F.col("new_hash"), "changed")
        .otherwise("unchanged")
    )
    return j.select("doc_id", status.alias("status"), "old_hash", "new_hash")


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 64,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global training-order shuffle + shard layout —
    the step between a prepared corpus and a dataloader: every doc
    gets a shard and an in-shard position from a salted hash, so the
    training order is (a) pseudo-random, (b) a pure function of
    (salt, id) — reproducible across runs, partitionings, and engines
    — and (c) computed WITHOUT a global sort.

      shard          — hash60(salt:id) % n_shards (balanced in
                       expectation; hash keys don't skew)
      pos            — dense 0-based rank within the shard, ordered by
                       (hash, id): the in-shard read order
      interleave_key — pos·n_shards + shard: unique; reading shards
                       round-robin by pos IS ascending interleave_key,
                       which defines one global shuffled order without
                       any engine ever sorting the full corpus

    Scale shape: ONE hash shuffle on `shard` plus a per-shard local
    sort (the window partitions by shard, so sorts run in parallel and
    each is 1/n_shards of the corpus). At 100 TB choose n_shards so a
    shard fits an executor's sort spill budget (e.g. 4096 shards ×
    ~25 GB); a global orderBy(hash) would instead range-sample and
    range-shuffle the whole corpus to produce the same order this gets
    by construction. Changing `salt` is a fresh epoch-level reshuffle.

    Reference parity: code-index has no training-output stage; this is
    the shard/shuffle layout member of the training-data family,
    downstream of pack_sequences (operators/prepare.py pack path).
    Determinism discipline matches split.hash_split (never
    randomSplit)."""
    from pyspark.sql import Window

    from ..functions.textfns import hash60

    hkey = hash60(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        hkey.alias("hkey"),
        (hkey % n_shards).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("hkey", "doc_id")
    return base.select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    ).withColumn(
        "interleave_key",
        F.col("pos") * n_shards + F.col("shard"),
    )
