"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set — the standard pretraining-
pipeline step that keeps eval answers out of the training corpus
(the n-gram-overlap method used by GPT-3 appendix C / Dolma / FineWeb).

Scale shape (the part that matters at 100 TB): the EVAL side is an
evaluation suite — bounded at ~10⁴–10⁶ documents by construction, its
distinct-gram set a few hundred MB of 8-byte hashes at worst — so it
is broadcast, and the corpus side is filtered map-side in the scan
stage: the only exchange is the per-doc match count over the
(tiny) post-filter survivors. The corpus itself never shuffles.
Compare `operators/curate.py`, where the reject lists are
duplication-rate-dependent and deliberately NOT broadcast (round-4
ADVICE): an eval suite's size is bounded by design, a reject list's
is not; `broadcast_eval=False` degrades to a shuffle join for the
corpus-vs-corpus overlap case.

Reference parity: code-index gates indexed content against configured
exclusion lists (file_processing_helpers.py:55-57, ignore/exclude
machinery in utils.py:98-101); decontamination is the corpus-scale
generalization — exclusion by content overlap rather than by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textfns import hash60, word_grams


def _distinct_doc_grams(df: DataFrame, id_col: str | None, text_col: str,
                        gram_n: int) -> DataFrame:
    """Per-doc distinct gram hashes (or the global distinct set when
    id_col is None). Hashing to 60-bit longs before the join keeps the
    broadcast table fixed-width (8 bytes/gram vs the gram string) and
    the probe a long==long compare; hash60 is the shared md5 trick so
    the DuckDB oracle can replicate values exactly — though the oracle
    joins raw gram strings, which is the same answer (a 60-bit
    collision inside one doc's ~10³ grams is ~1e-12)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.array_distinct(word_grams(words, gram_n))
    if id_col is None:
        return (
            df.select(F.explode(grams).alias("gram"))
            .select(hash60(F.col("gram")).alias("gh"))
            .distinct()
        )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram"))
        .select("doc_id", hash60(F.col("gram")).alias("gh"))
    )


def decontaminate(train_df: DataFrame, eval_df: DataFrame, id_col: str,
                  text_col: str, gram_n: int = 8,
                  broadcast_eval: bool = True) -> DataFrame:
    """(doc_id, n_shared_grams) for every training doc sharing at
    least one word `gram_n`-gram with the eval set; n_shared_grams
    counts the doc's DISTINCT overlapping grams. Docs absent from the
    output are clean — a curation pipeline anti-joins this result.

    gram_n=8 is the conventional decontamination window (GPT-3 used
    13, Dolma 8); small corpora with small vocabularies want smaller
    windows to be meaningful."""
    ev = _distinct_doc_grams(eval_df, None, text_col, gram_n)
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = _distinct_doc_grams(train_df, id_col, text_col, gram_n)
    return (
        tr.join(ev, "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .orderBy("doc_id")
    )
