"""Text analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All but the fingerprint are pure Catalyst expressions (WholeStageCodegen,
oracle-expressible in DuckDB); the fingerprint is an Arrow-batched
pandas UDF (rolling hash needs sequential state per doc).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic (deterministic, SQL-expressible)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
}


def _marker_hits(col, words: list[str]):
    toks = F.split(F.lower(col), "\\s+")
    hits = F.lit(0)
    for w in words:
        hits = hits + F.when(F.array_contains(toks, w), 1).otherwise(0)
    return hits


def lang_id(df: DataFrame, text_col: str) -> DataFrame:
    """Predicted language by stopword-marker vote; 'und' if no marker.
    Ties broken by fixed language order (deterministic)."""
    out = df
    for lang, words in LANG_MARKERS.items():
        out = out.withColumn(f"_hits_{lang}", _marker_hits(F.col(text_col), words))
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in LANG_MARKERS:  # insertion order = tie-break order
        cond = F.col(f"_hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"_hits_{lang}")).otherwise(best_hits)
    out = out.withColumn("pred_lang", best)
    return out.drop(*[f"_hits_{lang}" for lang in LANG_MARKERS])


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / token / punctuation / stopword-ratio features and a
    composite quality score in [0,1] — the training-data filter."""
    t = F.col(text_col)
    words = F.split(F.trim(t), "\\s+")
    n_chars = F.length(t)
    n_words = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(words))
    avg_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, lambda w: F.lower(w)),
            F.array(*[F.lit(w) for w in ("the", "and", "of", "to", "a", "in")]),
        )
    )
    score = (
        F.when((n_words >= 5) & (n_words <= 100000), 0.4).otherwise(0.0)
        + F.when((avg_word_len >= 2.0) & (avg_word_len <= 12.0), 0.3).otherwise(0.0)
        + F.when(punct_ratio <= 0.1, 0.1).otherwise(0.0)
        + F.when(stop_hits > 0, 0.2).otherwise(0.0)
    )
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("avg_word_len", F.round(avg_word_len, 4))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_hits", stop_hits)
        .withColumn("quality_score", F.round(score, 2))
    )


# BPE-ish token estimator: word pieces ≈ runs of letters / digits /
# single punctuation, the standard cheap proxy for subword counts.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    t = F.col(text_col)
    ws = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(F.split(F.trim(t), "\\s+")))
    bpe = F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0))
    return df.withColumn("ws_tokens", ws).withColumn("bpe_tokens", bpe)


def fingerprint(df: DataFrame, id_col: str, text_col: str, window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling hash over
    word windows (polynomial rolling hash mod 2^61-1). Arrow-batched
    pandas UDF — sequential per doc, vectorized per batch."""
    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def fp(text: str) -> int:
        if not text:
            return 0
        words = text.split()
        if not words:
            return 0
        hashes = []
        for w in words:
            h = 0
            for ch in w.encode("utf-8"):
                h = (h * BASE + ch) % MOD
            hashes.append(h)
        best = None
        k = min(window, len(hashes))
        roll = 0
        pw = pow(BASE, k - 1, MOD)
        for i, h in enumerate(hashes):
            roll = (roll * BASE + h) % MOD
            if i >= k:
                roll = (roll - hashes[i - k] * pw * BASE) % MOD
            if i >= k - 1:
                best = roll if best is None else min(best, roll)
        return best if best is not None else hashes[0]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "fingerprint": [fp(t) for t in pdf[text_col]]}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema="id long, fingerprint long")
