"""Text analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
Pure Catalyst end to end (WholeStageCodegen, no Python workers); every
operator including the winnowing fingerprint is oracle-expressible in
DuckDB — the fingerprint uses md5 window hashes shared with its oracle.
"""

from __future__ import annotations

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
    """Winnowing-style document fingerprint: min of 60-bit md5 hashes
    over sliding `window`-word shingles. Pure Catalyst — the window
    hash is md5 of the space-joined shingle, so the exact computation
    is expressible in DuckDB (fingerprint_sql below) and the operator
    keeps a full value-hash oracle. Empty/whitespace-only text → 0.

    Trade-off vs a rolling polynomial hash: each word is hashed
    ~window times instead of once (still linear in text bytes × a
    small constant), in exchange for no Python workers and engine-
    portable values; 61-bit modular arithmetic overflows BIGINT in
    ANSI mode, so a rolling formulation cannot be shared with SQL."""
    from ..functions.textfns import hash60

    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n = F.size(words)
    k = F.least(F.lit(window), n)
    idx = F.sequence(F.lit(1), n - k + 1)
    wins = F.transform(idx, lambda i: hash60(F.concat_ws(" ", F.slice(words, i, k))))
    fp = F.when(F.length(F.trim(t)) == 0, F.lit(0).cast("long")).otherwise(
        F.array_min(wins)
    )
    return df.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))


def fingerprint_sql(window: int = 8, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of fingerprint() — generated from the same constants."""
    h = "CAST(('0x' || substr(md5(array_to_string(words[i:i+k-1], ' ')), 1, 15)) AS BIGINT)"
    return (
        f"WITH w AS (SELECT {id_col} AS id, trim({text_col}) AS t,"
        f" string_split_regex(trim({text_col}), '\\s+') AS words FROM {table}),"
        f" kk AS (SELECT id, t, words, least({window}, len(words)) AS k FROM w) "
        f"SELECT id, CASE WHEN length(t) = 0 THEN 0 ELSE"
        f" list_min([{h} for i in range(1, len(words) - k + 2)]) END AS fingerprint "
        f"FROM kk ORDER BY id"
    )
