"""PII detection and redaction: email / IPv4 / phone counts per
document and a redacted text column — the scrubbing pass a pretraining
pipeline runs before publishing a corpus.

All patterns live in the Python-re ∩ Java-regex ∩ RE2 subset (no
lookaround, no backrefs) — the repo-wide rule for anything that must
run identically in the engine (Java regex) and the DuckDB oracle
(RE2); see rules.py for the same discipline on extraction rules.
Counting and replacement are per-row codegen (regexp_extract_all /
regexp_replace), zero shuffle, so the operator rides the corpus scan
like the other textstats.

Dialect note (CLAUDE.md): Spark's regexp_replace always replaces all
occurrences; DuckDB needs the explicit 'g' flag — the oracle SQL in
__spark_entry__ carries it.

Reference parity: code-index filters sensitive paths by glob/ignore
machinery (utils.py:98-101); content-level scrubbing is the
corpus-scale counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ordered: emails are redacted before IPs/phones so their digit runs
# can't be re-matched by the looser numeric patterns
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"(?:\+[0-9]{7,15})|(?:[0-9]{3}[-.][0-9]{3}[-.][0-9]{4})"

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
]


def pii_features(df: DataFrame, text_col: str) -> DataFrame:
    """Per-doc match counts n_emails / n_ipv4 / n_phones + has_pii.
    Counts are taken on the PROGRESSIVELY REDACTED text (emails
    removed before IPs, IPs before phones), so a single span is never
    double-counted by two pattern classes."""
    cur = F.col(text_col)
    out = df
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        )
        cur = F.regexp_replace(cur, pat, token)
    return out.withColumn(
        "has_pii",
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")) > 0,
    )


def redact_pii(df: DataFrame, text_col: str,
               out_col: str = "redacted") -> DataFrame:
    """Text with every PII span replaced by its class token, applied
    in PII_PATTERNS order (single source with pii_features and the
    DuckDB oracle)."""
    cur = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, token)
    return df.withColumn(out_col, cur)
