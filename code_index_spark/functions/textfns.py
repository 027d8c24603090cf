"""Scalar text helpers (SURVEY.md §2.9) shared by queries and rules."""

from __future__ import annotations

from pyspark.sql import functions as F


def glob_to_rlike(pattern: str) -> str:
    """Translate an fnmatch-style glob to an anchored regex (the Spark
    re-expression of the reference's ignore-pattern matching,
    utils.py:98-101 fnmatch semantics).

    Delegates to fnmatch.translate for exact semantics — including the
    set-scanning and invalid-range corner cases — then re-anchors its
    `(?s:...)\\Z` full-match form for partial-match engines (Spark
    rlike / DuckDB regexp_matches). The resulting syntax is in the
    Java-regex ∩ RE2 ∩ Python subset: inline (?s:) group, ^/$ anchors,
    character classes."""
    import fnmatch

    t = fnmatch.translate(pattern)
    if t.endswith(r"\Z"):
        t = t[: -len(r"\Z")]
    return f"^{t}$"


def content_type(col):
    """Heuristic content-type classifier for turn text — the
    deterministic analogue of the reference's Magika AI file-type gate
    (services/ai/magika_detector.py:71-101): routes each turn to the
    right parsing branch (X10). Pure when/otherwise chain — stays in
    codegen, and the CASE is expressible in ANSI SQL for the oracle.

    Classes: 'empty', 'kv' (key=value lines), 'code' (fenced block),
    'url_heavy', 'prose'."""
    t = F.coalesce(col, F.lit(""))
    # trim() strips only spaces (not \n\t) in both Spark and DuckDB —
    # use a whitespace regex for emptiness
    return (
        F.when(t.rlike(r"^\s*$"), "empty")
        .when(t.rlike(r"(?m)^[a-z_][a-z0-9_]*=[^\n]+$"), "kv")
        .when(t.contains("```"), "code")
        .when(
            F.size(F.regexp_extract_all(t, F.lit(r"https?://"), F.lit(0))) >= 2,
            "url_heavy",
        )
        .otherwise("prose")
    )
