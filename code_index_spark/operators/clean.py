"""Text normalization — the cleanup stage a crawl corpus passes
through before any quality/dedup signal is computed (the C4/FineWeb
"normalize" step; reference analogue: the pre-chunking text cleanup in
services/shared/file_processing_helpers.py, which strips BOM/CR before
hashing so the skip-if-unchanged md5 is stable).

One rule list is the single source of truth for BOTH engines (the
rules.py/oracle.py discipline): `normalize_text` folds the rules into
a chain of JVM-side `regexp_replace` calls (pure codegen, zero
shuffle, zero Python), and `normalize_sql_expr` emits the identical
DuckDB expression (RE2's `g` flag added there — Spark always replaces
all). Patterns stay in the Java ∩ RE2 subset (no lookaround/backrefs)
and use regex-level `\\x{...}` escapes exclusively, so the same bytes
mean the same thing after SQL quoting (DuckDB string literals do not
process backslashes); replacements are plain ASCII strings.

Rule order matters and is part of the contract: unicode lookalikes
are mapped to ASCII first, then control/zero-width chars are dropped,
then whitespace is canonicalized (CRLF → LF, runs collapsed,
trailing-space strip, ≥3 newlines → blank line), then the ends are
trimmed. The result is idempotent: normalize(normalize(x)) ==
normalize(x), pinned by a hypothesis test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (pattern, replacement) — applied in order. Patterns are regex source
# strings valid in Java AND RE2; replacements are literal strings.
NORMALIZE_RULES: tuple[tuple[str, str], ...] = (
    # unicode punctuation → ASCII
    (r"[\x{2018}-\x{201B}]", "'"),   # curly single quotes
    (r"[\x{201C}-\x{201F}]", '"'),   # curly double quotes
    (r"[\x{2013}-\x{2015}]", "-"),   # en/em/horizontal dash
    (r"\x{2026}", "..."),            # ellipsis
    # unicode spaces → ASCII space (NBSP, en quad..hair space, narrow
    # NBSP, math space, CJK ideographic space)
    (r"[\x{00A0}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]", " "),
    # zero-width chars, word joiner, BOM → gone
    (r"[\x{200B}-\x{200D}\x{2060}\x{FEFF}]", ""),
    # CRLF / lone CR → LF
    (r"\x{0D}\x{0A}?", "\n"),
    # control chars except \t\n → gone (NUL excluded: not expressible
    # in a DuckDB literal, and parquet text never carries it)
    (r"[\x{01}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}]", ""),
    # horizontal-whitespace runs → one space
    (r"[ \x{09}]+", " "),
    # trailing spaces before a newline
    (r" \x{0A}", "\n"),
    # 3+ newlines (≥2 blank lines) → exactly one blank line
    (r"\x{0A}\x{0A}\x{0A}+", "\n\n"),
    # trim both ends (any whitespace)
    (r"^[ \x{09}\x{0A}]+", ""),
    (r"[ \x{09}\x{0A}]+$", ""),
)


def normalize_expr(col: Column) -> Column:
    """The folded rule chain as a Column (all JVM regexp_replace)."""
    for pat, repl in NORMALIZE_RULES:
        col = F.regexp_replace(col, pat, repl)
    return col


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def normalize_sql_expr(expr: str) -> str:
    """The same chain as a DuckDB SQL expression over `expr`.

    DuckDB regexp_replace replaces only the FIRST match without the
    'g' flag (CLAUDE.md dialect note) — added here; Spark has no flag
    arg and always replaces all. Literal newlines inside the quoted
    replacement are valid SQL (a string literal may span lines)."""
    for pat, repl in NORMALIZE_RULES:
        expr = (
            f"regexp_replace({expr}, {_sql_quote(pat)}, "
            f"{_sql_quote(repl)}, 'g')"
        )
    return expr


def normalize_text(
    df: DataFrame, text_col: str, out_col: str = "text_norm"
) -> DataFrame:
    """Append the normalized text plus provenance columns.

    Per-row codegen, no shuffle — at 100 TB this fuses into the scan
    stage of whatever consumes it (WholeStageCodegen over the
    projection; asserted by tests/test_plans.py). `changed` keeps the
    provenance of rows the normalizer touched (the multimodal
    decoded_real lesson: lenient fixes must not be silent)."""
    src = F.col(text_col)
    return (
        df.withColumn(out_col, normalize_expr(src))
        .withColumn("len_before", F.length(src).cast("int"))
        .withColumn("len_after", F.length(F.col(out_col)).cast("int"))
        .withColumn("changed", F.col(out_col) != src)
    )
