"""DuckDB oracle-SQL generators derived from the SAME rule table the
Spark extractor executes (rules.RULES) — one source of truth, so the
oracle can never drift from the engine.

All emitted SQL stays in the Spark-SQL ∩ DuckDB dialect intersection
where shared (the transcripts view), or DuckDB-only where the driver
runs it (list comprehensions, unnest)."""

from __future__ import annotations

from .rules import RULES, Rule


def _role_filter(rule: Rule) -> str:
    if set(rule.roles) == {"user", "assistant", "system", "tool"}:
        return ""
    roles = ", ".join(f"'{r}'" for r in rule.roles)
    return f" WHERE role IN ({roles})"


def _extract_call(rule: Rule) -> str:
    if rule.group:
        return f"regexp_extract_all(text, '{rule.pattern}', {rule.group})"
    return f"regexp_extract_all(text, '{rule.pattern}')"


def triples_count_sql() -> str:
    """DuckDB: per-predicate triple counts = Σ per-rule match counts."""
    parts = [
        f"SELECT '{r.category}' AS pred, len({_extract_call(r)}) AS n "
        f"FROM transcripts{_role_filter(r)}"
        for r in RULES
    ]
    union = "\nUNION ALL\n".join(parts)
    return (
        f"SELECT pred, CAST(SUM(n) AS BIGINT) AS n_triples\n"
        f"FROM ({union})\nGROUP BY pred ORDER BY pred"
    )


def class_surfaces_sql() -> str:
    """DuckDB: the distinct class-mention surface corpus — generated
    from every category='class' rule (with role filters), exactly what
    link.mention_surfaces consumes. Keeps search oracles in lockstep
    with the rule table (a hand-listed subset broke silently once)."""
    parts = [
        f"SELECT unnest({_extract_call(r)}) AS surface "
        f"FROM transcripts{_role_filter(r)}"
        for r in RULES
        if r.category == "class"
    ]
    union = "\n    UNION ALL\n    ".join(parts)
    return f"SELECT surface FROM (\n    {union}\n  ) GROUP BY surface"


def class_mentions_sql() -> str:
    """DuckDB: (conv_id, turn_idx, surface) for every class-rule match —
    the raw mention stream feeding co-occurrence graphs. Generated from
    RULES like everything else."""
    parts = [
        f"SELECT conv_id, turn_idx, unnest({_extract_call(r)}) AS surface "
        f"FROM transcripts{_role_filter(r)}"
        for r in RULES
        if r.category == "class"
    ]
    return "\nUNION ALL\n".join(parts)


def triples_rows_sql() -> str:
    """DuckDB: the full (conv_id, turn_idx, pred, obj, rule_id,
    confidence) triple rows via unnest — row-level oracle for the
    mapInPandas extractor."""
    parts = [
        f"SELECT conv_id, turn_idx, '{r.category}' AS pred, "
        f"unnest({_extract_call(r)}) AS obj, "
        f"'{r.rule_id}' AS rule_id, CAST({r.confidence} AS DOUBLE) AS confidence "
        f"FROM transcripts{_role_filter(r)}"
        for r in RULES
    ]
    return "\nUNION ALL\n".join(parts)
