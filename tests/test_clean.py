"""Text normalization (operators/clean.py) + BM25 search (rank.py).

The cross-engine value parity of both ops is pinned by the registered
oracles (normalized_docs, search_bm25_docs — swept by `-m slow` and the
driver); these tests pin the SEMANTICS: golden transforms, idempotence
under arbitrary messy input, provenance flags, and BM25 ranking
behavior (tf saturation, idf ordering, tie-breaks).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from code_index_spark.operators.clean import (
    NORMALIZE_RULES, normalize_sql_expr, normalize_text,
)
from code_index_spark.operators.rank import (
    BM25_B, BM25_K1, bm25_index, bm25_topk,
)


def _norm_one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "text string")
    return normalize_text(df, "text").first()["text_norm"]


GOLDEN = [
    # curly quotes / dash / ellipsis → ASCII
    ("‘a’ “b” – c — d…", "'a' \"b\" - c - d..."),
    # NBSP + zero-width + BOM
    ("a b​c﻿d", "a bcd"),
    # CRLF + lone CR → LF; ≥3 newlines collapse; trailing spaces strip
    ("l1  \r\nl2\rl3\n\n\n\n\nl4", "l1\nl2\nl3\n\nl4"),
    # control chars dropped, tab/space runs → one space, ends trimmed
    (" \t a\x01b \t\t c \x7f ", "ab c"),
    # already-clean text is untouched
    ("plain ascii text", "plain ascii text"),
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_normalize_golden(spark, raw, want):
    assert _norm_one(spark, raw) == want


def test_normalize_changed_flag_and_lengths(spark):
    df = spark.createDataFrame(
        [(0, "clean text"), (1, "  messy  text  ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in normalize_text(df, "text").collect()}
    assert rows[0]["changed"] is False
    assert rows[0]["len_before"] == rows[0]["len_after"]
    assert rows[1]["changed"] is True
    assert rows[1]["text_norm"] == "messy text"
    assert rows[1]["len_after"] == len("messy text")


# alphabet biased toward the characters the rules act on
_MESSY_ALPHABET = st.sampled_from(
    list("ab c\t\n\r") + ["‘", "”", "—", "…",
                          " ", "​", "\x01", "\x1f", "\x7f"]
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_MESSY_ALPHABET, max_size=40).map("".join))
def test_normalize_idempotent_and_canonical(spark, s):
    """normalize∘normalize == normalize, and the output contains none
    of the characters the rules eliminate."""
    once = _norm_one(spark, s)
    assert _norm_one(spark, once) == once
    for bad in ("\r", " ", "​", "\x01", "\t", "  ", "\n\n\n"):
        assert bad not in once


def test_normalize_sql_expr_mentions_every_rule():
    """The oracle generator folds ALL rules, in order, with the 'g'
    flag (DuckDB replaces only the first match otherwise)."""
    sql = normalize_sql_expr("x")
    assert sql.count("regexp_replace") == len(NORMALIZE_RULES)
    assert sql.count("'g'") == len(NORMALIZE_RULES)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bm25_docs(spark):
    rows = [
        (0, "spark spark spark join"),      # high tf on 'spark'
        (1, "spark join window"),           # one of each
        (2, "join window filter sort"),     # no 'spark'
        (3, "vector"),                      # rare term only
        (4, "join join join join join"),    # common term, long-ish
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df, bm25_index(df, "doc_id", "text").localCheckpoint(eager=True)


def test_bm25_index_shape_and_idf_order(bm25_docs):
    _, idx = bm25_docs
    rows = {(r["term"], r["doc_id"]): r for r in idx.collect()}
    # one row per (term, doc) occurrence set
    assert ("spark", 0) in rows and ("spark", 2) not in rows
    assert rows[("spark", 0)]["tf"] == 3
    # rarer term ('vector', df=1) outweighs common ('join', df=4) at tf=1
    w_vector = rows[("vector", 3)]["w_micros"]
    w_join = rows[("join", 1)]["w_micros"]
    assert w_vector > w_join
    # tf saturation: tf=3 scores more than tf=1 but less than 3x
    w_spark3 = rows[("spark", 0)]["w_micros"]
    w_spark1 = rows[("spark", 1)]["w_micros"]
    assert w_spark1 < w_spark3 < 3 * w_spark1


def test_bm25_topk_ranking_and_tiebreak(bm25_docs):
    _, idx = bm25_docs
    got = bm25_topk(idx, "spark window", k=5).collect()
    ids = [r["doc_id"] for r in got]
    # docs matching both query terms hit n_terms_hit=2
    hits = {r["doc_id"]: r["n_terms_hit"] for r in got}
    assert hits[1] == 2
    # every returned doc matches ≥1 term; doc 4 (no spark/window) absent
    assert 4 not in ids and 3 not in ids
    # scores sorted desc, ties by doc_id asc
    scores = [r["score_micros"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_bm25_repeated_query_terms_count_once(bm25_docs):
    _, idx = bm25_docs
    once = {r["doc_id"]: r["score_micros"]
            for r in bm25_topk(idx, "spark", k=5).collect()}
    twice = {r["doc_id"]: r["score_micros"]
             for r in bm25_topk(idx, "spark spark", k=5).collect()}
    assert once == twice


def test_bm25_micros_match_formula(bm25_docs):
    """The stored integer micros are round(w * 1e6) of the textbook
    formula — recomputed here in Python."""
    df, idx = bm25_docs
    docs = {r["doc_id"]: r["text"].split() for r in df.collect()}
    n_docs = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n_docs
    for r in idx.collect():
        tf = docs[r["doc_id"]].count(r["term"])
        dfreq = sum(1 for v in docs.values() if r["term"] in v)
        idf = math.log((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        w = idf * tf * (1 + BM25_K1) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * len(docs[r["doc_id"]]) / avgdl)
        )
        assert r["w_micros"] == round(w * 1e6)


def test_bm25_serving_plan_filters_not_joins(bm25_docs, tmp_path):
    """The serving path is an IN-filter + one tiny aggregation — no
    join, no shuffle of the index beyond the (doc_id, sum) exchange;
    from parquet the term filter reaches the scan (PushedFilters)."""
    _, idx = bm25_docs
    plan = bm25_topk(idx, "spark window", k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    # durable form: the filter pushes into the parquet scan
    path = str(tmp_path / "bm25")
    idx.write.parquet(path)
    spark = idx.sparkSession
    pplan = bm25_topk(spark.read.parquet(path), "spark window", k=5)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term" in pplan


def test_bm25_index_plan_shape(spark):
    """Pin the build's post-checkpoint exchange structure. The tf
    checkpoint is the single tokenize pass (its base repartition ran at
    materialization); downstream, Spark 4's localCheckpoint does NOT
    preserve partitioning (measured — the LogicalRDD scan comes back
    with unknown partitioning), so the expected multiset is exactly
    three doc_id exchanges (join left, dl agg, and the stats branch's
    dl — the latter two canonically identical, so AQE runs them once
    via ReusedExchange) and two term exchanges (df_ partial agg +
    assembly join). A shared explicit repartition
    was baked off and was SLOWER (26.0 vs 23.9s at 2M docs — the extra
    round-trip beats the two concurrent AQE-coalesced exchanges it
    replaces). Any regression that broadcasts the vocabulary shows up
    as a BroadcastHashJoin."""
    import re

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 5).cast("string"),
                 F.lit(" common")).alias("text"),
    )
    plan = bm25_index(docs, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    parts = sorted(
        m.group(1).split("#")[0]
        for m in re.finditer(r"Exchange hashpartitioning\((\w+#\d+)", plan)
    )
    assert parts == ["doc_id", "doc_id", "doc_id", "term", "term"]
    # the vocabulary (term->df) side must NOT be a broadcast build
    assert "BroadcastHashJoin" not in plan
