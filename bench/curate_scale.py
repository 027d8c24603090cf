"""Composed curation pipeline at scale (round-4 VERDICT #5): the
end-to-end corpus filter — exact dedupe → minhash near-dup → quality →
language — run on a synthesized corpus 100×+ the sf0.1 documents table,
with per-stage walls and the end-to-end docs/s rate.

Fixture (deterministic, pure Spark SQL — no driver-side data): 10-way
id bucketing plants known populations so the output distribution is a
correctness check as well as a timing run:
  id%10==0,5..9  keep docs — unique md5-token bodies threaded with
                 English stopwords (quality 1.0, lang en)
  id%10==1       EXACT duplicate of doc id-1's text
  id%10==2       NEAR duplicate of doc id-2 (one word appended:
                 word-3-gram jaccard ≈ (W-2)/(W-1) ≈ 0.92 ≥ 0.8)
  id%10==3       low-quality (punctuation soup, 3 words)
  id%10==4       French marker text (quality 0.8 — passes the quality
                 gate so the label priority routes it to non_en)
Expected label mix: 60% keep / 10% each otherwise (near-dup bases are
keeps, so reject reasons can't collide with their survivors).

Usage: python bench/curate_scale.py [n_docs]   (default 600_000)
Appends/replaces the '## Composed curation at scale' section of
BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000

    from pyspark.sql import functions as F

    from code_index_spark.operators.curate import curation_summary
    from code_index_spark.operators.dedupe import (
        exact_duplicates,
        minhash_verified_pairs,
    )
    from code_index_spark.operators.textstats import lang_id, quality_features
    from code_index_spark.session import get_spark

    spark = get_spark(
        "curate-scale", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
    )

    def tok(tag, id_expr):
        return F.lower(F.conv(
            F.substring(F.md5(F.concat(F.lit(tag), id_expr.cast("string"))), 1, 12),
            16, 36,
        ))

    def body(id_expr):
        # 13 words: English stopwords interleaved with high-entropy
        # base36 tokens — quality 1.0, lang en, near-zero cross-doc
        # gram overlap (CLAUDE.md: base36, not hex, for gram entropy)
        parts = [F.lit("the"), tok("a", id_expr), F.lit("and"),
                 tok("b", id_expr), F.lit("of"), tok("c", id_expr),
                 tok("d", id_expr), F.lit("to"), tok("e", id_expr),
                 tok("f", id_expr), F.lit("in"), tok("g", id_expr),
                 tok("h", id_expr)]
        return F.concat_ws(" ", *parts)

    bucket = F.col("id") % 10
    text = (
        F.when(bucket == 1, body(F.col("id") - 1))
        .when(bucket == 2, F.concat(body(F.col("id") - 2), F.lit(" "),
                                    tok("x", F.col("id"))))
        .when(bucket == 3, F.concat(F.lit("!!! ??? ,,. "), tok("j", F.col("id"))))
        .when(bucket == 4, F.concat_ws(
            " ", F.lit("le"), tok("k", F.col("id")), F.lit("et"),
            tok("m", F.col("id")), F.lit("la"), tok("n", F.col("id")),
            tok("p", F.col("id")), tok("q", F.col("id"))))
        .otherwise(body(F.col("id")))
    )
    docs = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .localCheckpoint(eager=True)  # fixture cost excluded from walls
    )
    out = {"metric": "curate_scale", "n_docs": n_docs}

    t0 = time.perf_counter()
    out["n_exact_groups"] = exact_duplicates(docs, "doc_id", "text").count()
    out["wall_exact_sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    out["n_near_pairs"] = minhash_verified_pairs(
        docs, "doc_id", "text", threshold=0.8
    ).count()
    out["wall_near_sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    out["n_low_quality"] = (
        quality_features(docs, "text").filter(F.col("quality_score") < 0.7).count()
    )
    out["wall_quality_sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    out["n_non_en"] = (
        lang_id(docs, "text").filter(F.col("pred_lang") != "en").count()
    )
    out["wall_lang_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

    # composed operator end to end (recomputes every stage — what one
    # curation job pays)
    t0 = time.perf_counter()
    summary = {r["reason"]: r["n_docs"] for r in curation_summary(docs).collect()}
    out["wall_composed_sec"] = round(time.perf_counter() - t0, 1)
    out["docs_per_sec_composed"] = int(n_docs / (out["wall_composed_sec"] or 1))
    out["labels"] = summary

    # planted-population check: the label mix must match the fixture
    expect = {"keep": 0.6, "exact_dup": 0.1, "near_dup": 0.1,
              "low_quality": 0.1, "non_en": 0.1}
    out["label_mix_ok"] = all(
        abs(summary.get(k, 0) / n_docs - v) < 0.005 for k, v in expect.items()
    )
    print(json.dumps(out), flush=True)

    cores = os.environ.get("SPARK_GRAFT_CPUS", 32)
    section = (
        "## Composed curation at scale\n\n"
        f"({n_docs} docs, local[{cores}], bench/curate_scale.py.) "
        "The full training-data filter (exact dedupe → minhash-verified "
        "near-dup → quality → language) on a synthesized corpus with "
        "PLANTED populations — 10% exact dups, 10% one-word-appended "
        "near-dups (gram jaccard ≈ 0.92), 10% punctuation soup, 10% "
        "French — so the label mix is a correctness check, not just a "
        "wall clock (bench/curate_scale.py; the oracle-checked driver "
        "rows pin the same composition at sf0.01).\n\n"
        "| stage | wall (s) | output |\n|---|---|---|\n"
        f"| exact_duplicates | {out['wall_exact_sec']} | "
        f"{out['n_exact_groups']} dup groups |\n"
        f"| minhash_verified_pairs (s≥0.8) | {out['wall_near_sec']} | "
        f"{out['n_near_pairs']} verified pairs |\n"
        f"| quality_features < 0.7 | {out['wall_quality_sec']} | "
        f"{out['n_low_quality']} low-quality |\n"
        f"| lang_id ≠ en | {out['wall_lang_sec']} | "
        f"{out['n_non_en']} non-English |\n"
        f"| **curation_summary (composed)** | **{out['wall_composed_sec']}** | "
        f"{out['docs_per_sec_composed']} docs/s; labels {summary} |\n\n"
        f"Planted label mix reproduced: {out['label_mix_ok']} "
        "(each reason within 0.5% of its planted rate). The composed "
        "wall ≈ the dedup stages (the only ones where the corpus "
        "crosses the wire) — quality/lang are per-row codegen riding "
        "the same scan.\n"
    )
    from bench.scaling import _update_bench_md

    _update_bench_md(ROOT, None, section)


if __name__ == "__main__":
    main()
