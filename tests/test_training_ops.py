"""Training-data operators: dedupe variants, similarity search,
text stats — correctness on constructed inputs with known answers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from code_index_spark.operators.dedupe import (
    dedupe_exact,
    embedding_cosine_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from code_index_spark.operators.simsearch import (
    brute_force_topk,
    build_lsh_index,
    lsh_bucketed_topk,
)
from code_index_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_features,
    token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " extra tail words"),  # near dup of 0
        (3, "completely different content about spark shuffle partitions here"),
        (4, "el gato la casa de madrid es bonita hoy"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedupe(spark, docs):
    dups = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(dups) == 1
    assert dups[0]["n_dups"] == 2 and dups[0]["keep_id"] == 0
    kept = dedupe_exact(docs, "doc_id", "text")
    assert kept.count() == 5
    assert kept.filter(F.col("doc_id") == 1).count() == 0  # loser dropped


def test_ngram_jaccard(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
    assert all(a != 3 and b != 3 for a, b in pairs)


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"])
             for r in minhash_lsh_pairs(docs, "doc_id", "text", 3, 0.5).collect()}
    assert (0, 1) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_properties(spark, docs):
    sigs = {r["id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    assert sigs[0] == sigs[1]  # identical text → identical signature
    assert sigs[0] != sigs[3]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_pairs(
                 simhash(docs, "doc_id", "text"), max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0


def test_embedding_cosine_pairs_and_blocking(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(16)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 2.0]),        # cosine 1.0 with 0
        (2, [float(x) for x in base + rng.randn(16) * 0.01]),  # ~1.0
        (3, [float(x) for x in rng.randn(16)]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_cosine_pairs(df, "id", "v", 0.99).collect()}
    assert (0, 1) in exact and exact[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in exact
    blocked = {(r["id_a"], r["id_b"])
               for r in embedding_cosine_pairs(df, "id", "v", 0.99, n_planes=4).collect()}
    assert (0, 1) in blocked  # identical-direction vectors share all sign bits


def test_brute_force_topk_and_lsh_agree(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(200, 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "id long, v array<double>",
    )
    q = [float(x) for x in vecs[5]]
    exact = [r["id"] for r in brute_force_topk(df, "id", "v", q, 5).collect()]
    assert exact[0] == 5  # self is the nearest
    indexed, planes = build_lsh_index(df, "id", "v", n_planes=6)
    approx = [r["id"] for r in lsh_bucketed_topk(indexed, planes, q, 5).collect()]
    assert approx[0] == 5  # self lands in the query bucket


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs, "text").collect()}
    assert out[0] == "en"
    assert out[4] == "es"
    assert out[5] == "und"


def test_quality_and_tokens(spark, docs):
    q = {r["doc_id"]: r for r in quality_features(docs, "text").collect()}
    assert q[0]["quality_score"] >= 0.9  # clean english sentence
    assert q[5]["n_words"] == 0 and q[5]["quality_score"] <= 0.2
    t = {r["doc_id"]: r for r in token_counts(docs, "text").collect()}
    assert t[0]["ws_tokens"] == 13
    assert t[5]["ws_tokens"] == 0


def test_fingerprint_deterministic_and_discriminative(spark, docs):
    fp = {r["id"]: r["fingerprint"] for r in fingerprint(docs, "doc_id", "text").collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[3]
    assert fp[5] == 0
