"""BPE tokenizer training (operators/bpe.py): the incremental
pair-index trainer must match a naive reference implementation merge
for merge; encoding must replay training exactly (a training word
encodes to its end-of-training symbols) and respect the structural
bounds n_pretokens ≤ learned_tokens ≤ base_chars."""

import re
from collections import Counter

from pyspark.sql import functions as F

from code_index_spark.operators.bpe import (
    _merge_word,
    encode_bpe,
    encode_word,
    merges_table,
    train_bpe,
    word_freq_table,
)
from code_index_spark.operators.textstats import TOKEN_REGEX


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Naive recount-everything BPE (Sennrich 2015), deterministic
    tie-break (count DESC, pair ASC) — the spec the incremental
    trainer must match."""
    words = [(list(w), c) for w, c in word_counts.items()]
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, cnt in words:
            for p in zip(syms, syms[1:]):
                pairs[p] += cnt
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append((rank, best[0], best[1], pairs[best]))
        words = [(_merge_word(s, best), c) for s, c in words]
    return merges, words


def _corpus(spark):
    rows = [
        (0, "low low low low low"),
        (1, "lower lower newest newest"),
        (2, "newest newest newest newest"),
        (3, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trainer_matches_reference(spark):
    docs = _corpus(spark)
    wf = {r["word"]: r["n"]
          for r in word_freq_table(docs, "text").collect()}
    want, _ = _reference_bpe(wf, 12)
    got = train_bpe(docs, 12, "text")
    assert [(m["rank"], m["left"], m["right"], m["pair_count"])
            for m in got] == want
    # deterministic: same input, same merges
    assert train_bpe(docs, 12, "text") == got


def test_training_words_encode_to_final_symbols(spark):
    docs = _corpus(spark)
    merges = train_bpe(docs, 10, "text")
    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    wf = {r["word"]: r["n"]
          for r in word_freq_table(docs, "text").collect()}
    _, final_words = _reference_bpe(wf, 10)
    final = {"".join(s): s for s, _ in final_words}
    for word, syms in final.items():
        assert encode_word(word, ranks) == syms
        assert "".join(encode_word(word, ranks)) == word  # lossless


def test_encode_bpe_bounds_and_compression(spark):
    docs = _corpus(spark)
    merges = train_bpe(docs, 10, "text")
    enc = {r["doc_id"]: r
           for r in encode_bpe(docs, merges).collect()}
    pat = re.compile(TOKEN_REGEX)
    for doc_id, text in _corpus(spark).collect():
        pre = pat.findall(text.lower())
        r = enc[doc_id]
        assert r["n_pretokens"] == len(pre)
        assert r["base_chars"] == sum(len(w) for w in pre)
        assert r["n_pretokens"] <= r["learned_tokens"] <= r["base_chars"]
    # merges learned from this corpus must compress it
    assert sum(r["learned_tokens"] for r in enc.values()) < sum(
        r["base_chars"] for r in enc.values())
    # zero merges ⇒ pure character tokens
    enc0 = {r["doc_id"]: r for r in encode_bpe(docs, []).collect()}
    assert all(r["learned_tokens"] == r["base_chars"]
               for r in enc0.values())


def test_min_count_prunes_tail_and_merges_df(spark):
    docs = _corpus(spark).union(
        spark.createDataFrame([(9, "zzzq")], "doc_id long, text string"))
    merges = train_bpe(docs, 30, "text", min_count=2)
    # the hapax word contributes no pairs
    assert all("z" not in (m["left"] + m["right"]) for m in merges)
    tbl = merges_table(spark, merges)
    assert tbl.count() == len(merges)
    assert [r["rank"] for r in tbl.orderBy("rank").collect()] == list(
        range(len(merges)))


def test_early_stop_and_null_text(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, None)], "doc_id long, text string")
    merges = train_bpe(docs, 50, "text")
    assert [m["merged"] for m in merges] == ["ab"]  # then no pairs left
    enc = {r["doc_id"]: r["learned_tokens"]
           for r in encode_bpe(docs, merges).collect()}
    assert enc[1] == 0  # NULL text encodes to zero tokens, no crash
    assert enc[0] == 2


def test_word_freq_plan_is_partial_agg(spark):
    """The corpus-scale pass combines map-side: the plan has exactly
    one Exchange with a partial_count below it."""
    docs = _corpus(spark)
    plan = (
        word_freq_table(docs, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan
