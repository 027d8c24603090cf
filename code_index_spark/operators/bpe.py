"""BPE tokenizer training over the corpus — the tokenizer-training
stage of an LLM data pipeline (learn the subword merge table FROM the
training corpus, then encode the corpus with it).

Scalable shape (the size-the-algorithm-to-the-data discipline,
canon.py's union-find rule): the ONLY corpus-scale pass in training is
the word-frequency aggregation — a map-side-combined groupBy over
regex pre-tokens, one shuffle of (word, count) partials. Merge
learning then runs DRIVER-SIDE over the compact (word, count) table:
by Zipf, a min_count cutoff leaves millions of distinct words at web
scale — driver-tractable — while a distributed merge loop would pay
per-iteration job latency for state that fits in memory (this is also
how the standard trainers work: subword-nmt and HF tokenizers both
learn merges from exactly this word-count table, never from the raw
corpus). Encoding is corpus-scale again: Arrow-batched mapInPandas
with the merge ranks carried in the closure (broadcast once per
executor), plus an in-batch word cache — words repeat, so the
per-word merge loop runs once per DISTINCT word per batch.

Algorithm: Sennrich et al. 2015 (public), GPT-2-style application
order — training merges ALL occurrences of the chosen pair per rank,
encoding replays merges in rank order, so a training-corpus word
encodes to exactly its end-of-training symbol sequence (pytest pins
this). Pair selection tie-break is deterministic: count DESC, then
(left, right) lexicographic ASC. Pre-tokenization shares
textstats.TOKEN_REGEX (letters / digits / single punctuation; in the
Python-re ∩ Java ∩ RE2 subset, the repo-wide rule), merges never
cross pre-token boundaries, and text is lowercased by default.

Reference parity: code-index tokenizes for its embedding/chunk
budgets with a fixed external tokenizer (constants.py token budgets);
this operator adds the stage the reference outsources — building the
tokenizer itself from the corpus being indexed.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.spread import spread_narrow_scan
from .textstats import TOKEN_REGEX

MERGES_DDL = (
    "rank int, left string, right string, merged string, pair_count bigint"
)


def word_freq_table(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, n) over the corpus — the one corpus-scale training pass.
    Partial aggregation combines map-side, so what crosses the wire is
    one (word, count) row per distinct word per task, not the token
    stream."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    # spread the cheap text projection BEFORE the tokenize: a
    # single-file corpus would otherwise run the whole regex pass on
    # one scan task. Round-robin, not keyed — the groupBy below still
    # plans its map-side partial agg.
    return (
        spread_narrow_scan(df.select(t.alias("__text")))
        .select(
            F.explode(
                F.regexp_extract_all(F.col("__text"), F.lit(TOKEN_REGEX), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _pair_counts(
    words: list[tuple[list[str], int]],
) -> tuple[Counter, defaultdict]:
    """Weighted adjacent-pair counts + inverted index pair → word ids.
    Index entries can go stale after merges (subword-nmt's trick) —
    consumers re-check membership."""
    pairs: Counter = Counter()
    index: defaultdict = defaultdict(set)
    for wid, (syms, cnt) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += cnt
            index[(a, b)].add(wid)
    return pairs, index


def _merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Merge ALL occurrences of `pair` in one left-to-right pass."""
    out, i, merged = [], 0, pair[0] + pair[1]
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    lowercase: bool = True,
    max_words: int = 1_000_000,
) -> list[dict]:
    """Learn up to `n_merges` merges from the corpus. Returns
    [{rank, left, right, merged, pair_count}, ...] in learned order.

    min_count prunes the Zipf tail before the driver collect (the
    100 TB sizing lever: hapaxes are most of the distinct words and
    contribute ~nothing to pair counts); max_words bounds driver
    memory with a DETERMINISTIC truncation (count DESC, word ASC) and
    exists as a guard, not a tuning knob — raise min_count instead of
    lowering it. Stops early when no pair is left."""
    wf = word_freq_table(df, text_col, lowercase)
    if min_count > 1:
        wf = wf.filter(F.col("n") >= min_count)
    rows = (
        wf.orderBy(F.desc("n"), F.asc("word")).limit(max_words).collect()
    )
    words: list[tuple[list[str], int]] = [
        (list(r["word"]), int(r["n"])) for r in rows
    ]
    pairs, index = _pair_counts(words)
    merges: list[dict] = []
    for rank in range(n_merges):
        live = {p: c for p, c in pairs.items() if c > 0}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        merges.append(
            {"rank": rank, "left": best[0], "right": best[1],
             "merged": best[0] + best[1], "pair_count": int(live[best])}
        )
        for wid in list(index[best]):
            syms, cnt = words[wid]
            if best not in zip(syms, syms[1:]):  # stale index entry
                continue
            for a, b in zip(syms, syms[1:]):  # retract old pairs
                pairs[(a, b)] -= cnt
            new_syms = _merge_word(syms, best)
            words[wid] = (new_syms, cnt)
            for a, b in zip(new_syms, new_syms[1:]):
                pairs[(a, b)] += cnt
                index[(a, b)].add(wid)
    return merges


def merges_table(spark: SparkSession, merges: list[dict]) -> DataFrame:
    """The learned merge table as a DataFrame (write it next to the
    corpus snapshot — the tokenizer artifact consumers load)."""
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
         for m in merges],
        MERGES_DDL,
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Replay merges in rank order on one word (all occurrences per
    rank — the training-time application order, so training words
    reproduce their end-of-training symbols)."""
    syms = list(word)
    while len(syms) >= 2:
        cand = [
            (ranks[p], p)
            for p in set(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not cand:
            break
        _, pair = min(cand)
        syms = _merge_word(syms, pair)
    return syms


def encode_bpe(
    df: DataFrame,
    merges: list[dict] | Iterable[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-scale encoding pass: (id, learned_tokens, base_chars,
    n_pretokens) per doc via Arrow-batched mapInPandas. learned_tokens
    is bounded by n_pretokens ≤ learned_tokens ≤ base_chars (merges
    never cross pre-token boundaries); the ratio base_chars /
    learned_tokens is the tokenizer's compression on this corpus."""
    import re as _re

    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    pat = _re.compile(TOKEN_REGEX)
    # the id passes through untouched — carry ITS type (string ids are
    # as legitimate as longs; a hardcoded `long` would fail mid-job in
    # the Arrow serializer, after the expensive training pass)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, learned_tokens int, base_chars int,"
        " n_pretokens int"
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, int] = {}

        def n_word_tokens(w: str) -> int:
            got = cache.get(w)
            if got is None:
                got = cache[w] = len(encode_word(w, ranks))
            return got

        for pdf in batches:
            ids, toks, chars, pres = [], [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                pre = pat.findall(
                    (txt or "").lower() if lowercase else (txt or ""))
                ids.append(i)
                pres.append(len(pre))
                chars.append(sum(len(w) for w in pre))
                toks.append(sum(n_word_tokens(w) for w in pre))
            yield pd.DataFrame(
                {id_col: ids, "learned_tokens": toks,
                 "base_chars": chars, "n_pretokens": pres}
            )

    # narrow-scan spread: a single-file corpus arrives as ONE partition
    # and the whole merge-replay pass would serialize on one Python
    # worker — spread the cheap (id, text) projection first
    return spread_narrow_scan(
        df.select(id_col, text_col)
    ).mapInPandas(run, out_schema)
