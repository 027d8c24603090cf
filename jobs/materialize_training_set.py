"""spark-submit entry: the last mile of the training-data pipeline —
turn a PREPARED corpus (jobs/prepare_corpus.py output) into the
physical training layout a dataloader reads:

  mixture sample (per-source rates, oversampling epochs)
    -> tokenize (BPE merge table: pretrained via --merges, or learned
       here from the corpus)
    -> pack into fixed-budget training blocks across n_shards
       independent streams
    -> write the per-unit layout table partitioned by shard

  spark-submit --py-files code_index_spark.zip \
      jobs/materialize_training_set.py \
      --input /data/prepared --output /data/train_layout \
      --rates '{"wiki": 2.0, "web": 0.5}' [--default-rate 1.0] \
      [--stratum-col source] [--split train] \
      [--merges /data/tokenizer/merges | --n-merges 1024 --min-count 2] \
      [--budget 2048] [--n-shards 64]

Every stage is deterministic (pure functions of ids + salts — the
hash_split reproducibility discipline), so re-running the job
reproduces the identical layout; each stage is individually
DuckDB-oracled in the driver registry (`mixture_sample_docs`,
`pack_sequences_docs`, `word_freqs_docs`), and the composed
mixture->pack shape value-hashes end-to-end as
`training_layout_docs`.

Scale shape (100 TB): one corpus-scale Arrow encode pass whose output
lands as a persisted (id, 3 ints) token-count artifact — docs are
tokenized ONCE however many epochs oversample them and however many
consumers re-read the counts — then one id-equi join of the compact
counts onto the sampled copies and ONE shuffle into n_shards streams
with a per-shard window cumsum (pack_sequences docstring). The rates
map is config-scale and compiles to a CASE. Choose n_shards so a
shard's layout rows fit an executor sort budget.

Prints a one-line JSON report: docs in, units sampled (oversample
factor), total tokens, blocks produced, compression.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_merges(spark, path: str) -> list[dict]:
    """Reload a merge table persisted by jobs/train_tokenizer.py."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [{"left": r["left"], "right": r["right"], "rank": r["rank"]}
            for r in rows]


def epoch_slots(rates: dict[str, float], default_rate: float) -> int:
    """Power-of-10 stride for the (doc_id, epoch) -> unit_id encoding,
    sized from the largest configured rate so decode is a div/mod."""
    max_copies = max(
        [int(float(r)) + 1 for r in rates.values()] + [int(default_rate) + 1]
    )
    slots = 10
    while slots <= max_copies:
        slots *= 10
    return slots


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="prepared docs parquet dir")
    p.add_argument("--output", required=True,
                   help="layout table output dir (partitioned by shard)")
    p.add_argument("--rates", default="{}",
                   help="JSON stratum->rate map (rate>1 oversamples by epochs)")
    p.add_argument("--default-rate", type=float, default=1.0)
    p.add_argument("--stratum-col", default="source")
    p.add_argument("--split", default=None,
                   help="keep only this split (needs a `split` column)")
    p.add_argument("--merges", default=None,
                   help="pretrained merge table dir (jobs/train_tokenizer.py)")
    p.add_argument("--n-merges", type=int, default=1024,
                   help="merges to learn when --merges is not given")
    p.add_argument("--min-count", type=int, default=2)
    p.add_argument("--budget", type=int, default=2048,
                   help="tokens per training block")
    p.add_argument("--n-shards", type=int, default=64)
    p.add_argument("--counts", default=None,
                   help="token-count table dir (default <output>_token_counts)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    args = p.parse_args(argv)
    rates = {k: float(v) for k, v in json.loads(args.rates).items()}

    from pyspark.sql import SparkSession, functions as F

    from code_index_spark.operators.bpe import encode_bpe, train_bpe
    from code_index_spark.operators.split import mixture_sample, pack_sequences

    spark = SparkSession.builder.appName("kgp-training-set").getOrCreate()
    docs = spark.read.parquet(args.input)
    if args.split is not None:
        docs = docs.filter(F.col("split") == args.split)

    if args.merges:
        merges = load_merges(spark, args.merges)
    else:
        merges = train_bpe(docs, args.n_merges, args.text_col,
                           min_count=args.min_count)

    # ONE tokenize pass over DOCS (not copies): the expensive Arrow
    # encode runs once and lands as a compact persisted artifact —
    # both consumers below (the mixture join and the report agg) read
    # the (id, 3 ints) table instead of re-running the Python pass
    counts_dir = args.counts or args.output.rstrip("/") + "_token_counts"
    encode_bpe(docs, merges, args.id_col, args.text_col).write.mode(
        "overwrite").parquet(counts_dir)
    counts = spark.read.parquet(counts_dir)

    slots = epoch_slots(rates, args.default_rate)
    mix = mixture_sample(
        docs.select(args.id_col, args.stratum_col),
        args.id_col, args.stratum_col, rates, args.default_rate,
    )
    units = (
        mix.join(counts, args.id_col)
        .select(
            (F.col(args.id_col) * slots + F.col("epoch")).alias("unit_id"),
            "learned_tokens", "base_chars",
        )
    )
    layout = pack_sequences(
        units, "unit_id", "learned_tokens",
        budget=args.budget, n_shards=args.n_shards,
    ).select(
        F.expr(f"doc_id div {slots}").alias(args.id_col),
        F.expr(f"doc_id % {slots}").cast("int").alias("epoch"),
        "shard", "n_tokens", "tok_start", "block_first", "block_last",
    )
    layout.write.mode("overwrite").partitionBy("shard").parquet(args.output)

    got = spark.read.parquet(args.output)
    per_shard = got.groupBy("shard").agg(
        (F.max(F.col("tok_start") + F.col("n_tokens"))).alias("toks"))
    agg = per_shard.agg(
        F.count("*").alias("shards_used"),
        F.sum("toks").cast("long").alias("tokens"),
        F.sum(F.ceil(F.col("toks") / args.budget)).cast("long").alias("blocks"),
    ).first()
    n_docs, n_units = docs.count(), got.count()
    corpus = counts.agg(
        F.sum("base_chars").cast("long").alias("chars"),
        F.sum("learned_tokens").cast("long").alias("toks"),
    ).first()
    report = {
        "n_docs": n_docs, "n_units": n_units,
        "oversample": round(n_units / max(n_docs, 1), 3),
        "tokens": agg["tokens"], "blocks": agg["blocks"],
        "budget": args.budget, "n_shards": args.n_shards,
        "shards_used": agg["shards_used"],
        "merges_used": len(merges),
        "chars_per_token": round(
            (corpus["chars"] or 0) / max(corpus["toks"] or 1, 1), 3),
        "output": args.output, "counts": counts_dir,
    }
    json.dump(report, sys.stdout)
    print()


if __name__ == "__main__":
    main()
