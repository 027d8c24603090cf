"""spark-submit entry: BPE tokenizer training over a documents table
(operators/bpe.py) — learn the merge table from the corpus, persist it
as the tokenizer artifact, optionally encode the corpus with it.

  spark-submit --py-files code_index_spark.zip jobs/train_tokenizer.py \
      --input /data/documents --merges /data/tokenizer/merges \
      [--n-merges 1024] [--min-count 2] [--encoded /data/token_counts]

Prints a one-line JSON report: vocabulary size after the min_count
cutoff, merges learned, and (with --encoded) the corpus compression
achieved (chars/token), which is the number to watch when sizing
n_merges.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet dir")
    p.add_argument("--merges", required=True,
                   help="output dir for the learned merge table")
    p.add_argument("--encoded", default=None,
                   help="optional per-doc token-count table output dir")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--n-merges", type=int, default=1024)
    p.add_argument("--min-count", type=int, default=2,
                   help="word-frequency cutoff before merge learning "
                        "(the Zipf-tail pruning lever)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from code_index_spark.operators.bpe import (
        encode_bpe,
        merges_table,
        train_bpe,
        word_freq_table,
    )

    spark = SparkSession.builder.appName("kgp-train-tokenizer").getOrCreate()
    docs = spark.read.parquet(args.input)
    n_words = (
        word_freq_table(docs, args.text_col)
        .filter(F.col("n") >= args.min_count).count()
    )
    merges = train_bpe(docs, args.n_merges, args.text_col,
                       min_count=args.min_count)
    merges_table(spark, merges).write.mode("overwrite").parquet(args.merges)

    report = {"vocab_words": n_words, "merges_learned": len(merges),
              "merges": args.merges}
    if args.encoded:
        enc = encode_bpe(docs, merges, args.id_col, args.text_col)
        enc.write.mode("overwrite").parquet(args.encoded)
        agg = spark.read.parquet(args.encoded).agg(
            F.count("*").alias("n_docs"),
            F.sum("learned_tokens").cast("long").alias("tokens"),
            F.sum("base_chars").cast("long").alias("chars"),
        ).first()
        report.update(
            n_docs=agg["n_docs"], tokens=agg["tokens"],
            chars_per_token=round(agg["chars"] / max(agg["tokens"], 1), 3),
            encoded=args.encoded,
        )
    json.dump(report, sys.stdout)
    print()


if __name__ == "__main__":
    main()
