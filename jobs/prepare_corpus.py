"""spark-submit entry: the COMPOSED corpus-preparation pipeline
(operators/prepare.py — curation → decontamination → PII scrub →
deterministic split) over a documents table.

  spark-submit --py-files code_index_spark.zip jobs/prepare_corpus.py \
      --input /data/documents --eval /data/eval_suite \
      --output /data/prepared \
      [--labels /data/prepare_labels] [--threshold 0.8] \
      [--min-quality 0.7] [--keep-lang en] [--gram-n 8] \
      [--max-bucket 1000]

Writes the surviving documents with PII REDACTED and a `split` column,
partitioned by split (so train/val/test prune at the scan), plus the
optional per-doc audit table; prints a one-line JSON run report of
docs/chars/PII counts per (reason, split).
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
    p.add_argument("--eval", dest="eval_path", required=True,
                   help="eval/benchmark-suite parquet dir (decontamination)")
    p.add_argument("--output", required=True,
                   help="prepared-corpus parquet dir (partitioned by split)")
    p.add_argument("--labels", default=None, help="optional per-doc audit table")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--min-quality", type=float, default=0.7)
    p.add_argument("--keep-lang", default="en")
    p.add_argument("--gram-n", type=int, default=8)
    p.add_argument("--max-bucket", type=int, default=None,
                   help="near-dup stop-bucket cap (set ~1000 on crawl corpora)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from code_index_spark.operators.pii import redact_pii
    from code_index_spark.operators.prepare import (
        prepare_corpus,
        summarize_labels,
    )

    spark = SparkSession.builder.appName("kgp-prepare").getOrCreate()
    docs = spark.read.parquet(args.input)
    ev = spark.read.parquet(args.eval_path)
    labels = prepare_corpus(
        docs, ev, id_col=args.id_col, text_col=args.text_col,
        near_dup_threshold=args.threshold, min_quality=args.min_quality,
        keep_lang=args.keep_lang, decontam_gram_n=args.gram_n,
        near_dup_max_bucket=args.max_bucket,
    ).localCheckpoint(eager=True)  # feeds two sinks + the report
    if args.labels:
        labels.write.mode("overwrite").parquet(args.labels)
    keep = labels.filter(F.col("reason") == "keep").select(
        F.col("doc_id").alias(args.id_col), "split"
    )
    (
        redact_pii(docs.join(keep, args.id_col), args.text_col)
        .drop(args.text_col)
        .withColumnRenamed("redacted", args.text_col)
        .write.mode("overwrite").partitionBy("split").parquet(args.output)
    )
    report = [
        {"reason": r["reason"], "split": r["split"], "n_docs": r["n_docs"],
         "n_chars": r["n_chars"], "n_pii_docs": r["n_pii_docs"]}
        for r in summarize_labels(labels).collect()
    ]
    json.dump({"report": report, "output": args.output}, sys.stdout)
    print()


if __name__ == "__main__":
    main()
