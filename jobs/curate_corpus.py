"""spark-submit entry: composed training-data curation over a
documents table (operators/curate.py — exact dedupe → minhash-verified
near-dup removal → quality filter → language filter).

  spark-submit --py-files code_index_spark.zip jobs/curate_corpus.py \
      --input /data/documents --output /data/curated \
      [--labels /data/curation_labels] [--threshold 0.8] \
      [--min-quality 0.7] [--keep-lang en]

Writes the SURVIVING documents as parquet (and, with --labels, the
per-doc (doc_id, reason, doc_chars) audit table), then prints a
one-line JSON summary of docs/chars per reject reason.
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
    p.add_argument("--output", required=True, help="surviving-docs parquet dir")
    p.add_argument("--labels", default=None, help="optional per-doc audit table")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--min-quality", type=float, default=0.7)
    p.add_argument("--keep-lang", default="en")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from code_index_spark.operators.curate import curation_labels

    spark = SparkSession.builder.appName("kgp-curate").getOrCreate()
    docs = spark.read.parquet(args.input)
    labels = curation_labels(
        docs, id_col=args.id_col, text_col=args.text_col,
        near_dup_threshold=args.threshold, min_quality=args.min_quality,
        keep_lang=args.keep_lang,
    ).localCheckpoint(eager=True)  # labels feed two sinks + the summary
    if args.labels:
        labels.write.mode("overwrite").parquet(args.labels)
    keep_ids = labels.filter(F.col("reason") == "keep").select(
        F.col("doc_id").alias(args.id_col)
    )
    docs.join(keep_ids, args.id_col, "left_semi").write.mode(
        "overwrite"
    ).parquet(args.output)
    summary = {
        r["reason"]: {"n_docs": r["n_docs"], "n_chars": r["n_chars"]}
        for r in labels.groupBy("reason")
        .agg(F.count("*").alias("n_docs"), F.sum("doc_chars").alias("n_chars"))
        .collect()
    }
    json.dump({"reasons": summary, "output": args.output}, sys.stdout)
    print()


if __name__ == "__main__":
    main()
