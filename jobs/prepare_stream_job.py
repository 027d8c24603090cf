"""spark-submit entry: INCREMENTAL corpus preparation
(streaming/prepare_stream.py) — drain whatever new document parquet
has landed in the input dir since the last invocation, label it
against the accumulated state, and optionally run the nightly
compaction that adds the near-dup labels.

  spark-submit --py-files code_index_spark.zip jobs/prepare_stream_job.py \
      --input /data/incoming --eval /data/eval_suite \
      --state /data/prep_state --checkpoint /data/prep_ck \
      [--compact /data/labels_compacted] \
      [--min-quality 0.7] [--keep-lang en] [--gram-n 8] \
      [--threshold 0.8] [--max-bucket 1000]

Each invocation runs the stream with trigger availableNow (drain and
exit — cron it per ingest window). Without --compact it prints the
per-reason label counts accumulated so far (near-dup still deferred);
with --compact it runs compact_labels over EVERYTHING ingested so
far, writes the upgraded per-doc labels table (the exact batch
prepare_corpus output), and reports its counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="streaming source dir (document parquet appends)")
    p.add_argument("--eval", dest="eval_path", required=True,
                   help="eval/benchmark-suite parquet dir (decontamination)")
    p.add_argument("--state", required=True, help="accumulated-state dir")
    p.add_argument("--checkpoint", required=True,
                   help="streaming checkpoint dir")
    p.add_argument("--compact", default=None,
                   help="run the near-dup compaction and write the "
                        "upgraded labels table here")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--schema", default="doc_id long, text string",
                   help="DDL schema of the incoming parquet")
    p.add_argument("--min-quality", type=float, default=0.7)
    p.add_argument("--keep-lang", default="en")
    p.add_argument("--gram-n", type=int, default=8)
    p.add_argument("--threshold", type=float, default=0.8,
                   help="near-dup jaccard threshold (compaction)")
    p.add_argument("--max-bucket", type=int, default=None,
                   help="near-dup stop-bucket cap (compaction; set "
                        "~1000 on crawl corpora)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from code_index_spark.streaming.prepare_stream import (
        compact_labels,
        fold_state,
        prepared_labels_view,
        start_incremental_prepare,
    )

    spark = SparkSession.builder.appName("kgp-prepare-stream").getOrCreate()
    ev = spark.read.parquet(args.eval_path)
    start_incremental_prepare(
        spark, args.input, args.state, args.checkpoint, ev, args.schema,
        id_col=args.id_col, text_col=args.text_col,
        min_quality=args.min_quality, keep_lang=args.keep_lang,
        decontam_gram_n=args.gram_n,
    ).awaitTermination()

    if args.compact:
        docs = spark.read.schema(args.schema).parquet(args.input)
        labels = compact_labels(
            spark, args.state, docs, args.id_col, args.text_col,
            near_dup_threshold=args.threshold,
            near_dup_max_bucket=args.max_bucket,
        ).localCheckpoint(eager=True)  # feeds the write + the report
        labels.write.mode("overwrite").parquet(args.compact)
        # stream is drained and stopped here — fold the per-batch state
        # deltas so dir/file count stays bounded on long-lived streams
        fold_state(spark, args.state)
        source = "compacted"
    else:
        labels = prepared_labels_view(spark, args.state)
        source = "stream"
    counts = {r["reason"]: r["n"] for r in labels.groupBy("reason")
              .agg(F.count("*").alias("n")).orderBy("reason").collect()}
    json.dump({"labels": source, "reasons": counts,
               "n_docs": int(sum(counts.values()))}, sys.stdout)
    print()


if __name__ == "__main__":
    main()
