"""spark-submit entry: stage 1, transcripts → triples with
checkpointed resume.

  spark-submit --py-files code_index_spark.zip jobs/extract_triples.py \
      --input /data/transcripts --output /data/triples \
      --checkpoint /data/ckpt [--buckets 4096]

At cluster scale --buckets should be ~2-4x total executor cores;
buckets are hash partitions of conv_id, so resume granularity and
write parallelism follow it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs without --py-files: make the repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="transcripts parquet dir")
    p.add_argument("--output", required=True, help="triples parquet dir")
    p.add_argument("--checkpoint", required=True, help="checkpoint table dir")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument(
        "--incremental",
        action="store_true",
        help="input is a slice, not the full corpus: never reconcile "
        "(delete) buckets absent from the input",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from code_index_spark.operators.extract import extract_triples
    from code_index_spark.sources.checkpoint import CheckpointStore, run_with_resume

    spark = SparkSession.builder.appName("kgp-extract").getOrCreate()
    transcripts = spark.read.parquet(args.input)
    ckpt = CheckpointStore(spark, args.checkpoint)
    # --input points at the whole transcripts dir, i.e. the full corpus,
    # so vanished-bucket reconciliation is safe unless --incremental
    stats = run_with_resume(
        spark, transcripts, args.output, ckpt, extract_triples, args.buckets,
        reconcile_missing=not args.incremental,
    )
    json.dump(stats, sys.stdout)
    print()


if __name__ == "__main__":
    main()
