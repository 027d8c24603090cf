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

With `--bucket-store DIR` the job additionally maintains the corpus
and its labels as BUCKETED tables (sources/bucketed.py) under DIR,
both bucketed on the doc id with `--n-buckets` buckets. This is the
store's decision rule applied: the corpus×labels id-join recurs in
every nightly consumer (this job's redaction join, compaction,
snapshot diff, DSIR/classifier audits), so the id shuffle is paid
ONCE at ingest instead of per run — the redaction join here plans
with ZERO Exchange nodes (tests/test_jobs_cli.py asserts it). A
pre-existing DIR/docs is re-attached via register_bucketed (the
cross-run path: tomorrow's spark-submit has a fresh in-memory
catalog), so only the FIRST run pays the corpus shuffle. The store is
an ingest CACHE of --input: reuse is gated on the recorded input
signature (file list + sizes + mtimes) and the layout comes from the
`_bucket_spec.json` sidecar, so a grown/changed corpus dir re-ingests
instead of silently preparing a stale snapshot, and a drifted
--n-buckets flag cannot re-declare a wrong bucket spec.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def store_tables(bucket_store: str) -> tuple[str, str]:
    """Catalog names for a bucket store dir (docs_table, labels_table) —
    derived from the dir so two stores in one session don't collide;
    shared with the test, which reopens the tables to check the plan."""
    tag = hashlib.md5(bucket_store.encode()).hexdigest()[:8]
    return f"prep_docs_{tag}", f"prep_labels_{tag}"


def input_signature(input_path: str) -> str:
    """Fingerprint of the input dir's data files (relpath, size, mtime):
    the store-reuse guard. A bucket store is an ingest CACHE of
    --input — reusing it when the corpus dir has grown or changed would
    silently prepare yesterday's corpus — so the cached layout is only
    trusted while this signature matches the one recorded at write
    time. Local-FS walk, matching the job's os.path store probing."""
    h = hashlib.md5()
    for root, dirs, files in sorted(os.walk(input_path)):
        dirs.sort()
        for fn in sorted(files):
            if fn.startswith(("_", ".")):
                continue
            full = os.path.join(root, fn)
            st = os.stat(full)
            rel = os.path.relpath(full, input_path)
            h.update(f"{rel}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


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
    p.add_argument("--bucket-store", default=None,
                   help="dir for the persisted bucketed docs+labels tables")
    p.add_argument("--n-buckets", type=int, default=64,
                   help="bucket count for --bucket-store (size ≈100-200MB/bucket)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from code_index_spark.operators.pii import redact_pii
    from code_index_spark.operators.prepare import (
        prepare_corpus,
        summarize_labels,
    )

    spark = SparkSession.builder.appName("kgp-prepare").getOrCreate()
    if args.bucket_store:
        from code_index_spark.sources.bucketed import (
            register_bucketed,
            write_bucketed,
        )

        from code_index_spark.sources.bucketed import read_bucket_spec

        docs_tbl, labels_tbl = store_tables(args.bucket_store)
        docs_path = os.path.join(args.bucket_store, "docs")
        spark.sql(f"DROP TABLE IF EXISTS `{docs_tbl}`")
        spark.sql(f"DROP TABLE IF EXISTS `{labels_tbl}`")
        sig = input_signature(args.input)
        spec = (read_bucket_spec(spark, docs_path)
                if os.path.isdir(docs_path) else None)
        if (spec is not None and spec.get("key") == args.id_col
                and spec.get("input_sig") == sig):
            # cross-run path: the files already have the layout AND
            # still reflect --input (signature match); only the catalog
            # entry is missing in this fresh session. The layout comes
            # from the sidecar, never the CLI — a --n-buckets drift
            # cannot re-declare a wrong spec.
            docs = register_bucketed(spark, docs_tbl, docs_path)
            n_buckets = spec["n_buckets"]
        else:
            # first run, or the corpus dir changed since the store was
            # written: re-ingest (pay the one corpus shuffle) rather
            # than silently preparing a stale snapshot
            n_buckets = args.n_buckets
            write_bucketed(spark.read.parquet(args.input), docs_tbl,
                           args.id_col, n_buckets, path=docs_path,
                           extra_spec={"input_sig": sig})
            docs = spark.table(docs_tbl)
    else:
        docs = spark.read.parquet(args.input)
    ev = spark.read.parquet(args.eval_path)
    labels = prepare_corpus(
        docs, ev, id_col=args.id_col, text_col=args.text_col,
        near_dup_threshold=args.threshold, min_quality=args.min_quality,
        keep_lang=args.keep_lang, decontam_gram_n=args.gram_n,
        near_dup_max_bucket=args.max_bucket,
    )
    if args.bucket_store:
        # the bucketed parquet write IS the materialization (no
        # localCheckpoint needed), and the read-back scan carries the
        # bucket spec, so the redaction join below is exchange-free
        # the RESOLVED bucket count (sidecar on reuse), never the CLI:
        # both sides of the redaction join must share it to stay
        # exchange-free
        write_bucketed(labels, labels_tbl, "doc_id", n_buckets,
                       path=os.path.join(args.bucket_store, "labels"))
        labels = spark.table(labels_tbl)
    else:
        labels = labels.localCheckpoint(eager=True)  # two sinks + report
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
    out = {"report": report, "output": args.output}
    if args.bucket_store:
        out["bucket_store"] = {"dir": args.bucket_store,
                               "docs_table": docs_tbl,
                               "labels_table": labels_tbl,
                               "n_buckets": n_buckets}
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
