"""spark-submit entry: build the SERVING indexes once per corpus
snapshot — the batch half of the reference's index-then-serve split
(vector_store.py:386-477 builds the persistent Qdrant index; queries
then cost ~56 ms against it).

Two indexes, both written through sources/bucketed so the query paths
are co-located/pruned with zero exchange on the lookup key:

  entities — link.build_search_index over extracted triples: the
             (gram, surface, w, nrm) TF-IDF table entity_search_indexed
             serves from, bucketed by gram.
  bm25     — rank.bm25_index over a documents table: per-(term, doc)
             integer-micros partial scores, bucketed by term so a
             query's IN-filter reads ≤ len(terms) buckets
             (bm25_topk docstring: serving sessions pin
             autoBucketedScan off).

  spark-submit --py-files code_index_spark.zip jobs/build_search_index.py \
      --triples /data/triples --docs /data/docs.parquet \
      --output /data/search_index [--buckets 64] [--probe "spark merge"]

A fresh serving session re-attaches the bucket specs with
sources.bucketed.register_bucketed (this repo runs the in-memory
catalog; a deployment with a metastore skips that step).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--triples", required=True, help="triples parquet dir")
    p.add_argument("--docs", required=True, help="documents parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--probe", default=None,
                   help="optional query to serve once from each index "
                        "after the build (prints latency)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from code_index_spark.operators.link import build_search_index
    from code_index_spark.operators.rank import bm25_index, bm25_topk
    from code_index_spark.sources.bucketed import read_bucketed, write_bucketed

    spark = SparkSession.builder.appName("kgp-build-search-index") \
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "false").getOrCreate()

    triples = spark.read.parquet(args.triples)
    docs = spark.read.parquet(args.docs)

    t0 = time.perf_counter()
    ent = build_search_index(triples)
    write_bucketed(ent, "search_index_entities", "gram", args.buckets,
                   path=f"{args.output}/entities")
    t_ent = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    bm = bm25_index(docs, args.id_col, args.text_col)
    write_bucketed(bm, "search_index_bm25", "term", args.buckets,
                   path=f"{args.output}/bm25")
    t_bm = round(time.perf_counter() - t0, 1)

    out = {
        "entities_rows": read_bucketed(spark, "search_index_entities").count(),
        "entities_build_sec": t_ent,
        "bm25_postings": read_bucketed(spark, "search_index_bm25").count(),
        "bm25_build_sec": t_bm,
        "buckets": args.buckets,
    }
    if args.probe:
        from code_index_spark.operators.link import search_index_topk

        t0 = time.perf_counter()
        search_index_topk(
            read_bucketed(spark, "search_index_entities"), args.probe, k=10
        ).collect()
        out["probe_entities_ms"] = round((time.perf_counter() - t0) * 1000)
        t0 = time.perf_counter()
        bm25_topk(
            read_bucketed(spark, "search_index_bm25"), args.probe, k=10
        ).collect()
        out["probe_bm25_ms"] = round((time.perf_counter() - t0) * 1000)
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
