"""spark-submit entry: stages 2-4, triples → entity linking →
canonicalization → vertices/edges tables.

  spark-submit --py-files code_index_spark.zip jobs/build_graph.py \
      --triples /data/triples --output /data/graph [--min-cosine 0.5]
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
    p.add_argument("--triples", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--min-cosine", type=float, default=0.5)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from code_index_spark.operators.canon import connected_components
    from code_index_spark.operators.link import link_mentions
    from code_index_spark.operators.materialize import (
        assign_entities,
        build_edges,
        build_vertices,
        object_vertices,
    )

    spark = SparkSession.builder.appName("kgp-build-graph").getOrCreate()
    triples = spark.read.parquet(args.triples).persist()
    pairs = link_mentions(triples, min_cosine=args.min_cosine).persist()
    components = connected_components(pairs).persist()
    entity_map = assign_entities(triples, components).persist()
    vertices = build_vertices(entity_map).unionByName(object_vertices(triples))
    edges = build_edges(triples, entity_map)
    vertices.write.mode("overwrite").parquet(f"{args.output}/vertices")
    edges.write.mode("overwrite").partitionBy("pred").parquet(f"{args.output}/edges")
    json.dump(
        {
            "vertices": spark.read.parquet(f"{args.output}/vertices").count(),
            "edges": spark.read.parquet(f"{args.output}/edges").count(),
        },
        sys.stdout,
    )
    print()


if __name__ == "__main__":
    main()
