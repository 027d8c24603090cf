"""code_index_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference (GnosticEchos/code-index), re-expressed Spark-first.

Pipeline (SURVEY.md §7): transcripts → turn segmentation → triple
extraction (mapInPandas, rule-driven) → entity linking (MinHashLSH +
TF-IDF cosine) → canonicalization (large-star/small-star connected
components) → graph materialization (vertices/edges), with
checkpoint/lineage for idempotent resume.

Everything is DataFrame-declarative; the only Python on the hot path is
Arrow-batched pandas UDFs (no per-row Python UDFs anywhere).
"""

__version__ = "0.1.0"
