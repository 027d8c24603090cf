"""Bucketed-table store — Spark's co-located-join layout for the
tables a pipeline joins on the same key every run.

A `repartition(key)` co-locates ONE plan; bucketing persists the
co-location: `bucketBy(n, key)` writes each bucket as its own file set
with the bucket id derived from the same hash a shuffle would use, and
records the spec in the catalog. Every later equi-join or aggregation
clustered on the key (or a superset) then satisfies its required
distribution straight off the scan — ZERO Exchange in the plan, at any
number of consumers, which is the difference between paying the corpus
shuffle once at write time and paying it in every nightly job that
joins labels×docs, triples×docs, or index×corpus on the id.

When to use it (the 100 TB decision rule):
  - a table is joined/grouped on one stable key by MANY downstream
    runs (the prepared-labels table, the materialized search index,
    the canonical-triples store) → bucket it by that key;
  - both sides of a recurring join bucket by the join key with the
    SAME bucket count → the join is exchange-free on both sides
    (asserted by tests/test_bucketed.py's plan test);
  - one-shot consumers or broadcast-sized dims don't qualify — the
    write-side shuffle + per-bucket files only pay off amortized.

Sizing: n_buckets plays the role of shuffle width for every future
consumer — size it to the DATA like any other width (CLAUDE.md
discipline): bucket ≈ 100-200 MB at the target scale, and keep ONE
writer task per bucket (`repartition(n, key)` before the write,
done below) or each of W writer tasks emits its own file per bucket
and small-file count explodes W×n.

Reference parity: code-index's Qdrant collection is point-id-keyed so
upserts and lookups hit one shard (vector_store.py:203-210); bucketing
is the Spark-native form of that keyed physical layout for JOIN reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet table bucketed (and by default
    per-bucket sorted) on `key`. The one repartition below is the
    write-time shuffle every future consumer skips; it also pins one
    writer task per bucket so each bucket is one file, which is what
    lets a sorted bucket feed a sort-merge join without a re-sort.

    `path` roots the files outside the default warehouse (tests use a
    tmp dir); the bucket spec itself lives in the session catalog —
    readers must come through `spark.table(table)`, a raw
    `spark.read.parquet(path)` sees plain files and forgets the
    layout."""
    w = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.mode(mode).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucket spec (see write_bucketed
    note: path reads lose it)."""
    return spark.table(table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> DataFrame:
    """Re-attach the bucket spec to an existing write_bucketed file set
    in a NEW session. saveAsTable records the spec in the session
    catalog, and this repo runs the default in-memory catalog (no Hive
    metastore), so a fresh SparkSession — tomorrow's spark-submit job —
    doesn't know the table: without re-registration it would fall back
    to a plain path read and pay the exchanges bucketing exists to
    remove. On a deployment with a persistent metastore this is
    unnecessary; here it is one DDL derived from the parquet footer:

        CREATE TABLE t (<schema>) USING parquet
        CLUSTERED BY (key) [SORTED BY (key)] INTO n BUCKETS
        LOCATION 'path'

    The caller owns spec consistency: key/n_buckets/sort must match
    what write_bucketed used — a mismatched declaration makes Spark
    group by the wrong bucketing and silently return wrong joins."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields
    )
    sorted_by = f"SORTED BY (`{key}`) " if sort else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{table}` ({cols}) USING parquet "
        f"CLUSTERED BY (`{key}`) {sorted_by}INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return spark.table(table)
