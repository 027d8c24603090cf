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

import json

from pyspark.sql import DataFrame, SparkSession

_SPEC_FILE = "_bucket_spec.json"


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, p


def write_bucket_spec(spark: SparkSession, path: str, spec: dict) -> None:
    """Record the bucket layout next to the files (Hadoop FS, so any
    scheme works). The spec is the one fact a fresh session cannot
    recover from the parquet footers — without it, re-registration
    trusts the caller, and a mismatched declaration silently returns
    wrong joins (see register_bucketed)."""
    fs, p = _hadoop_path(spark, path.rstrip("/") + "/" + _SPEC_FILE)
    out = fs.create(p, True)
    try:
        # writeBytes(String): json.dumps default ensure_ascii makes the
        # payload pure ASCII, so the low-8-bits contract is exact; a
        # Python bytearray arg would hit py4j's write() overload
        # ambiguity
        out.writeBytes(json.dumps(spec, sort_keys=True))
    finally:
        out.close()


def read_bucket_spec(spark: SparkSession, path: str) -> dict | None:
    """The spec sidecar written by write_bucketed, or None for stores
    that predate it (callers then own spec consistency)."""
    fs, p = _hadoop_path(spark, path.rstrip("/") + "/" + _SPEC_FILE)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # JVM-side drain: py4j passes byte arrays BY VALUE, so a
        # readFully into a Python bytearray fills a copy and returns
        # nothing — commons-io (on Spark's classpath) reads it where
        # the stream lives
        jvm = spark.sparkContext._jvm
        txt = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(txt)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
    extra_spec: dict | None = None,
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
    if path is not None:
        spec = {"key": key, "n_buckets": n_buckets, "sort": sort}
        if extra_spec:
            spec.update(extra_spec)
        write_bucket_spec(df.sparkSession, path, spec)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucket spec (see write_bucketed
    note: path reads lose it)."""
    return spark.table(table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    key: str | None = None,
    n_buckets: int | None = None,
    sort: bool | None = None,
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

    The spec itself comes from the `_bucket_spec.json` sidecar
    write_bucketed records next to the files — the one fact the parquet
    footers cannot recover, and the one a caller must not be trusted to
    re-declare: a mismatched declaration makes Spark group by the wrong
    bucketing and silently return wrong joins, so any explicitly-passed
    key/n_buckets/sort is VALIDATED against the sidecar and a conflict
    raises instead of registering. For stores that predate the sidecar
    all three must be passed and the caller owns consistency."""
    spec = read_bucket_spec(spark, path)
    if spec is not None:
        for name, given in (("key", key), ("n_buckets", n_buckets),
                            ("sort", sort)):
            if given is not None and given != spec[name]:
                raise ValueError(
                    f"bucket spec mismatch for {path}: {name}={given!r} "
                    f"passed but the store was written with "
                    f"{name}={spec[name]!r} — re-declaring a different "
                    f"layout would silently return wrong joins"
                )
        key, n_buckets, sort = spec["key"], spec["n_buckets"], spec["sort"]
    elif key is None or n_buckets is None:
        raise ValueError(
            f"no {_SPEC_FILE} sidecar under {path} and no explicit spec: "
            "pass key and n_buckets matching the original write"
        )
    if sort is None:
        sort = True
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
