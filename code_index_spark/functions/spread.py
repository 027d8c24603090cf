"""Narrow-scan spread — the repo-wide guard applied ahead of per-row
heavy stages (Arrow mapInPandas workers, gram builds, signature
hashing).

A single small parquet file arrives as ONE scan partition, and any
per-row work downstream of it then serializes on one core (the
broadcast-view/split-count hazard in CLAUDE.md). The fix is a
repartition of the CHEAP projection before the heavy expressions — but
only when the scan is actually narrow: reshuffling a corpus that
already splits wide pays a pointless corpus-sized exchange.

Narrowness is estimated without instantiating the RDD lineage when the
input is a file scan: Spark splits files by size, so the split count is
~ Σ ceil(file_len / maxPartitionBytes) over the scan's files — file
COUNT alone over-triggers (an 8 × 1 GB corpus scans as ~64 partitions
and must NOT be reshuffled), which is why the probe stats the files.
Only narrow-looking scans pay the stat calls: the loop stops as soon as
the running estimate reaches the target width, so a many-file corpus
stats at most `width` files. Non-file inputs (ranges, local relations,
checkpoints) fall back to the RDD partition-count probe — those are
small/test shapes where physical planning on the driver is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def estimated_scan_splits(df: DataFrame, stop_at: int) -> int | None:
    """Size-based estimate of the file scan's split count, stopping
    early once `stop_at` is reached (the caller only cares whether the
    scan is narrower than that). Returns None for non-file inputs."""
    files = df.inputFiles()
    if not files:
        return None
    sc = df.sparkSession.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    max_bytes = int(
        jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", "128m"
            )
        )
    )
    splits = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        length = int(fs.getFileStatus(p).getLen())
        splits += max(1, -(-length // max_bytes))
        if splits >= stop_at:
            return splits
    return splits


def spread_narrow_scan(df: DataFrame, width: int | None = None) -> DataFrame:
    """Round-robin repartition `df` to `width` (default: the session's
    core count) iff its scan would arrive narrower than that; wide
    inputs pass through untouched. Call on the narrow (id, text)-style
    projection, BEFORE the heavy per-row expressions, so the shuffle
    moves cheap rows and the work runs at session width (the
    repartition-before-grams rule in CLAUDE.md)."""
    width = width or df.sparkSession.sparkContext.defaultParallelism
    est = estimated_scan_splits(df, stop_at=width)
    if est is None:
        if df.rdd.getNumPartitions() >= width:
            return df
    elif est >= width:
        return df
    return df.repartition(width)
