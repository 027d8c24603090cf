"""Deduplication operators for large-scale corpus pipelines.

Five strategies, each a DataFrame-in/DataFrame-out operator over a
(id, text) or (id, embedding) table:

  exact            — hash-groupBy on md5(text); zero false positives
  ngram_jaccard    — exact n-gram Jaccard pairs via explode + hash join
  minhash_lsh      — MinHashLSH banding (the 100 TB path: candidate
                     pairs only, never O(n²))
  simhash          — 64-bit simhash in a vectorized pandas UDF +
                     Hamming-band self-join
  embedding_cosine — near-dup pairs by embedding cosine, blocked by
                     random-hyperplane sign buckets

Scale notes: every strategy dedupes/aggregates *before* any pairwise
work; the only cross joins are within LSH/band buckets, whose size is
bounded by construction. AQE skew-join handles hot buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import DataFrame, Window, functions as F


# ---------------------------------------------------------------- exact
def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_dups, keep_id).

    keep_id = min id (deterministic survivor). One shuffle, map-side
    partial agg; the hash is computed before the shuffle so the wide
    text column never moves."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min("id").alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def dedupe_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row (min id) per distinct text."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ------------------------------------------------------- n-gram jaccard
def word_ngrams(col, n: int = 3):
    """Distinct word n-grams (shingles) of a text column, pure SQL."""
    words = F.split(F.trim(col), "\\s+")
    k = F.size(words) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(1)))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.array_distinct(shingles)


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard similarity pairs over word n-grams.

    explode → self hash-join on shingle → |∩| per pair → Jaccard via
    |A|+|B|-|∩|. The join key is the shingle, so common shingles fan
    out — at 100 TB this runs *after* minhash_lsh blocking (use this
    as the exact rescoring stage); standalone it is exact and fine to
    ~10^6 docs per shingle-frequency cap."""
    grams = df.select(
        F.col(id_col).alias("id"), F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    a = grams.select(F.col("id").alias("id_a"), "g")
    b = grams.select(F.col("id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------- minhash-lsh
def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    jaccard_max_dist: float = 0.3,
    num_hash_tables: int = 8,
) -> DataFrame:
    """MinHash-LSH candidate near-dup pairs (shingle → minhash → band →
    bucket join). This is the scale path: pair generation is linear in
    bucket sizes, not quadratic in corpus size."""
    spark = df.sparkSession
    shingled = df.select(
        F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("grams")
    ).filter(F.size("grams") > 0)
    tf = HashingTF(inputCol="grams", outputCol="features", binary=True,
                   numFeatures=1 << 20)
    # checkpoint the featurized side: the LSH self-join copies its input
    # plan several times (driver re-analysis cost), and the banded join
    # runs best at shuffle widths sized to the corpus, not the session
    feat = tf.transform(shingled).localCheckpoint(eager=True)
    n_docs = feat.count()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(2, min(int(prev), n_docs // 50_000 + 1))),
    )
    try:
        lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                         numHashTables=num_hash_tables, seed=42)
        model = lsh.fit(feat)
        pairs = model.approxSimilarityJoin(feat, feat, jaccard_max_dist, distCol="dist")
        out = (
            pairs.select(
                F.col("datasetA.id").alias("id_a"),
                F.col("datasetB.id").alias("id_b"),
                (1.0 - F.col("dist")).alias("est_jaccard"),
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out


# --------------------------------------------------------------- simhash
_SIMHASH_BITS = 64


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Vectorized 64-bit simhash over whitespace tokens (numpy)."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.split()
        if not toks:
            continue
        # deterministic 64-bit token hashes (FNV-1a, pure python ints)
        acc = np.zeros(_SIMHASH_BITS, dtype=np.int64)
        for tok in toks:
            h = 0xCBF29CE484222325
            for ch in tok.encode("utf-8"):
                h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
            acc += bits.astype(np.int64) * 2 - 1
        sig = np.packbits((acc > 0).astype(np.uint8))
        out[i] = int.from_bytes(sig.tobytes(), "big", signed=True)
    return pd.Series(out)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) via mapInPandas — Arrow-batched, no per-row Python
    UDF calls across the boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "simhash": _simhash_batch(pdf[text_col])}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema="id long, simhash long")


def simhash_near_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance, banded self-join.

    4 bands of 16 bits: any pair within Hamming ≤ 3 shares at least one
    exact band (pigeonhole), so the join is equi on (band_idx, band
    value) — linear candidate generation, then exact popcount filter."""
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for i in range(4)
            ])
        ).alias("bv"),
    ).select("id", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


# ------------------------------------------------------ embedding cosine
def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95,
    n_planes: int = 0,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold.

    n_planes=0 → exact all-pairs (test scale). n_planes>0 → block by
    random-hyperplane sign bits first (the 100 TB path: near-identical
    vectors share all sign bits with high probability)."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm.alias("nrm"),
    )
    if n_planes > 0:
        dim = len(df.select(vec_col).first()[0])
        rng = np.random.RandomState(42)
        planes = rng.randn(n_planes, dim)
        sig = None
        for p in range(n_planes):
            plane = F.array(*[F.lit(float(x)) for x in planes[p]])
            dot = F.aggregate(
                F.zip_with("v", plane, lambda a, b: a * b), F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = (dot > 0).cast("int")
            sig = bit if sig is None else sig * 2 + bit
        base = base.withColumn("bucket", sig)
    else:
        base = base.withColumn("bucket", F.lit(0))
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x,
            ) / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )
