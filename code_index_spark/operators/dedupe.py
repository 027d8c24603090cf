"""Deduplication operators for large-scale corpus pipelines.

Five strategies, each a DataFrame-in/DataFrame-out operator over a
(id, text) or (id, embedding) table:

  exact            — hash-groupBy on md5(text); zero false positives
  ngram_jaccard    — exact n-gram Jaccard pairs via explode + hash join
  minhash_lsh      — md5-60bit minhash banding, pure Catalyst (the
                     100 TB path: candidate pairs only, never O(n²))
  simhash          — 60-bit simhash, pure Catalyst (md5 token hashes) +
                     Hamming-band self-join with radius-derived bands
  embedding_cosine — near-dup pairs by embedding cosine: exact via a
                     triangle-distributed self-join, or blocked by
                     hyperplane / coordinate-sign buckets

Scale notes: every strategy dedupes/aggregates *before* any pairwise
work; the only cross joins are within LSH/band buckets, whose size is
bounded by construction. AQE skew-join handles hot buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.spread import spread_narrow_scan


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


# ------------------------------------------- cross-doc duplicated windows
def duplicated_window_stats(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """Per-doc duplicated-PASSAGE statistics — the exact-substring-dedup
    signal of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better") at word-window granularity, the filter
    RefinedWeb/Dolma apply alongside whole-doc dedup:

      n_windows      — sliding `window`-word shingle positions
      n_dup_windows  — positions whose shingle also occurs in ANOTHER
                       doc (cross-doc; intra-doc repeats alone don't
                       count — that's textstats.repetition_features)
      dup_window_frac— n_dup_windows / n_windows (0.0 when no windows)

    Scale shape — the TEXT is scanned exactly once: positions collapse
    to (doc, window-hash, n_pos) in a map-side partial agg, the
    cross-doc document count is a window function over the hash
    partition on that collapsed table (one exchange of 8-byte hash60
    longs — never text; collisions across a corpus' window universe
    are ~1e-12 at 60 bits, the decontam argument; the DuckDB oracle
    joins raw window strings — same counts), and n_windows per doc
    falls out of the SAME aggregation as sum(n_pos), so no second
    text scan is needed. (A first formulation derived the duplicated
    set by self-join; column pruning de-canonicalized the shared
    subtree, Catalyst could not reuse the exchange, and the corpus
    explode ran twice — 6 scans in the physical plan.) The only other
    input touch is a column-pruned id scan resurrecting docs too short
    to emit windows (frac 0.0).

    Reference parity: code-index dedupes at whole-chunk granularity
    via point-id hashing (vector_store.py:203-210); passage-level
    duplication is the corpus-scale refinement."""
    from ..functions.textfns import hash60

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(
        F.size(words)
    )
    n_win = F.greatest(n_words - (window - 1), F.lit(0))
    # sequence(1, 0) DESCENDS in Spark ([1, 0]) — guard the no-window
    # case or short docs emit bogus partial windows
    wins = F.when(
        n_win > 0,
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda i: hash60(F.concat_ws(" ", F.slice(words, i, window))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    pos = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(wins).alias("gh"))
        .groupBy("doc_id", "gh")
        .agg(F.count("*").alias("n_pos"))
    )
    marked = pos.withColumn(
        "n_docs_with", F.count("*").over(Window.partitionBy("gh"))
    )
    stats = marked.groupBy("doc_id").agg(
        F.sum("n_pos").cast("int").alias("n_windows"),
        F.sum(
            F.when(F.col("n_docs_with") >= 2, F.col("n_pos")).otherwise(0)
        ).cast("long").alias("n_dup_windows"),
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0).cast("long"))
             .alias("n_dup_windows"),
            F.round(
                F.when(F.coalesce(F.col("n_windows"), F.lit(0)) > 0,
                       F.coalesce(F.col("n_dup_windows"), F.lit(0))
                       / F.col("n_windows"))
                .otherwise(F.lit(0.0)), 6,
            ).alias("dup_window_frac"),
        )
    )


def cross_source_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    window: int = 8,
) -> DataFrame:
    """Pairwise content overlap between corpus slices (sources,
    snapshots, shards): for every ordered pair of groups (a, b),
    how many of a's DISTINCT `window`-word shingles also occur in b —
    the measurement a pipeline owner reads before mixing sources
    (duplicate mass between crawls) or after (did decontamination
    actually disjoint train from eval). Returns

      source_a, source_b — ordered pair, a ≠ b, every pair present
                           (zero-overlap pairs included)
      n_windows_a        — |distinct shingles of a|
      n_shared           — |shingles of a ∩ shingles of b|
      containment        — n_shared / n_windows_a (0.0 if a is empty)

    Scale shape: the text is scanned once into distinct (group,
    hash60) longs — corpus-sized but 2 longs wide; the intersection is
    an equi-join on the hash whose output is bounded by shared mass ×
    group pairs, and the result is groups² rows. The group universe is
    assumed small (sources, not docs) — the final all-pairs frame is a
    broadcast cross join of two group-count tables.

    Reference parity: code-index reports per-collection stats only
    (collections list, vector_store.py catalog); cross-slice overlap
    is the corpus-scale generalization."""
    from ..functions.textfns import hash60

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(
        F.size(words)
    )
    n_win = F.greatest(n_words - (window - 1), F.lit(0))
    wins = F.when(
        n_win > 0,
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda i: hash60(F.concat_ws(" ", F.slice(words, i, window))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    gw = (
        df.select(F.col(group_col).alias("src"), F.explode(wins).alias("gh"))
        .distinct()
    )
    counts = gw.groupBy("src").agg(F.count("*").alias("n_windows"))
    groups = df.select(F.col(group_col).alias("src")).distinct()
    shared = (
        gw.alias("a")
        .join(gw.alias("b"), "gh")
        .filter(F.col("a.src") != F.col("b.src"))
        .groupBy(F.col("a.src").alias("source_a"),
                 F.col("b.src").alias("source_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    pairs = (
        groups.select(F.col("src").alias("source_a"))
        .crossJoin(groups.select(F.col("src").alias("source_b")))
        .filter(F.col("source_a") != F.col("source_b"))
    )
    return (
        pairs.join(shared, ["source_a", "source_b"], "left")
        .join(F.broadcast(counts.withColumnRenamed("src", "source_a")
                          .withColumnRenamed("n_windows", "n_windows_a")),
              "source_a", "left")
        .select(
            "source_a", "source_b",
            F.coalesce(F.col("n_windows_a"), F.lit(0)).cast("long")
             .alias("n_windows_a"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long")
             .alias("n_shared"),
            F.round(
                F.when(F.coalesce(F.col("n_windows_a"), F.lit(0)) > 0,
                       F.coalesce(F.col("n_shared"), F.lit(0))
                       / F.col("n_windows_a"))
                .otherwise(F.lit(0.0)), 6,
            ).alias("containment"),
        )
    )


def remove_duplicated_passages(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """Exact duplicated-passage REMOVAL — the actual edit step of Lee
    et al. 2021 exact-substring dedup (duplicated_window_stats is the
    signal; this cuts the text). Rule: a `window`-word shingle that
    occurs more than once in the corpus (any doc, intra-doc repeats
    included) keeps exactly its FIRST occurrence — min (doc_id,
    position) lexicographically — and every other occurrence's token
    span is deleted; overlapping deleted spans merge at the token
    level. Returns per doc:

      n_tokens     — whitespace token count of the input
      n_removed    — tokens deleted (distinct covered positions)
      removed_frac — n_removed / n_tokens (0.0 for empty docs)
      cleaned_text — surviving tokens joined by single spaces (the
                     whitespace-normalized form; '' when everything
                     was duplicated elsewhere first)

    Scale shape: the text is scanned once into (doc, pos, hash60)
    long-triples; the first-owner election is a map-side-combinable
    min(struct(doc, pos)) + count per hash (one exchange of longs),
    the owner join is hash-keyed, and coverage explodes only the
    REMOVED windows (bounded by the duplication volume, not the
    corpus). The final token filter is per-row codegen over the doc's
    own words array — the corpus text itself never shuffles. The
    DuckDB oracle joins raw window strings where the engine joins
    hash60 longs (the decontam collision argument: ~1e-12 at corpus
    window universes).

    Reference parity: code-index dedupes whole chunks by point-id
    hash (vector_store.py:203-210); passage-level cutting is the
    corpus-scale refinement RefinedWeb/Dolma apply."""
    from ..functions.textfns import hash60

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(
        F.size(words)
    )
    n_win = F.greatest(n_words - (window - 1), F.lit(0))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        words.alias("words"),
        n_words.alias("n_tokens"),
        n_win.alias("n_win"),
    )
    # (doc, 1-based position, window hash): posexplode is 0-based
    pos = (
        base.filter(F.col("n_win") > 0)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_win")),
                    lambda i: hash60(
                        F.concat_ws(" ", F.slice(F.col("words"), i, window))
                    ),
                )
            ).alias("p0", "gh"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("p"), "gh")
    )
    own = pos.groupBy("gh").agg(
        F.count("*").alias("n_occ"),
        F.min(F.struct("doc_id", "p")).alias("o"),
    )
    rem = (
        pos.join(own, "gh")
        .filter(
            (F.col("n_occ") >= 2)
            & ~((F.col("doc_id") == F.col("o.doc_id"))
                & (F.col("p") == F.col("o.p")))
        )
        .select("doc_id", "p")
    )
    cov = (
        rem.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + (window - 1))
            ).alias("ti"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("ti").alias("covered"))
    )
    joined = base.join(cov, "doc_id", "left").withColumn(
        "covered", F.coalesce(F.col("covered"), F.array().cast("array<int>"))
    )
    # kept positions via ONE hash-set difference (round-6 de-quadratic,
    # VERDICT #2): the previous per-token array_contains(covered, i)
    # made the cleanup O(n_tokens × n_removed) per doc — ~10¹⁰
    # comparisons for one heavily-duplicated 100k-token doc, the exact
    # doc shape this operator targets. array_except builds a hash set
    # over `covered` once, so this is O(n_tokens + n_removed); it
    # preserves the first array's order, so surviving tokens stay in
    # position order and the joined text is unchanged.
    kept_pos = F.array_except(
        F.sequence(F.lit(1), F.greatest(F.col("n_tokens"), F.lit(1))),
        F.col("covered"),
    )
    kept = F.transform(kept_pos, lambda p: F.element_at(F.col("words"), p))
    return joined.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.size("covered").cast("int").alias("n_removed"),
        F.round(
            F.when(F.col("n_tokens") > 0,
                   F.size("covered") / F.col("n_tokens"))
            .otherwise(F.lit(0.0)), 6,
        ).alias("removed_frac"),
        F.when(F.col("n_tokens") == 0, F.lit("")).otherwise(
            F.array_join(kept, " ")
        ).alias("cleaned_text"),
    )


# ----------------------------------------------------------- minhash-lsh
def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, grams) with the narrow-input spread applied BEFORE the gram
    transform: a single small parquet file arrives as one partition,
    and any per-row work downstream of it (gram building, signature
    hashing) would serialize on one core — repartition the cheap
    (id, text) projection first so the O(words²) gram build and the md5
    signatures run at session width. Inputs already wider than the core
    count (any real corpus) skip the shuffle.

    NULL/whitespace-only texts gram to the single '' shingle, so they
    mutually pair at jaccard 1.0 — intentional (they ARE near-identical,
    and the DuckDB oracles derive the same grams), but a crawl corpus
    with MANY empty docs puts them all in one band bucket (the
    constant-gram clique hazard, CLAUDE.md): the max_bucket stop-bucket
    cap is the lever, and the quality stage rejects such docs upstream
    in the composed pipelines."""
    # drop null texts HERE, below the spread: word_ngrams yields >= 1
    # gram for every NON-null text (sequence(1, greatest(k, 1)) floors
    # the index range), so the old `size(grams) > 0` filter was exactly
    # a null-text guard — but written on the computed column it was
    # pushed below the spread exchange and RE-RAN the whole O(words)
    # gram build on the narrow (often single-task) scan side, doubling
    # the gram work and serializing it (measured: 4.4s -> 0.6s for the
    # sf0.1 shingle stage). The isnotnull form pushes into the parquet
    # scan for free.
    base = spread_narrow_scan(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    )
    return base.select("id", word_ngrams(F.col("text"), n).alias("grams"))


def minhash_band_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hash_tables: int = 8,
    shingled: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """The blocking stage alone: (id_a, id_b) pairs whose md5-60bit
    minhash signatures collide in >=1 of `num_hash_tables` bands — pure
    Catalyst (functions.minhash), fully DuckDB-oracle-able, candidate
    volume linear in bucket sizes.

    max_bucket = stop-bucket removal (band_collision_pairs): a corpus
    with a B-doc boilerplate clique — short templated docs sharing a
    constant gram — puts ~B/2 docs in one bucket PER BAND whenever the
    shared gram wins the min (probability ≈ 1/#grams for short docs),
    and the collision join then emits O(B²) pairs per band. Measured:
    a planted 10k-doc clique at 100k docs ⇒ 150.8M candidate pairs
    from 9 OR-bands (~5.4B at 600k — an OOM, not a slowdown). The cap
    bounds every bucket; pairs it drops are overwhelmingly LOW-jaccard
    (clique members share one gram of several, j ≈ 1/(2·#grams−1)), so
    the verified output at production thresholds is unchanged while
    candidate volume returns to linear (tests/test_dedupe.py planted-
    clique test). None = no cap — exact semantics for the oracle path."""
    from ..functions.minhash import band_collision_pairs, minhash_bands

    if shingled is None:
        shingled = _shingled(df, id_col, text_col, n)
    return band_collision_pairs(
        minhash_bands(shingled, "id", "grams", num_hash_tables),
        max_bucket=max_bucket,
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    jaccard_max_dist: float = 0.3,
    num_hash_tables: int | None = None,
    target_miss: float = 1e-6,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash candidate near-dup pairs (shingle → k min-hashes → band
    collision join → exact-Jaccard rescore of candidates only).

    Rewritten pure-Catalyst in round 3 (was Spark ML HashingTF +
    MinHashLSH.approxSimilarityJoin): signatures are md5-60bit min-hashes
    computed as per-row array transforms, banding is one equi-join on
    (band, h), and the distance filter is EXACT Jaccard over the raw
    shingle sets (array_intersect on the candidate pairs only) instead
    of Jaccard over hashed feature vectors. Faster (no ML fit, no
    vector UDF join, whole plan stays in codegen), deterministic with
    no feature-hash collision layer, and the whole candidate stage now
    replicates bit-for-bit in the DuckDB oracle.

    `num_hash_tables` defaults to tables_for_recall(1-jaccard_max_dist,
    target_miss): the miss probability for a pair at the threshold
    similarity is (1-s)^k, so k is sized to the recall target instead
    of guessed. Pair generation stays linear in bucket sizes — the
    100 TB contract is unchanged."""
    from ..functions.minhash import tables_for_recall

    if num_hash_tables is None:
        num_hash_tables = tables_for_recall(1.0 - jaccard_max_dist, target_miss)
    # one shingling pass shared by the banding and both rescore sides
    # (localCheckpoint: the rescore self-joins the gram table, and the
    # checkpoint truncates the re-analysis + recompute of the upstream
    # scan three times over — the CLAUDE.md persist-vs-plan lesson)
    grams = _shingled(df, id_col, text_col, n).localCheckpoint(eager=True)
    cands = minhash_band_candidates(
        df, id_col, text_col, n, num_hash_tables, shingled=grams,
        max_bucket=max_bucket,
    )
    # MERGE hint on the gram sides (round 6): left to AQE the rescore
    # broadcasts the whole gram-array table twice (it fits the session's
    # 64 MB estimate at bench scale) — two serial driver-built hashed
    # relations of wide array rows, measured 3.2-6.5s at sf0.1 vs
    # ~0.8-1.1s for either shuffled join. Between the shuffled
    # strategies, sort-merge is the one that survives corpus scale: a
    # shuffled-hash build side holding a partition's gram ARRAYS cannot
    # spill and was observed to OOM at 2M surfaces on the link path
    # ("Can't acquire ... to build hash relation"), while SMJ sorts on
    # the long id cheaply and spills gracefully; at sf0.1 the two
    # measured within noise (0.77-0.93s vs 0.83-1.08s).
    a = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("ga")).hint("merge")
    b = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("gb")).hint("merge")
    inter = F.size(F.array_intersect("ga", "gb"))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", inter / (F.size("ga") + F.size("gb") - inter))
        .filter(F.col("jaccard") >= 1.0 - jaccard_max_dist)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hash_tables: int | None = None,
    target_miss: float = 1e-6,
    max_bucket: int | None = None,
) -> DataFrame:
    """The production near-dup shape: minhash *blocking* + exact n-gram
    Jaccard *rescoring* of candidates only.

    max_bucket caps band-bucket size (stop-bucket removal) — REQUIRED
    at crawl scale where boilerplate cliques exist; see
    minhash_band_candidates for the measured flood it prevents. The
    oracle-checked driver row runs uncapped (exact semantics).

    Output is (id_a, id_b, jaccard) with jaccard computed over the raw
    shingle sets — i.e. exactly what ngram_jaccard_pairs returns, but
    reached via candidate generation that is linear in bucket sizes
    instead of an all-shingle explode-join. With the default recall
    sizing (target_miss=1e-6 at s=0.8 ⇒ 9 tables) a true pair at the
    threshold is missed with probability ≤ 1e-6, so the result
    hash-matches the exact DuckDB oracle — the driver's CORRECTNESS row
    *is* the recall proof."""
    return minhash_lsh_pairs(
        df, id_col, text_col, n,
        jaccard_max_dist=1.0 - threshold,
        num_hash_tables=num_hash_tables,
        target_miss=target_miss,
        max_bucket=max_bucket,
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate CLUSTER assignment: minhash-verified pairs →
    connected components → engine-portable labels. Every doc gets
    (doc_id, cluster_id, cluster_size) where cluster_id is the MIN
    doc id in its component (singletons label themselves) — the
    relabeling that makes the transitive-closure output value-
    comparable across engines, unlike the raw xxhash64 component
    labels canon.connected_components uses internally. This is the
    "keep one per cluster" unit real dedup pipelines act on when
    pairwise survivor policies (curate's min-id-per-PAIR) under-merge
    chains A~B~C where A~C itself is below threshold.

    Requires an integral id column (cluster_id = min id needs an
    order; the cast round-trips through the CC surface strings).

    Scale shape: pairs are LSH-blocked (never all-pairs), the
    component graph is DUP-scale not corpus-scale, and CC is
    size-routed (driver union-find ≤10⁶ edges, star loop beyond —
    canon.connected_components). The min-id relabel and size count
    group on component/cluster keys of that same dup-scale table; the
    corpus-sized joins move only (long, long) rows. The DuckDB oracle
    closes the exact-Jaccard pair graph with a recursive CTE — fine at
    oracle scale, the anti-scale shape the star loop replaces."""
    from .canon import connected_components

    pairs = minhash_verified_pairs(
        df, id_col, text_col, n=n, threshold=threshold,
        max_bucket=max_bucket,
    )
    comp = connected_components(
        pairs.select(
            F.col("id_a").cast("string").alias("surface_a"),
            F.col("id_b").cast("string").alias("surface_b"),
        )
    ).select(
        F.col("surface").cast("long").alias("doc_id"), "component"
    )
    relabel = comp.groupBy("component").agg(
        F.min("doc_id").alias("cluster_id")
    )
    member = comp.join(relabel, "component").select("doc_id", "cluster_id")
    ids = df.select(F.col(id_col).cast("long").alias("doc_id"))
    assigned = ids.join(member, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").cast("int").alias("cluster_size")
    )
    return assigned.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


# --------------------------------------------------------------- simhash
# 60 bits (15 hex chars of md5): stays in BIGINT range in every engine
# (ANSI Spark, DuckDB, Java) with no sign games, and 60 has many band
# divisors. The token hash is md5-based so the ENTIRE simhash pipeline
# — signature and pairs — is expressible in both Spark SQL and DuckDB
# from one definition (single-source-of-truth, like rules.py/oracle.py).
SIMHASH_BITS = 60
_SIMHASH_DIVISORS = (1, 2, 3, 4, 5, 6, 10, 12, 15, 20, 30, 60)


def simhash_bands(max_hamming: int) -> tuple[int, int]:
    """(n_bands, band_width) covering the radius: a pair within Hamming
    ≤ max_hamming differs in ≤ max_hamming bands, so with n_bands ≥
    max_hamming + 1 at least one band is equal (pigeonhole)."""
    for nb in _SIMHASH_DIVISORS:
        if nb >= max_hamming + 1:
            return nb, SIMHASH_BITS // nb
    raise ValueError(f"max_hamming {max_hamming} ≥ {SIMHASH_BITS} bits")


def _tok_hash60(col):
    """Deterministic 60-bit token hash, shared with the oracle SQL."""
    from ..functions.textfns import hash60

    return hash60(col)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — pure Catalyst (no Python UDF at all).

    tokens = whitespace split; bit j of the signature is set iff
    Σ_tokens (2·bit_j(h(tok)) − 1) > 0. The per-bit sums are 60 agg
    columns with map-side partial aggregation, so the shuffle moves one
    61-column row per (doc × input-partition), not the tokens.
    Docs with zero tokens produce no signature row."""
    # spread the narrow (id, text) projection before the explode: a
    # single-file scan otherwise runs the token explode, 270k md5+conv
    # hashes AND the 61-column map-side partial aggregation on ONE task
    # (round 6; same CLAUDE.md rule the shingle/BPE stages follow)
    base = spread_narrow_scan(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    )
    toks = (
        base.select(
            "id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("id", _tok_hash60(F.col("tok")).alias("h"))
    )
    sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.shiftright("h", j).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return sums.select("id", sig.alias("simhash"))


def simhash_near_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """ALL pairs within Hamming ≤ max_hamming, banded self-join.

    The band count is derived from the radius (simhash_bands), so the
    pigeonhole recall guarantee holds for any requested max_hamming —
    candidates are generated by equi-join on (band_idx, band_value),
    linear in bucket sizes, then exact popcount-filtered."""
    n_bands, width = simhash_bands(max_hamming)
    mask = (1 << width) - 1
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("simhash", i * width).bitwiseAND(F.lit(mask)).alias("val"),
                )
                for i in range(n_bands)
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
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def simhash_sigs_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """DuckDB CTE body computing exactly simhash() — generated from the
    same constants, so engine and oracle cannot drift."""
    bit_sums = ", ".join(
        f"SUM(((h >> {j}) & 1) * 2 - 1) AS b{j}" for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return (
        f"WITH toks AS (\n"
        f"  SELECT {id_col} AS id, unnest(string_split_regex(trim({text_col}), '\\s+')) AS tok\n"
        f"  FROM {table}\n"
        f"), h AS (\n"
        f"  SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h\n"
        f"  FROM toks WHERE tok <> ''\n"
        f"), bitsums AS (\n"
        f"  SELECT id, {bit_sums} FROM h GROUP BY id\n"
        f"), sigs AS (\n"
        f"  SELECT id, {sig} AS simhash FROM bitsums\n"
        f")"
    )


def simhash_pairs_sql(max_hamming: int, table: str = "documents") -> str:
    """DuckDB oracle: exact all-pairs Hamming ≤ max_hamming over the
    same signatures — the ground truth the banded engine join must
    reproduce completely (recall = 1 by the pigeonhole band bound)."""
    return (
        f"{simhash_sigs_sql(table)}\n"
        f"SELECT a.id AS id_a, b.id AS id_b,\n"
        f"       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming\n"
        f"FROM sigs a JOIN sigs b ON a.id < b.id\n"
        f"WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}\n"
        f"ORDER BY id_a, id_b"
    )


# ------------------------------------------------------ embedding cosine
def _pair_cosine(a_v, b_v, a_nrm, b_nrm):
    return F.aggregate(
        F.zip_with(a_v, b_v, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (a_nrm * b_nrm)


def _vec_base(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm.alias("nrm")
    )


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95,
    n_planes: int = 0, n_blocks: int = 8,
) -> DataFrame:
    """EXACT near-dup pairs by embedding cosine ≥ threshold.

    n_planes=0 → exact all-pairs via a *triangle-distributed* self join:
    vectors hash into n_blocks blocks; every unordered block pair (i ≤ j)
    is one join group, so the O(n²) comparison work spreads over
    n_blocks·(n_blocks+1)/2 parallel tasks instead of a single
    constant-key reducer. Exactness is unchanged — every vector pair
    lands in exactly one (i, j) group. Replication factor is n_blocks+1,
    the standard trade for distributing an all-pairs join.

    n_planes>0 → block by random-hyperplane sign bits first (approximate:
    only intra-bucket pairs are compared — the classic SimHash LSH
    family). For a deterministic, oracle-expressible blocked variant see
    embedding_cosine_pairs_blocked.
    """
    base = _vec_base(df, id_col, vec_col)
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
        a = base.withColumn("bucket", sig).alias("a")
        b = base.withColumn("bucket", sig).alias("b")
        return (
            a.join(b, "bucket")
            .filter(F.col("a.id") < F.col("b.id"))
            .withColumn("cosine", _pair_cosine(
                F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")))
            .filter(F.col("cosine") >= threshold)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
        )
    # triangle-distributed exact all-pairs
    blk = F.pmod(F.xxhash64("id"), F.lit(n_blocks)).cast("int")
    left = base.withColumn("i", blk).withColumn(
        "j", F.explode(F.sequence(F.col("i"), F.lit(n_blocks - 1)))
    ).alias("a")
    right = base.withColumn("j", blk).withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.col("j")))
    ).alias("b")
    return (
        left.join(right, ["i", "j"])
        .filter((F.col("i") < F.col("j")) | (F.col("a.id") < F.col("b.id")))
        .withColumn("cosine", _pair_cosine(
            F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            "cosine",
        )
    )


def _sign_bucket(vec_name: str, sign_coords: int):
    """Packed sign bits of the first `sign_coords` coordinates — the
    zero-float-arithmetic cell id shared by the blocked pair join and
    semantic_dedupe (DuckDB twin: coord_bucket_sql)."""
    bucket = None
    for i in range(sign_coords):
        bit = F.when(
            F.element_at(vec_name, i + 1) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def embedding_cosine_pairs_blocked(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.3,
    sign_coords: int = 6, bucketed: DataFrame | None = None,
) -> DataFrame:
    """APPROXIMATE near-dup pairs: coordinate-sign blocking + exact
    cosine rescore. bucket = packed sign bits of the first `sign_coords`
    coordinates (2^sign_coords buckets); only intra-bucket pairs are
    scored. This is the 100 TB candidate-generation path: linear in
    bucket sizes, never all-pairs — and, unlike random-hyperplane dots,
    the bucket is computed with zero float arithmetic, so a DuckDB
    oracle replicates it bit-for-bit (see entry `embedding_dup_pairs_blocked`).

    `bucketed` = a precomputed (id, v, nrm, bucket) table: semantic_dedupe
    passes its checkpointed base so the vector scan + norm + bucket run
    once for the pair join AND its own per-doc rollup."""
    if bucketed is None:
        bucketed = _vec_base(df, id_col, vec_col).withColumn(
            "bucket", _sign_bucket("v", sign_coords)
        )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", _pair_cosine(
            F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )


def semantic_dedupe(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.3,
    sign_coords: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023:
    cluster embeddings, drop all but one of each within-cluster
    near-identical group): documents whose EMBEDDINGS are near-
    duplicates are pruned even when their text is not — the dedup
    layer text hashing and minhash cannot see. Per doc:

      cell             — the doc's semantic cell (coordinate-sign
                         bucket; the deterministic, oracle-exact
                         stand-in for SemDeDup's k-means cluster — the
                         KMeans cells of simsearch.ivf_cells slot in
                         at scale, trading the value-hash oracle for
                         the pytest recall gate, same trade as ivf_topk)
      n_dup_neighbors  — intra-cell neighbors with cosine ≥ threshold
      is_semantic_dup  — doc has a SMALLER-ID neighbor ≥ threshold, so
                         it is pruned under the min-id survivor policy
                         (the curate.reject_sets convention: exactly
                         one doc of each pairwise-duplicate group
                         chain survives)

    Scale shape: candidate pairs are intra-cell only (linear in cell
    sizes, never all-pairs — the embedding_cosine_pairs_blocked
    argument); the neighbor rollup is a map-side-combinable groupBy on
    8-byte ids. SemDeDup's own policy (keep the doc farthest from the
    centroid) needs float centroid arithmetic that cannot replicate
    across engines; min-id keeps the same dedup rate and stays
    value-hash-oracle-able (driver row `semantic_dedup_docs`).

    Reference parity: code-index dedupes points by deterministic
    chunk-hash ids (vector_store.py:203-210) — identical embeddings
    collapse; this prunes NEAR-identical embeddings too."""
    # ONE vector scan: the bucketed base has THREE consumers (the pair
    # join's a/b sides and the per-doc cell rollup below) and no
    # exchange of its own for plan branches to share — without
    # materialization each branch re-scans the embedding table and
    # re-evaluates norm + sign bucket. localCheckpoint is the repo's
    # shared-intermediate discipline (same shape as the BM25 tf table);
    # the block store holds the narrow (id, v, nrm, bucket) projection,
    # which IS the operator's working set at any scale.
    base = _vec_base(df, id_col, vec_col).withColumn(
        "bucket", _sign_bucket("v", sign_coords)
    ).localCheckpoint(eager=True)
    pairs = embedding_cosine_pairs_blocked(
        df, id_col, vec_col, threshold, sign_coords, bucketed=base
    )
    both = pairs.select(F.col("id_a").alias("id"), F.col("id_b").alias("nb")).union(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb"))
    )
    nstats = both.groupBy("id").agg(
        F.count("*").cast("long").alias("n_dup_neighbors"),
        (F.max(F.when(F.col("nb") < F.col("id"), 1).otherwise(0)) == 1)
         .alias("is_semantic_dup"),
    )
    return (
        base.select("id", F.col("bucket").alias("cell"))
        .join(nstats, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "cell",
            F.coalesce(F.col("n_dup_neighbors"), F.lit(0).cast("long"))
             .alias("n_dup_neighbors"),
            F.coalesce(F.col("is_semantic_dup"), F.lit(False))
             .alias("is_semantic_dup"),
        )
    )


def coord_bucket_sql(vec_expr: str, sign_coords: int = 6) -> str:
    """DuckDB expression for the coordinate-sign bucket — generated from
    the same constants as embedding_cosine_pairs_blocked, zero float
    arithmetic, so oracle buckets are bit-identical to the engine's."""
    return " + ".join(
        f"(CASE WHEN {vec_expr}[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(sign_coords)
    )
