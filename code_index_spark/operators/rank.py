"""Search / ranking path (SURVEY.md §3.2): filter → boost-weight
re-rank → stable top-k → split-part reassembly.

Reference semantics re-expressed:
  W1 adjusted = score × filetype_w × path_w (vector_store.py:289-321)
     → confidence × pred_weight × role_weight via broadcast weight dims;
  W2 stable sort desc (adjustedScore, score) then limit k
     (vector_store.py:521-528) → orderBy + limit (TakeOrderedAndProject);
  J4 split reassembly: group by parent, order by split_index, concat,
     max score (search_service.py:89-147) → groupBy + sort_array of
     structs + aggregate concat. Pure Catalyst, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# default boost dimensions (the analogue of config weight maps)
PRED_WEIGHTS = {
    "class": 1.5, "function": 1.3, "call": 1.2,
    "import": 1.0, "data": 0.8, "logic": 0.9,
}
ROLE_WEIGHTS = {"assistant": 1.2, "user": 1.1, "tool": 0.9, "system": 0.8}


def _weight_expr(col, table: dict[str, float], default: float = 1.0):
    expr = F.lit(default)
    for k, v in table.items():
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr


def search_triples(
    triples: DataFrame,
    transcripts: DataFrame,
    query_substr: str,
    k: int = 10,
    min_score: float = 0.0,
) -> DataFrame:
    """Substring search over triple objects with boosted ranking."""
    hits = triples.filter(F.col("obj").contains(query_substr))
    with_role = hits.join(
        transcripts.select("conv_id", "turn_idx", "role"), ["conv_id", "turn_idx"]
    )
    scored = with_role.withColumn(
        "adjusted_score",
        F.round(
            F.col("confidence")
            * _weight_expr(F.col("pred"), PRED_WEIGHTS)
            * _weight_expr(F.col("role"), ROLE_WEIGHTS),
            6,
        ),
    ).filter(F.col("adjusted_score") >= min_score)
    return (
        scored.select("conv_id", "turn_idx", "pred", "obj", "adjusted_score")
        .orderBy(F.desc("adjusted_score"), F.asc("conv_id"), F.asc("turn_idx"),
                 F.asc("obj"))
        .limit(k)
    )


def search_segments(
    segments: DataFrame,
    transcripts: DataFrame,
    query_substr: str,
    k: int = 10,
) -> DataFrame:
    """Segment-level search hits with role-boosted scores (the reference
    searches chunks, search_service.py:89-147; score here = role weight
    × an exact-phrase prior, deterministic and data-independent)."""
    hits = segments.filter(F.col("content").contains(query_substr))
    with_role = hits.join(
        transcripts.select("conv_id", "turn_idx", "role"), ["conv_id", "turn_idx"]
    )
    return with_role.withColumn(
        "adjusted_score",
        F.round(
            _weight_expr(F.col("role"), ROLE_WEIGHTS)
            # primary text segments (generic chunks, prose paragraphs)
            # score full weight; typed/fallback segments are discounted
            * F.when(
                F.col("seg_type").isin("chunk", "paragraph"), F.lit(1.0)
            ).otherwise(F.lit(0.9)),
            6,
        ),
    )


def reassemble_hits(hits: DataFrame, k: int = 10) -> DataFrame:
    """J4 with score carry: split-part hits re-join in split_index order
    and the reassembled row keeps max(adjusted_score) over its parts —
    the reference's merge rule (search_service.py:120-135). Unsplit hits
    pass through unchanged; stable top-k at the end."""
    split = hits.filter(F.col("parent_block_id").isNotNull())
    merged = (
        split.groupBy("conv_id", "turn_idx", "parent_block_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("split_index", "content"))
                    ),
                    lambda s: s["content"],
                ),
            ).alias("content"),
            F.max("adjusted_score").alias("adjusted_score"),
            F.count("*").alias("n_parts"),
        )
    )
    whole = hits.filter(F.col("parent_block_id").isNull()).select(
        "conv_id", "turn_idx",
        F.col("segment_hash").alias("parent_block_id"),
        "content", "adjusted_score", F.lit(1).cast("long").alias("n_parts"),
    )
    return (
        merged.unionByName(whole)
        .orderBy(
            F.desc("adjusted_score"), F.asc("conv_id"), F.asc("turn_idx"),
            F.asc("parent_block_id"),
        )
        .limit(k)
    )


def reassemble_splits(segments: DataFrame) -> DataFrame:
    """Re-join split segment parts in split_index order (J4).

    sort_array(collect_list(struct(split_index, content))) keeps the
    aggregation single-pass and order-correct without a window."""
    split = segments.filter(F.col("parent_block_id").isNotNull())
    return (
        split.groupBy("conv_id", "turn_idx", "parent_block_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("split_index", "content"))
                    ),
                    lambda s: s["content"],
                ),
            ).alias("content"),
            F.max("split_total").alias("n_parts"),
        )
    )
