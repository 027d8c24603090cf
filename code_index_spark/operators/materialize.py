"""Graph materialization — vertices/edges tables (SURVEY.md §7.1 step 7;
reference sink analogue: vector_store.py:337-376 delete-then-upsert of
deterministic-id points, re-expressed as partitioned table writes with
deterministic entity ids so overwrites are idempotent).

vertices(entity_id, canonical_name, surface_forms, mention_count)
edges(src_entity, pred, dst_entity, conv_id, turn_idx, weight)

Edge semantics over transcripts: within a turn, every canonicalized
class-mention (entity) links to every non-class object extracted from
the same turn, with pred = that object's category (call/import/data/
function/logic) — the turn is the reference's "file scope" — plus
pairwise co_mention edges between distinct entities of the turn.
Object literals get deterministic ids (xxhash64 of category:text),
exactly the reference's uuid5-of-content discipline.

Scale notes: the only shuffles are (a) the surface→entity broadcast-able
join (distinct surfaces ≪ mentions) and (b) the per-turn self-join,
which is bounded — keys are (conv_id, turn_idx), cardinality per key is
mentions-per-turn (small constant), so no skew blowup at 10^12 turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_entities(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Every class-mention surface → entity_id (component root for linked
    surfaces, own xxhash64 for singletons)."""
    surfaces = (
        triples.filter(F.col("pred") == "class")
        .groupBy(F.col("obj").alias("surface"))
        .agg(F.count("*").alias("mention_count"))
    )
    return surfaces.join(components, "surface", "left").select(
        "surface",
        "mention_count",
        F.coalesce("component", F.xxhash64("surface")).alias("entity_id"),
    )


def build_vertices(entity_map: DataFrame) -> DataFrame:
    """Entity vertices; canonical_name = most-mentioned surface
    (ties broken lexicographically — deterministic)."""
    w = Window.partitionBy("entity_id").orderBy(
        F.desc("mention_count"), F.asc("surface")
    )
    ranked = entity_map.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("entity_id")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("surface"))).alias("canonical_name"),
            F.sort_array(F.collect_set("surface")).alias("surface_forms"),
            F.sum("mention_count").alias("mention_count"),
        )
    )


def build_edges(triples: DataFrame, entity_map: DataFrame) -> DataFrame:
    """Turn-scoped edges: entity→object (pred = object category) and
    entity↔entity co_mention."""
    ent_mentions = (
        triples.filter(F.col("pred") == "class")
        .select("conv_id", "turn_idx", F.col("obj").alias("surface"), "confidence")
        .join(F.broadcast(entity_map.select("surface", "entity_id")), "surface")
        .select("conv_id", "turn_idx", "entity_id", "confidence")
        .dropDuplicates(["conv_id", "turn_idx", "entity_id"])
    )
    objects = (
        triples.filter(F.col("pred") != "class")
        .select(
            "conv_id",
            "turn_idx",
            "pred",
            F.xxhash64(F.concat_ws(":", "pred", "obj")).alias("obj_id"),
            F.col("confidence").alias("obj_conf"),
        )
        .dropDuplicates(["conv_id", "turn_idx", "pred", "obj_id"])
    )
    ent_obj = (
        ent_mentions.join(objects, ["conv_id", "turn_idx"])
        .select(
            F.col("entity_id").alias("src_entity"),
            "pred",
            F.col("obj_id").alias("dst_entity"),
            "conv_id",
            "turn_idx",
            (F.col("confidence") * F.col("obj_conf")).alias("weight"),
        )
    )
    a = ent_mentions.alias("a")
    b = ent_mentions.alias("b")
    co = (
        a.join(b, ["conv_id", "turn_idx"])
        .filter(F.col("a.entity_id") < F.col("b.entity_id"))
        .select(
            F.col("a.entity_id").alias("src_entity"),
            F.lit("co_mention").alias("pred"),
            F.col("b.entity_id").alias("dst_entity"),
            "conv_id",
            "turn_idx",
            (F.col("a.confidence") * F.col("b.confidence")).alias("weight"),
        )
    )
    return ent_obj.unionByName(co)


def object_vertices(triples: DataFrame) -> DataFrame:
    """Literal-object vertices (non-class objects), same vertex schema."""
    return (
        triples.filter(F.col("pred") != "class")
        .groupBy(F.xxhash64(F.concat_ws(":", "pred", "obj")).alias("entity_id"))
        .agg(
            F.min("obj").alias("canonical_name"),
            F.sort_array(F.collect_set("obj")).alias("surface_forms"),
            F.count("*").alias("mention_count"),
        )
    )
