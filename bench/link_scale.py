"""End-to-end entity linking PAST the LSH cutover (round-4 VERDICT #4):
one run at >10⁶ distinct surfaces through the composed at-scale path

    candidate_pairs_lsh (r=3/b=70 AND-OR banding, stop-bucket cap)
      → tfidf_cosine rescore
      → connected_components (star loop — the >10⁶-edge branch)

bench/lsh_recall.py measured the BLOCKING stage in isolation; this
composes all three stages on one input and reports wall, candidate /
pair / edge / component counts, plus an end-to-end cluster-quality
check (planted variant families must land in one component).

Fixture (same discipline as lsh_recall.py): high-entropy base36
md5-token surfaces so unplanted similarity is ~0; every id%3==0 base
gets TWO planted variants (plural / 'es' suffix — a 3-surface family,
3 qualifying pairs) and every id%3==1 base gets a mid-similarity
variant straddling the 0.4 threshold. Sized so the pair graph into CC
exceeds the 10⁶-edge driver-union-find cutover and the distributed
star loop actually runs.

Usage: python bench/link_scale.py [n_base]   (default 1_000_000)
Appends/replaces the '## End-to-end linking past the LSH cutover'
section of BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from code_index_spark.operators.canon import connected_components
    from code_index_spark.operators.link import (
        candidate_pairs_lsh,
        char_ngrams,
        normalize_surface,
        tfidf_cosine,
    )
    from code_index_spark.session import get_spark

    spark = get_spark(
        "link-scale", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
        shuffle_partitions=64,
    )

    def tok(tag):
        return F.lower(F.conv(
            F.substring(F.md5(F.concat(F.lit(tag), F.col("id").cast("string"))), 1, 12),
            16, 36,
        ))

    base = spark.range(n_base).select(
        "id", F.concat_ws("_", tok("a"), tok("b"), tok("c")).alias("surface")
    )
    fam = base.filter(F.col("id") % 3 == 0)
    v1 = fam.select("id", F.concat(F.col("surface"), F.lit("s")).alias("surface"))
    v2 = fam.select("id", F.concat(F.col("surface"), F.lit("es")).alias("surface"))
    mid = base.filter(F.col("id") % 3 == 1).select(
        "id", F.concat_ws("_", tok("a"), tok("b"), tok("z")).alias("surface")
    )
    surfaces = (
        base.select("surface")
        .unionByName(v1.select("surface"))
        .unionByName(v2.select("surface"))
        .unionByName(mid.select("surface"))
        .withColumn("norm", normalize_surface(F.col("surface")))
        .withColumn("grams", char_ngrams(F.col("norm")))
        .localCheckpoint(eager=True)
    )
    n_surf = surfaces.count()
    # planted 3-surface families for the end-to-end quality check
    families = (
        fam.select("id", F.col("surface").alias("s0"))
        .join(v1.select("id", F.col("surface").alias("s1")), "id")
        .join(v2.select("id", F.col("surface").alias("s2")), "id")
        .localCheckpoint(eager=True)
    )
    n_fam = families.count()
    print(f"surfaces={n_surf} planted_families={n_fam}", flush=True)

    out = {"metric": "link_scale_end_to_end", "n_surfaces": n_surf,
           "n_families": n_fam}

    t0 = time.perf_counter()
    cands = candidate_pairs_lsh(surfaces, jaccard_max_dist=0.6)  # production defaults
    cands = cands.localCheckpoint(eager=True)
    out["n_candidates"] = cands.count()
    out["wall_blocking_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps({k: out[k] for k in ("n_candidates", "wall_blocking_sec")}),
          flush=True)

    t0 = time.perf_counter()
    scored = tfidf_cosine(cands, surfaces, n_docs=n_surf)
    linked = scored.filter(F.col("cosine") >= 0.5).select(
        "surface_a", "surface_b"
    ).localCheckpoint(eager=True)
    out["n_linked_pairs"] = linked.count()
    out["wall_rescore_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps({k: out[k] for k in ("n_linked_pairs", "wall_rescore_sec")}),
          flush=True)

    t0 = time.perf_counter()
    comps = connected_components(linked).localCheckpoint(eager=True)
    out["n_labeled_surfaces"] = comps.count()
    out["n_components"] = comps.select("component").distinct().count()
    out["wall_cc_sec"] = round(time.perf_counter() - t0, 1)
    out["cc_path"] = (
        "star_loop" if out["n_linked_pairs"] > 1_000_000 else "driver_union_find"
    )
    print(json.dumps({k: out[k] for k in
                      ("n_labeled_surfaces", "n_components", "wall_cc_sec",
                       "cc_path")}), flush=True)

    # end-to-end quality: all three surfaces of a planted family share
    # one component label
    lab = comps
    joined = (
        families
        .join(lab.withColumnRenamed("surface", "s0")
              .withColumnRenamed("component", "c0"), "s0", "left")
        .join(lab.withColumnRenamed("surface", "s1")
              .withColumnRenamed("component", "c1"), "s1", "left")
        .join(lab.withColumnRenamed("surface", "s2")
              .withColumnRenamed("component", "c2"), "s2", "left")
    )
    ok = joined.filter(
        (F.col("c0") == F.col("c1")) & (F.col("c1") == F.col("c2"))
    ).count()
    out["family_cluster_rate"] = round(ok / max(n_fam, 1), 4)
    out["wall_total_sec"] = round(
        out["wall_blocking_sec"] + out["wall_rescore_sec"] + out["wall_cc_sec"], 1)
    print(json.dumps(out), flush=True)

    section = (
        "## End-to-end linking past the LSH cutover "
        f"({n_surf} surfaces, local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}])\n\n"
        "The three at-scale stages COMPOSED on one >10⁶-surface input "
        "(bench/link_scale.py; bench/lsh_recall.py measured blocking in "
        "isolation). Production settings throughout: r=3/b=70 AND-OR "
        "banding sized by bands_for_recall(0.4, 1%), stop-bucket cap "
        "1000, cosine ≥ 0.5, CC via the "
        f"{'distributed star loop' if out['cc_path'] == 'star_loop' else 'driver union-find'} "
        f"({out['n_linked_pairs']} edges vs the 10⁶ cutover).\n\n"
        "| stage | wall (s) | output |\n|---|---|---|\n"
        f"| candidate_pairs_lsh | {out['wall_blocking_sec']} | "
        f"{out['n_candidates']} candidates |\n"
        f"| tfidf_cosine ≥ 0.5 | {out['wall_rescore_sec']} | "
        f"{out['n_linked_pairs']} linked pairs |\n"
        f"| connected_components ({out['cc_path']}) | {out['wall_cc_sec']} | "
        f"{out['n_labeled_surfaces']} labeled surfaces, "
        f"{out['n_components']} components |\n"
        f"| **total** | **{out['wall_total_sec']}** | |\n\n"
        f"End-to-end cluster quality: {out['family_cluster_rate']:.2%} of "
        f"{n_fam} planted 3-surface variant families resolve to a single "
        "component (blocking recall × rescore acceptance × CC, composed "
        "— not a per-stage proxy).\n"
    )
    from bench.scaling import _update_bench_md

    _update_bench_md(ROOT, None, section)


if __name__ == "__main__":
    main()
