"""Graph ANALYTICS at sf1 scale: triangles, k-hop BFS, neighbor-set
Jaccard, PMI edges over the build_edges_agg rollup (the four round-5
graphalgo additions have only run on the sf0.01 oracle graph; this is
their scale evidence, the same gap graph_scale.py closed for
degree/pagerank).

Input graph: the ~1.4M-edge weighted rollup at mult x sf0.1 (ent->obj
plus co_mention families — triangle-rich: two co-mentioned entities
sharing an object node close a triangle). PMI consumes the per-turn
entity mention stream (the operator's contract unit).

Usage: python bench/graph_analytics_scale.py [mult]
       python bench/graph_analytics_scale.py --scaling [N]
       python bench/graph_analytics_scale.py --scaling-synth [N] [n_edges]

Main mode builds the rollup once, SNAPSHOTS edges + mentions to
/tmp/graft_graph_analytics/ parquet, runs each analytic with walls, and
rewrites the '## Graph analytics (triangles/k-hop/jaccard/PMI) at
scale' BENCH.md section. --scaling re-runs the two shuffle-heavy
analytics (triangles + capped jaccard) from the SAME parquet snapshot
in fresh JVMs at N and 4N cores (prepare_scale discipline: shuffle
width data-sized and EQUAL across levels) for the north rule's
two-parallelism evidence, rewriting the '... scaling (N vs 4N)'
section.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SNAP = "/tmp/graft_graph_analytics"

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[4])
from pyspark.sql import functions as F
from code_index_spark.session import get_spark
from code_index_spark.operators.graphalgo import (
    neighbor_jaccard_pairs, triangle_counts)

cores = int(sys.argv[1]); src = sys.argv[2]; trials = int(sys.argv[3])
spark = get_spark(f"ga{cores}", cores=cores, shuffle_partitions=64)
if src.startswith("synth:"):
    # deterministic hash-random graph, identical at every level:
    # n_edges edges over n_edges/16 vertices (avg degree ~32) — big
    # enough that the wedge joins are data-bound, not scheduling-bound
    n = int(src.split(":")[1])
    nv = max(n // 16, 1)
    edges = (
        spark.range(n)
        .select(
            (F.abs(F.xxhash64("id", F.lit(1))) % nv).alias("src_entity"),
            (F.abs(F.xxhash64("id", F.lit(2))) % nv).alias("dst_entity"),
        )
        .filter(F.col("src_entity") != F.col("dst_entity"))
        .repartition(64)
        .localCheckpoint(eager=True)
    )
else:
    edges = spark.read.parquet(src + "/edges").localCheckpoint(eager=True)
# count the DISTINCT canonical pair set the operators actually join
# (r5 ADVICE #3: the raw count includes duplicate (src, dst) hash
# collisions that the operators' internal .distinct() removes)
n_edges = (edges.select(F.least("src_entity", "dst_entity"),
                        F.greatest("src_entity", "dst_entity"))
           .distinct().count())

def run():
    t = triangle_counts(edges).agg(
        F.count("*"), F.sum("n_triangles")).collect()
    j = neighbor_jaccard_pairs(edges, min_sim=0.02, hub_cap=64).count()
    return t, j

run()  # warm
walls = []
for _ in range(trials):
    t0 = time.perf_counter()
    run()
    walls.append(time.perf_counter() - t0)
walls.sort()
print(json.dumps({"cores": cores, "n_edges": n_edges,
                  "median_wall": round(walls[len(walls) // 2], 1),
                  "walls": [round(w, 1) for w in walls]}))
"""


def _run_level(cores: int, src: str, trials: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cores), src, str(trials), ROOT],
        capture_output=True, text=True, cwd=ROOT, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _scaling(n_lo: int, synth_edges: int | None, trials: int = 3) -> None:
    if synth_edges is None and not os.path.isdir(SNAP + "/edges"):
        raise SystemExit("run the main mode first to snapshot the graph")
    src = f"synth:{synth_edges}" if synth_edges else SNAP
    n_hi = n_lo * 4
    lo = _run_level(n_lo, src, trials)
    hi = _run_level(n_hi, src, trials)
    eff = round(lo["median_wall"] / hi["median_wall"] / 4, 3)
    out = {"metric": "graph_analytics_scaling", "src": src,
           "n_edges": lo["n_edges"], "lo": lo, "hi": hi,
           "efficiency": eff}
    print(json.dumps(out), flush=True)
    if synth_edges:
        intro = (
            f"({lo['n_edges']} edges of a deterministic hash-random graph "
            f"(avg degree ~32), bench/graph_analytics_scale.py "
            f"--scaling-synth: fresh JVM per level, warmed, median of "
            f"{trials}, shuffle width data-sized and equal across levels.) "
            "The data-bound case: a graph big enough that the wedge "
            "joins dominate scheduling overhead."
        )
        title = ("## Graph analytics scaling, data-bound "
                 "(script run, N vs 4N)\n\n")
    else:
        intro = (
            f"({lo['n_edges']} rollup edges, bench/graph_analytics_scale.py"
            f" --scaling: fresh JVM per level, warmed, median of {trials}.)"
            " The VOCAB-SCALE case: the rollup graph is ~tens of MB, so at"
            " 4N cores the pass is scheduling-bound, not data-bound — the"
            " same 'size the iteration to the data' regime as the CC/LSH"
            " loops (header notes). Low efficiency here is the EXPECTED"
            " reading: the corpus-scale stages that feed the rollup carry"
            " the scaling burden (0.8+ in their own sections), and the"
            " analytics' absolute walls are already small. The data-bound"
            " twin below shows the same operators scale when the input is"
            " actually large."
        )
        title = "## Graph analytics scaling, vocab-scale graph (N vs 4N)\n\n"
    section = (
        title + intro + "\n\n"
        "Combined triangles + capped neighbor-Jaccard pass — the two "
        "wedge-join-bound analytics, i.e. the shuffle-heavy pair.\n\n"
        "| parallelism | wall (s, median) | all trials |\n|---|---|---|\n"
        f"| local[{n_lo}] | {lo['median_wall']} | {lo['walls']} |\n"
        f"| local[{n_hi}] | {hi['median_wall']} | {hi['walls']} |\n\n"
        f"**Scaling efficiency {n_lo}→{n_hi}: {eff}** "
        "(hypervisor-steal caveats as in the header section).\n"
    )
    from bench.scaling import _update_bench_md

    _update_bench_md(ROOT, None, section)


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    mult = int(pos[0]) if pos else 10
    if "--scaling-synth" in sys.argv:
        idx = sys.argv.index("--scaling-synth")
        rest = [a for a in sys.argv[idx + 1:] if a.isdigit()]
        n_lo = int(rest[0]) if rest else 8
        n_edges = int(rest[1]) if len(rest) > 1 else 8_000_000
        _scaling(n_lo, n_edges)
        return
    if "--scaling" in sys.argv:
        idx = sys.argv.index("--scaling")
        n_lo = (int(sys.argv[idx + 1])
                if idx + 1 < len(sys.argv) and sys.argv[idx + 1].isdigit()
                else 8)
        _scaling(n_lo, None)
        return

    import shutil

    from pyspark.sql import functions as F

    from code_index_spark.operators.canon import connected_components
    from code_index_spark.operators.extract import extract_triples_sql
    from code_index_spark.operators.graphalgo import (
        khop_neighbors,
        neighbor_jaccard_pairs,
        pmi_edges,
        triangle_counts,
    )
    from code_index_spark.operators.link import link_mentions, mention_surfaces
    from code_index_spark.operators.materialize import (
        assign_entities,
        build_edges_agg,
    )
    from code_index_spark.session import get_spark
    from code_index_spark.sources.tpch import derived_transcripts

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    width = max(16 * mult, cores * 2)
    spark = get_spark("graph-analytics-scale", cores=cores,
                      shuffle_partitions=width)

    t = derived_transcripts(spark, "/root/testdata/sf0.1")
    if mult > 1:
        t = (
            spark.range(mult).crossJoin(t)
            .withColumn("conv_id", F.concat_ws("-", "conv_id", F.col("id")))
            .drop("id")
        )
    t = t.repartition(width, "conv_id").persist()
    t.count()
    triples = extract_triples_sql(t).persist()
    n_triples = triples.count()

    surfaces = mention_surfaces(triples).localCheckpoint(eager=True)
    pairs = link_mentions(triples, surfaces=surfaces)
    comps = connected_components(pairs).localCheckpoint(eager=True)
    em = assign_entities(triples, comps, surfaces=surfaces).localCheckpoint(
        eager=True
    )
    edges = build_edges_agg(triples, em).localCheckpoint(eager=True)
    n_edges = edges.count()
    # per-turn ENTITY mention stream (pmi_edges' contract unit)
    mentions = (
        triples.filter(F.col("pred") == "class")
        .join(em.select(F.col("surface").alias("obj"), "entity_id"), "obj")
        .select("conv_id", "turn_idx", F.col("entity_id").alias("norm"))
        .localCheckpoint(eager=True)
    )
    n_mentions = mentions.count()

    shutil.rmtree(SNAP, ignore_errors=True)
    edges.write.parquet(SNAP + "/edges")
    mentions.write.parquet(SNAP + "/mentions")

    out = {"metric": "graph_analytics_scale", "mult": mult,
           "n_triples": n_triples, "n_edges": n_edges,
           "n_mentions": n_mentions}

    t0 = time.perf_counter()
    tri = triangle_counts(edges)
    agg = tri.agg(F.count("*").alias("nv"),
                  F.sum("n_triangles").alias("corners")).first()
    out["tri_vertices"] = agg["nv"]
    # every triangle contributes 3 corners
    out["n_triangles"] = int(agg["corners"]) // 3
    out["wall_triangles_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

    # min_sim 0.02, not the registry query's 0.5: this graph's
    # neighborhoods are synthetic-dense (~41k-vertex component, large
    # degrees), so max observed Jaccard is ~0.04 — the bench threshold
    # is chosen to produce non-trivial output volume through the SAME
    # wedge-join shape; the cap sweep shows the stop-bucket lever.
    t0 = time.perf_counter()
    out["jaccard_pairs_cap64"] = neighbor_jaccard_pairs(
        edges, min_sim=0.02, hub_cap=64).count()
    out["wall_jaccard_cap64_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    out["jaccard_pairs_cap256"] = neighbor_jaccard_pairs(
        edges, min_sim=0.02, hub_cap=256).count()
    out["wall_jaccard_cap256_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    seeds = (
        edges.select(F.col("src_entity").alias("seed"))
        .union(edges.select(F.col("dst_entity").alias("seed")))
        .distinct().orderBy("seed").limit(100)
    )
    kh = khop_neighbors(edges, seeds, k=3)
    out["khop_rows"] = kh.count()
    out["wall_khop_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    pm = pmi_edges(mentions)
    out["pmi_edges"] = pm.count()
    out["wall_pmi_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

    section = (
        "## Graph analytics (triangles/k-hop/jaccard/PMI) at scale\n\n"
        f"(bench/graph_analytics_scale.py, {n_triples} triples ≈ "
        f"sf{mult / 10:.0f}, {n_edges} rollup edges, {n_mentions} "
        f"entity mentions, local[{cores}].) The four round-5 graphalgo "
        "operators over the SAME build_edges_agg rollup as the "
        "degree/pagerank table above. Triangles and Jaccard are "
        "wedge-join-bound: triangles orient every edge low-degree-first "
        "(fanout bounded by arboricity, not hub degree); Jaccard uses "
        "the hub_cap stop-bucket lever — the cap sweep below shows the "
        "cost/recall trade explicitly. Jaccard min_sim is 0.02 here "
        "(vs the registry query's 0.5) because the synthetic-dense "
        "graph tops out at ~0.04 — same join shape, non-trivial "
        "output.\n\n"
        "| analytic | wall (s) | output |\n|---|---|---|\n"
        f"| triangle_counts | {out['wall_triangles_sec']} | "
        f"{out['n_triangles']} triangles over {out['tri_vertices']} "
        "participating vertices |\n"
        f"| neighbor_jaccard (hub_cap=64) | {out['wall_jaccard_cap64_sec']}"
        f" | {out['jaccard_pairs_cap64']} pairs ≥0.02 |\n"
        f"| neighbor_jaccard (hub_cap=256) | "
        f"{out['wall_jaccard_cap256_sec']} | "
        f"{out['jaccard_pairs_cap256']} pairs ≥0.02 |\n"
        f"| khop (100 seeds, k=3) | {out['wall_khop_sec']} | "
        f"{out['khop_rows']} (seed, vertex, hop) rows |\n"
        f"| pmi_edges | {out['wall_pmi_sec']} | "
        f"{out['pmi_edges']} weighted pairs |\n"
    )
    from bench.scaling import _update_bench_md

    _update_bench_md(ROOT, None, section)


if __name__ == "__main__":
    main()
