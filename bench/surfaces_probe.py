"""Surfaces-stage scaling diagnosis (round-4 VERDICT #8): the
distinct-surface aggregation was the worst-scaling non-diagnosed stage
in the sf1 table (4×-core efficiency 0.63). This probe decomposes the
stage at two parallelism levels on the same sf1-scale input:

  agg_only   — filter(pred='class') → groupBy(obj).count over the
               persisted triples (the map-side-combined shuffle; wire
               volume is vocab-scale)
  full_stage — mention_surfaces + eager localCheckpoint (adds the
               normalize/char-gram projection on the tiny distinct set
               AND the checkpoint materialization)

If agg_only scales but full_stage doesn't, the gap is the checkpoint
write / driver turnaround on a vocab-scale table (a fixed cost the
stage pays once, invisible at cluster scale); if agg_only itself
doesn't scale, the map side is allocation/memory-bandwidth-bound like
the edges stage was (same GC lever).

Usage: python bench/surfaces_probe.py [lo_cores] [hi_cores] [mult] [trials]
Appends/replaces the '## Surfaces stage decomposed' section of BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_CHILD = r"""
import json, sys, time
from pyspark.sql import functions as F
from code_index_spark.session import get_spark
from code_index_spark.sources.tpch import derived_transcripts
from code_index_spark.operators.extract import extract_triples_sql
from code_index_spark.operators.link import mention_surfaces

cores = int(sys.argv[1]); mult = int(sys.argv[2]); trials = int(sys.argv[3])
width = max(16 * mult, cores * 2)  # data-sized, equal across levels
spark = get_spark(f"surf{cores}", cores=cores, shuffle_partitions=width)
t = derived_transcripts(spark, "/root/testdata/sf0.1")
if mult > 1:
    t = (spark.range(mult).crossJoin(t)
         .withColumn("conv_id", F.concat_ws("-", "conv_id", F.col("id")))
         .drop("id"))
t = t.repartition(width, "conv_id").persist()
t.count()
triples = extract_triples_sql(t).persist()
triples.count()
out = {"cores": cores, "n_triples": triples.count()}

def timed(fn):
    secs = []
    for _ in range(trials):
        t0 = time.perf_counter(); fn(); secs.append(time.perf_counter() - t0)
    secs.sort()
    return round(secs[len(secs) // 2], 2)

cls = triples.filter(F.col("pred") == "class")
out["agg_only"] = timed(
    lambda: cls.groupBy(F.col("obj").alias("surface")).count().count())
out["full_stage"] = timed(
    lambda: mention_surfaces(triples).localCheckpoint(eager=True).count())
print(json.dumps(out))
"""


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    res = {}
    for cores in (lo, hi):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(cores), str(mult), str(trials)],
            capture_output=True, text=True, cwd=ROOT, timeout=3600,
        )
        res[cores] = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps(res[cores]), flush=True)

    ratio = hi // lo

    def eff(key):
        return round(res[lo][key] / res[hi][key] / ratio, 3)

    summary = {
        "metric": "surfaces_stage_probe",
        "mult": mult,
        "agg_only_eff": eff("agg_only"),
        "full_stage_eff": eff("full_stage"),
        **{f"{k}_{c}": res[c][k] for c in (lo, hi)
           for k in ("agg_only", "full_stage")},
    }
    print(json.dumps(summary), flush=True)

    section = (
        "## Surfaces stage decomposed\n\n"
        f"(bench/surfaces_probe.py, {res[lo]['n_triples']} triples ≈ sf{mult/10:.0f}, "
        f"local[{lo}] vs local[{hi}], equal data-sized widths, median of "
        f"{trials}.) Diagnosing the 0.63 sf1 efficiency of the "
        "distinct-surface aggregation (round-4 verdict #8):\n\n"
        f"| sub-step | local[{lo}] (s) | local[{hi}] (s) | {lo}→{hi} efficiency |\n"
        "|---|---|---|---|\n"
        f"| groupBy(obj).count only | {res[lo]['agg_only']} | "
        f"{res[hi]['agg_only']} | {summary['agg_only_eff']} |\n"
        f"| mention_surfaces + localCheckpoint | {res[lo]['full_stage']} | "
        f"{res[hi]['full_stage']} | {summary['full_stage_eff']} |\n"
    )
    from bench.scaling import _update_bench_md

    _update_bench_md(ROOT, None, section)


if __name__ == "__main__":
    main()
