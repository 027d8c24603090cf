"""Two-parallelism scaling benchmark (north_rule evidence).

No multi-executor cluster exists in this sandbox, so cluster-size
scaling is evidenced by running the identical job at two local
parallelism levels (N and 4N cores) on the same input and reporting
turns/sec at both plus efficiency = (rate_4N / rate_N) / 4.

The job: triple extraction (the pipeline's dominant stage) over the
sf0.1-derived transcripts (600k turns), measured for BOTH engine paths:
the pure-Catalyst extractor (the pipeline default) and the
Arrow/Python span-carrying extractor. Each level runs in its own
subprocess (fresh JVM), warms the workers, then takes the median of
`trials` timed runs — the host shows 10-30% hypervisor steal time
under sustained load, so medians over several trials are used rather
than single runs.

Usage: python bench/scaling.py [N] [sf_dir]   (default N=4 → 4 vs 16)
Writes/updates BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
from code_index_spark.session import get_spark
from code_index_spark.sources.tpch import derived_transcripts
from code_index_spark.operators.extract import extract_triples, extract_triples_sql

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; trials = int(sys.argv[3])
spark = get_spark(f"scal{cores}", cores=cores, shuffle_partitions=max(cores * 2, 8))
t = derived_transcripts(spark, sf_dir).repartition(cores * 2, "conv_id").persist()
n = t.count()
out = {"cores": cores, "n_turns": n}
for name, fn in (("catalyst", extract_triples_sql), ("python", extract_triples)):
    fn(t.limit(1000)).count()  # warm workers / codegen
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn(t).count()
        rates.append(n / (time.perf_counter() - t0))
    rates.sort()
    out[name] = {"median_rate": rates[len(rates) // 2],
                 "rates": [round(r) for r in rates]}
print(json.dumps(out))
"""


def run_level(cores: int, sf_dir: str, trials: int = 5) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cores), sf_dir, str(trials)],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = run_level(n, sf_dir)
    hi = run_level(4 * n, sf_dir)
    effs = {
        p: (hi[p]["median_rate"] / lo[p]["median_rate"]) / 4.0
        for p in ("catalyst", "python")
    }
    result = {
        "metric": "scaling_efficiency_extract",
        "n_cores": n,
        "n4_cores": 4 * n,
        "n_turns": lo["n_turns"],
        "sf_dir": sf_dir,
        "catalyst": {"rate_n": round(lo["catalyst"]["median_rate"]),
                     "rate_4n": round(hi["catalyst"]["median_rate"]),
                     "efficiency": round(effs["catalyst"], 3)},
        "python": {"rate_n": round(lo["python"]["median_rate"]),
                   "rate_4n": round(hi["python"]["median_rate"]),
                   "efficiency": round(effs["python"], 3)},
    }
    print(json.dumps(result))
    md = (
        "# BENCH — scaling evidence (north_rule)\n\n"
        "Job: triple extraction over the sf-derived transcripts "
        f"({lo['n_turns']} turns, `{sf_dir}`), both engine paths: the\n"
        "pure-Catalyst extractor (pipeline default since round 2) and "
        "the Arrow/Python span-carrying extractor.\n"
        "Same input, same partition-per-core ratio (2x), fresh JVM per "
        "level, workers warmed, median of 5 runs (the sandbox host "
        "shows 10-30% hypervisor steal under sustained load, see "
        "`top` st%).\n\n"
        "| path | parallelism | turns/sec (median) | all trials |\n|---|---|---|---|\n"
        f"| catalyst | local[{n}] | {round(lo['catalyst']['median_rate'])} | {lo['catalyst']['rates']} |\n"
        f"| catalyst | local[{4*n}] | {round(hi['catalyst']['median_rate'])} | {hi['catalyst']['rates']} |\n"
        f"| python | local[{n}] | {round(lo['python']['median_rate'])} | {lo['python']['rates']} |\n"
        f"| python | local[{4*n}] | {round(hi['python']['median_rate'])} | {hi['python']['rates']} |\n\n"
        f"**Scaling efficiency N→4N: catalyst = {effs['catalyst']:.3f}, "
        f"python = {effs['python']:.3f}** (target ≥ 0.8).\n\n"
        "At 10^12 turns the same job shape holds: extraction is "
        "shuffle-free (scan → repartition-by-conv_id → codegen'd "
        "regexp/explode, or Arrow UDF on the provenance path), so "
        "cluster scaling is governed by input splits, not coordination; "
        "the only sequential component is driver scheduling.\n"
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
