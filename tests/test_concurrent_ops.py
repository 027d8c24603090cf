"""Concurrency safety of the iterative operators (round-4 VERDICT #3):
the loop operators used to narrow spark.sql.shuffle.partitions in
try/finally, which races when two queries share one session — one
query's finally restores the session knob mid-flight under the other.
They now size their shuffles plan-locally (explicit repartition), so
running them concurrently from one session must (a) leave session conf
untouched and (b) produce exactly the serial results."""

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from code_index_spark.operators.canon import connected_components
from code_index_spark.operators.graphalgo import pagerank


def _random_pairs(spark, n_edges, n_nodes, seed):
    """Deterministic random string-surface edge list."""
    return (
        spark.range(n_edges)
        .select(
            F.concat(F.lit("s"), (F.xxhash64(F.col("id") + seed) % n_nodes))
            .alias("surface_a"),
            F.concat(F.lit("s"), (F.xxhash64(F.col("id") + seed + 7) % n_nodes))
            .alias("surface_b"),
        )
        .filter(F.col("surface_a") != F.col("surface_b"))
    )


def _cc_labels(df):
    return {(r["surface"], r["component"]) for r in df.collect()}


def _pr_ranks(df):
    return {r["v"]: round(r["rank"], 9) for r in df.collect()}


def test_concurrent_loop_operators_do_not_race(spark):
    pairs = _random_pairs(spark, 600, 150, seed=11).localCheckpoint(eager=True)
    edges = (
        _random_pairs(spark, 400, 80, seed=23)
        .select(
            F.xxhash64("surface_a").alias("src_entity"),
            F.xxhash64("surface_b").alias("dst_entity"),
        )
        .localCheckpoint(eager=True)
    )

    conf_before = spark.conf.get("spark.sql.shuffle.partitions")

    # serial baselines; driver_max_edges=0 forces the DISTRIBUTED star
    # loop (the conf-sensitive path — driver union-find never shuffles)
    cc_serial = _cc_labels(connected_components(pairs, driver_max_edges=0))
    pr_serial = _pr_ranks(pagerank(edges, max_iter=8))

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_cc = pool.submit(
            lambda: _cc_labels(connected_components(pairs, driver_max_edges=0))
        )
        f_pr = pool.submit(lambda: _pr_ranks(pagerank(edges, max_iter=8)))
        cc_conc, pr_conc = f_cc.result(timeout=300), f_pr.result(timeout=300)

    assert cc_conc == cc_serial
    assert pr_conc == pr_serial
    assert spark.conf.get("spark.sql.shuffle.partitions") == conf_before
