"""Triangle counts, k-hop BFS, neighbor-Jaccard pairs, PMI edges —
hand-computable graphs plus brute-force parity on a seeded random graph."""

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from code_index_spark.operators.graphalgo import (
    khop_neighbors,
    neighbor_jaccard_pairs,
    pmi_edges,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "co_mention", b, "c0", 0, 1.0) for a, b in pairs],
        "src_entity long, pred string, dst_entity long, conv_id string, "
        "turn_idx int, weight double",
    )


def test_triangles_two_shared(spark):
    # triangles {1,2,3}, {3,4,5}, {1,3,4}
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (1, 4)])
    got = {r["vertex"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert got == {1: 2, 2: 1, 3: 3, 4: 2, 5: 1}


def test_triangles_star_is_empty(spark):
    e = _edges(spark, [(1, k) for k in range(2, 8)])
    assert triangle_counts(e).count() == 0


def test_triangles_duplicate_and_reversed_edges_ignored(spark):
    # same triangle listed twice, once reversed — still one triangle each
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (2, 1), (1, 3)])
    got = {r["vertex"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def _brute_triangles(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangles_random_graph_vs_brute_force(spark):
    rng = random.Random(7)
    pairs = {tuple(sorted(rng.sample(range(30), 2))) for _ in range(120)}
    got = {
        r["vertex"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, sorted(pairs))).collect()
    }
    assert got == _brute_triangles(pairs)


def test_khop_path_graph(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,), (3,)], "seed long")
    got = {
        (r["seed"], r["vertex"]): r["hop"]
        for r in khop_neighbors(e, seeds, k=2).collect()
    }
    assert got == {
        (1, 2): 1, (1, 3): 2,
        (3, 2): 1, (3, 4): 1, (3, 1): 2, (3, 5): 2,
    }


def test_khop_minimal_hop_wins_on_cycle(spark):
    # square 1-2-3-4-1: from seed 1 at k=3, vertex 3 is hop 2 (never 3)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    seeds = spark.createDataFrame([(1,)], "seed long")
    got = {
        (r["seed"], r["vertex"]): r["hop"]
        for r in khop_neighbors(e, seeds, k=3).collect()
    }
    assert got == {(1, 2): 1, (1, 4): 1, (1, 3): 2}


def test_khop_early_exit_on_exhausted_component(spark):
    e = _edges(spark, [(1, 2), (3, 4)])
    seeds = spark.createDataFrame([(1,)], "seed long")
    got = {
        (r["seed"], r["vertex"]): r["hop"]
        for r in khop_neighbors(e, seeds, k=5).collect()
    }
    assert got == {(1, 2): 1}


def test_neighbor_jaccard_identical_neighborhoods(spark):
    # 1 and 2 both connect to {10, 11, 12} and nothing else → jaccard 1
    e = _edges(spark, [(1, n) for n in (10, 11, 12)] + [(2, n) for n in (10, 11, 12)])
    got = {
        (r["ent_a"], r["ent_b"]): (r["common_neighbors"], r["jaccard"])
        for r in neighbor_jaccard_pairs(e, min_sim=0.9).collect()
    }
    # 1 and 2 share {10,11,12}; each leaf pair shares {1,2}
    assert got == {
        (1, 2): (3, 1.0),
        (10, 11): (2, 1.0), (10, 12): (2, 1.0), (11, 12): (2, 1.0),
    }


def _brute_jaccard(pairs, min_sim):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for x, y in itertools.combinations(sorted(adj), 2):
        c = len(adj[x] & adj[y])
        if c == 0:
            continue
        j = round(c / len(adj[x] | adj[y]), 6)
        if j >= min_sim:
            out[(x, y)] = (c, j)
    return out


def test_neighbor_jaccard_random_graph_vs_brute_force(spark):
    rng = random.Random(11)
    pairs = {tuple(sorted(rng.sample(range(25), 2))) for _ in range(90)}
    got = {
        (r["ent_a"], r["ent_b"]): (r["common_neighbors"], r["jaccard"])
        for r in neighbor_jaccard_pairs(_edges(spark, sorted(pairs)), min_sim=0.3).collect()
    }
    assert got == _brute_jaccard(pairs, 0.3)


def test_neighbor_jaccard_hub_cap_drops_hub_evidence(spark):
    # hub 99 connects to everyone; 1 and 2 share only the hub
    e = _edges(spark, [(1, 99), (2, 99), (3, 99), (1, 10), (2, 10)])
    # exact: N(1)={99,10}, N(2)={99,10} → jaccard 1 (two common)
    exact = {
        (r["ent_a"], r["ent_b"]): r["common_neighbors"]
        for r in neighbor_jaccard_pairs(e, min_sim=0.1).collect()
    }
    assert exact[(1, 2)] == 2
    # hub_cap=2 removes vertex 99 (degree 3) as a shared-neighbor
    # witness: 1-2 keep only witness 10; pairs sharing ONLY the hub vanish
    capped = {
        (r["ent_a"], r["ent_b"]): r["common_neighbors"]
        for r in neighbor_jaccard_pairs(e, min_sim=0.1, hub_cap=2).collect()
    }
    assert capped[(1, 2)] == 1
    assert (1, 3) not in capped and (2, 3) not in capped


def test_pmi_edges_hand_computed(spark):
    # 4 units; a+b co-occur twice, a+c once
    rows = [
        ("c1", 0, "a"), ("c1", 0, "b"),
        ("c1", 1, "a"), ("c1", 1, "b"),
        ("c2", 0, "a"), ("c2", 0, "c"),
        ("c2", 1, "d"),
    ]
    m = spark.createDataFrame(rows, "conv_id string, turn_idx int, norm string")
    got = {
        (r["ent_a"], r["ent_b"]): (r["n_co"], r["pmi"])
        for r in pmi_edges(m).collect()
    }
    n = 4
    assert got[("a", "b")] == (2, round(math.log(2 * n / (3 * 2)), 6))
    assert got[("a", "c")] == (1, round(math.log(1 * n / (3 * 1)), 6))
    assert set(got) == {("a", "b"), ("a", "c")}


def test_pmi_edges_dedupes_repeat_mentions_within_unit(spark):
    # the same (unit, norm) twice must count once
    rows = [("c1", 0, "a"), ("c1", 0, "a"), ("c1", 0, "b"), ("c2", 0, "a")]
    m = spark.createDataFrame(rows, "conv_id string, turn_idx int, norm string")
    got = {(r["ent_a"], r["ent_b"]): r["n_co"] for r in pmi_edges(m).collect()}
    assert got == {("a", "b"): 1}
