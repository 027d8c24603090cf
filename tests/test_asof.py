"""asof_join semantics (operators/asof.py): backward match per key,
tie-at-timestamp inclusion, NULL on no prior match, tolerance cutoff —
pinned against hand-computed expectations (the driver query
additionally cross-checks the operator against DuckDB's NATIVE ASOF
JOIN on 2k rows, oracle `events_asof_attribution`)."""

import datetime as dt

from pyspark.sql import functions as F

from code_index_spark.operators.asof import asof_join

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_backward_match_ties_and_nulls(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "p1"),   # after clicks at 5 and 9 → 9
         ("u1", _ts(5), "p2"),    # tie: click AT minute 5 matches
         ("u1", _ts(1), "p3"),    # before any click → NULL
         ("u2", _ts(10), "p4"),   # u2 has no clicks at all → NULL
         ("u3", _ts(7), "p5")],   # u3's only click is later → NULL
        "user string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(5), "c5"), ("u1", _ts(9), "c9"), ("u1", _ts(12), "c12"),
         ("u3", _ts(8), "c8")],
        "user string, ts timestamp, cid string",
    )
    out = {
        r["pid"]: r["cid_r"]
        for r in asof_join(left, right, on="user", left_ts="ts",
                           right_ts="ts").collect()
    }
    assert out == {"p1": "c9", "p2": "c5", "p3": None, "p4": None, "p5": None}


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "p1"),   # click 1 min earlier → fresh
         ("u1", _ts(60), "p2")],  # click 51 min earlier → stale
        "user string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(9), "c9")], "user string, ts timestamp, cid string"
    )
    out = {
        r["pid"]: (r["cid_r"], r["ts_r"])
        for r in asof_join(left, right, on="user", left_ts="ts",
                           right_ts="ts",
                           tolerance_ms=5 * 60 * 1000).collect()
    }
    assert out["p1"] == ("c9", _ts(9))
    assert out["p2"] == (None, None)


def test_asof_plan_is_single_shuffle(spark):
    """The union-and-carry formulation must stay one exchange (the
    window's key partitioning) — no join, no pair explosion."""
    left = spark.range(100).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("pid"),
    )
    right = spark.range(50).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.col("id").alias("cid"),
    )
    plan = asof_join(left, right, on="k", left_ts="ts", right_ts="ts") \
        ._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan


def test_range_join_semantics(spark):
    """Bucketized interval join (operators/rangejoin.py): inclusive
    bounds, bucket-boundary straddling, key isolation — vs a
    hand-computed expectation. Window = [-10 min, 0]."""
    from code_index_spark.operators.rangejoin import time_range_join

    left = spark.createDataFrame(
        [("u1", _ts(20), "p1"), ("u2", _ts(20), "p2")],
        "user string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), "a"),    # exactly at lower bound → included
         ("u1", _ts(15), "b"),    # inside
         ("u1", _ts(20), "c"),    # exactly at upper bound → included
         ("u1", _ts(9), "d"),     # just outside
         ("u1", _ts(21), "e"),    # future → excluded
         ("u2", _ts(15), "f")],   # other key
        "user string, ts timestamp, cid string",
    )
    out = time_range_join(
        left, right, on="user", left_ts="ts", right_ts="ts",
        lower_ms=-10 * 60 * 1000, upper_ms=0,
    )
    got = {(r["pid"], r["cid_r"]) for r in out.collect()}
    assert got == {("p1", "a"), ("p1", "b"), ("p1", "c"), ("p2", "f")}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        time_range_join(left, right, on="user", left_ts="ts",
                        right_ts="ts", lower_ms=0, upper_ms=0)


def test_range_join_plan_is_equi_join(spark):
    """The non-equi window must compile to a hash EQUI-join on
    (key, bucket) — never BroadcastNestedLoop / cartesian."""
    from code_index_spark.operators.rangejoin import time_range_join

    left = spark.range(2000).select(
        (F.col("id") % 50).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("pid"),
    )
    right = spark.range(2000).select(
        (F.col("id") % 50).alias("k"),
        F.timestamp_seconds(F.col("id") * 45).alias("ts"),
        F.col("id").alias("cid"),
    )
    plan = time_range_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        lower_ms=-600_000, upper_ms=0,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # it IS a join — a hash/sort-merge equi-join


def test_reserved_name_collisions_raise(spark):
    """Inputs using internal working names or colliding with suffixed
    right outputs fail FAST with a clear error instead of producing
    ambiguous/silently-wrong columns (round-4 ADVICE)."""
    import pytest as _pytest

    from code_index_spark.operators.asof import asof_join
    from code_index_spark.operators.rangejoin import time_range_join

    left = spark.createDataFrame(
        [("u", 1, 10)], "user string, ts long, x long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(
        [("u", 1, 20)], "user string, ts long, y long"
    ).withColumn("ts", F.timestamp_seconds("ts"))

    with _pytest.raises(ValueError, match="reserved"):
        asof_join(left.withColumn("__tag", F.lit(1)), right,
                  on="user", left_ts="ts", right_ts="ts")
    with _pytest.raises(ValueError, match="suffixed"):
        # left already has the name the suffixed right ts would get
        asof_join(left.withColumn("ts_r", F.lit(0)), right,
                  on="user", left_ts="ts", right_ts="ts")
    with _pytest.raises(ValueError, match="reserved"):
        time_range_join(left, right.withColumn("__bucket", F.lit(0)),
                        on="user", left_ts="ts", right_ts="ts",
                        lower_ms=-1000, upper_ms=0)
    with _pytest.raises(ValueError, match="suffixed"):
        time_range_join(left.withColumn("y_r", F.lit(0)), right,
                        on="user", left_ts="ts", right_ts="ts",
                        lower_ms=-1000, upper_ms=0)
