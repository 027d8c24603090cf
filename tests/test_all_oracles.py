"""CI-style full oracle sweep (round-4 VERDICT #9): the driver samples
~50 queries per round, so an unsampled query could silently rot between
rounds. This slow-marked test runs EVERY registered query against its
DuckDB oracle at sf0.001 — same normalization as tools/check_oracles.py
(the driver-style harness) — so the repo self-verifies all of them:

    python -m pytest tests/ -m slow -q

Excluded from the default suite via pytest.ini addopts (`-m "not slow"`)
to keep the ~2-min default run; the rows-only queries (no oracle entry)
are executed too and must at least produce a schema'd result without
error."""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.slow
def test_every_registered_query_matches_its_oracle(spark):
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from code_index_spark.sources.tpch import TABLES
    from tools.check_oracles import normalize

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures: list[str] = []
    for name, fn in qs.items():
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001 — collect, don't abort the sweep
            failures.append(f"{name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in os_:
            continue  # rows-only: ran without error, schema produced
        try:
            want = con.execute(os_[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: duckdb error {e}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append(f"{name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(f"{name}: rows {len(g)} vs {len(w)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, atol=1e-6)
        except AssertionError as e:
            failures.append(f"{name}: values differ: {str(e)[:300]}")
    assert not failures, "\n".join(failures)
    # the sweep is only meaningful if the registry stayed populated
    assert len(qs) >= 60 and sum(1 for n in qs if n in os_) >= 55
