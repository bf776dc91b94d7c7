"""Every declared query hash-matches the DuckDB oracle — the same check
the driver runs for CORRECTNESS_r{N}.json, executed locally at sf0.001
(fast) and, when SPARK_GRAFT_FULL=1, at sf0.01 (the driver's t2 scale).
"""

from __future__ import annotations

import os

import pytest

from quacfka_spark.registry import QUERIES, get_queries

import tests.conftest as cf
from tests.parity import compare

get_queries()  # populate registry
ALL = sorted(QUERIES)
FULL = os.environ.get("SPARK_GRAFT_FULL") == "1"


@pytest.mark.parametrize("name", ALL)
def test_parity_smoke(spark, duck_smoke, name):
    q = QUERIES[name]
    df = q.fn(spark, cf.SMOKE_DIR)
    assert df.schema is not None
    if q.oracle is None:
        assert df.count() >= 0
        return
    problems = compare(df, duck_smoke.sql(q.oracle))
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.skipif(not FULL, reason="set SPARK_GRAFT_FULL=1 for sf0.01 parity")
@pytest.mark.parametrize("name", ALL)
def test_parity_t2(spark, duck_t2, name):
    q = QUERIES[name]
    df = q.fn(spark, cf.T2_DIR)
    if q.oracle is None:
        assert df.count() >= 0
        return
    problems = compare(df, duck_t2.sql(q.oracle))
    assert not problems, f"{name}: " + "; ".join(problems)
