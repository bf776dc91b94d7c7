"""label_propagate (the d06/d08 clustering core) on adversarial graph
shapes the LSH fixtures never produce: long chains (diameter >> the
near-clique 2-3 rounds), multiple components, and the non-convergence
backstop. A silent round cap used to return half-propagated labels on
any >20-hop chain."""

from __future__ import annotations

import pytest

from quacfka_spark.operators.dedup import label_propagate


def _labels(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "i bigint, j bigint")
    return {r["v"]: r["lbl"] for r in label_propagate(df, **kw).collect()}


def test_long_chain_converges_to_one_cluster(spark):
    # path 0-1-2-...-35: diameter 35, well past the old 20-round cap
    n = 36
    got = _labels(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {v: 0 for v in range(n)}


def test_multiple_components_keep_min_labels(spark):
    pairs = [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 20)]
    got = _labels(spark, pairs)
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_backstop_raises_instead_of_wrong_labels(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _labels(spark, [(i, i + 1) for i in range(10)], max_rounds=3)
