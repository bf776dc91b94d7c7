"""Salted-join / two-phase-agg equivalence + plan tests."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from quacfka_spark.functions.skew import salted_join, two_phase_agg


def _skewed_df(spark):
    # 90% of rows share key 0 — the power-law hot key
    return spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    skewed = _skewed_df(spark)
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    plain = skewed.join(dim, ["k"]).groupBy("k").count()
    salted = salted_join(skewed, dim, ["k"], salt_buckets=8).groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    """The salt must appear in the shuffle partitioning so the hot key
    lands on salt_buckets partitions, not one."""
    skewed = _skewed_df(spark)
    dim = spark.range(0, 100).select(F.col("id").alias("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = salted_join(skewed, dim, ["k"], salt_buckets=8)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        p = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", p)
    assert parts and all("__salt" in x for x in parts)


def test_two_phase_agg_avg(spark):
    df = _skewed_df(spark)
    got = two_phase_agg(
        df,
        ["k"],
        [F.sum("v").alias("s"), F.count("v").alias("n")],
        [(F.sum("s") / F.sum("n")).alias("avg_v")],
        salt_buckets=8,
    )
    want = df.groupBy("k").agg(F.avg("v").alias("avg_v"))
    g = {r["k"]: r["avg_v"] for r in got.collect()}
    w = {r["k"]: r["avg_v"] for r in want.collect()}
    assert g.keys() == w.keys()
    assert all(abs(g[k] - w[k]) < 1e-9 for k in g)
