"""Bucketed-layout tests: co-bucketed tables join with zero exchanges —
the one-time-shuffle-at-ingest strategy for 100 TB fact-to-fact joins."""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.layout import cobucketed_join, write_bucketed, write_partitioned

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    t = load_views(spark, SF)
    write_bucketed(t["orders"], "orders_bkt", ["o_orderkey"], buckets=4)
    write_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_bkt",
        ["o_orderkey"],
        buckets=4,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    joined = cobucketed_join(spark, "lineitem_bkt", "orders_bkt", "o_orderkey")
    # force the non-broadcast path a big-big join would take at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert re.search(r"\(\d+\) SortMergeJoin", p)
    assert not re.search(r"\(\d+\) Exchange", p), p
    # and it computes the right thing
    n = joined.count()
    raw = load_views(spark, SF)
    expected = (
        raw["lineitem"]
        .join(raw["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n == expected


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    """Aggregation on the bucket key also skips its shuffle."""
    agg = (
        spark.table("lineitem_bkt")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    p = _plan(agg)
    assert not re.search(r"\(\d+\) Exchange", p), p


def test_partitioned_write_prunes(spark, tmp_path):
    t = load_views(spark, SF)
    path = str(tmp_path / "orders_by_status")
    write_partitioned(t["orders"], path, ["o_orderstatus"])
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    p = _plan(df)
    # partition filter is handled at the file index, not a row Filter
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m and "o_orderstatus" in m.group(1)
    assert df.count() == t["orders"].filter("o_orderstatus = 'F'").count()


def test_dynamic_partition_pruning_on_dim_filter(spark, tmp_path):
    """At 100 TB the fact table is partitioned on the dispatch key and a
    filtered dimension join must prune fact partitions at RUNTIME via
    dynamic partition pruning — the scan carries a dynamicpruning
    subquery filter, so partitions for dim values the filter rejects
    are never read."""
    t = load_views(spark, SF)
    fact_dir = str(tmp_path / "events_by_type")
    t["events"].write.partitionBy("event_type").parquet(fact_dir)
    dim = spark.createDataFrame(
        [("click", 1.5), ("view", 1.0), ("purchase", 2.0)],
        "event_type string, weight double",
    )
    fact = spark.read.parquet(fact_dir)
    j = (
        fact.join(F.broadcast(dim.filter(F.col("weight") > 1.2)), "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = _plan(j)
    assert "dynamicpruningexpression" in p.lower()
    # and the result only contains the surviving partitions
    got = {r["event_type"] for r in j.collect()}
    assert got <= {"click", "purchase"}


def test_artifact_fresh_survives_missing_success_marker(tmp_path):
    """Success markers can be disabled (marksuccessfuljobs=false); the
    library-owned _QUACFKA_DONE marker (touched by this module's
    writers AFTER the write returns) then proves completion. Part files
    WITHOUT either marker must read stale: with the v2 committer tasks
    commit parts directly into the dir, so their presence cannot
    distinguish a completed write from a mid-job crash."""
    import os
    import time

    from quacfka_spark.layout import DONE_MARKER, artifact_fresh

    src = tmp_path / "src.parquet"
    src.write_text("fixture")
    tbl = tmp_path / "wh" / "t"
    tbl.mkdir(parents=True)
    marker = str(tbl / "_SUCCESS")
    # no markers, no part files -> stale
    assert not artifact_fresh(marker, str(src))
    # part files but NO completion marker (possible mid-job crash) -> stale
    part = tbl / "part-00000-abc.parquet"
    part.write_text("data")
    os.utime(part, (time.time() + 5, time.time() + 5))
    assert not artifact_fresh(marker, str(src))
    # library DONE marker newer than source -> fresh despite no _SUCCESS
    done = tbl / DONE_MARKER
    done.write_text("")
    os.utime(done, (time.time() + 5, time.time() + 5))
    assert artifact_fresh(marker, str(src))
    # DONE marker OLDER than the (regenerated) source -> stale again
    os.utime(done, (0, 0))
    assert not artifact_fresh(marker, str(src))
    # committer's _SUCCESS still accepted on its own
    done.unlink()
    with open(marker, "w"):
        pass
    os.utime(marker, (time.time() + 5, time.time() + 5))
    assert artifact_fresh(marker, str(src))
