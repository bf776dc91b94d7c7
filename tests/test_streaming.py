"""Real streaming-engine tests (S4 watermark/late-data, S6 arbitrary
stateful aggregation — SURVEY.md §2b "engine-level test, no batch
oracle"), plus the D3 mock-source smoke through the full pipeline.

Multi-batch sequencing: batch files are written *between*
``processAllAvailable()`` calls, so each file deterministically forms its
own micro-batch (writing both up front can land them in one initial
batch regardless of maxFilesPerTrigger).
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from quacfka_spark.catalog import stream_events

TS = pd.Timestamp

BATCH1 = [
    (TS("2024-01-01 10:00:30"), 1, 1.0),
    (TS("2024-01-01 10:01:30"), 2, 2.0),
    (TS("2024-01-01 11:00:00"), 1, 3.0),  # advances watermark to 10:50
]
BATCH2 = [
    (TS("2024-01-01 10:02:00"), 3, 4.0),  # LATE: behind the 10:50 watermark
    (TS("2024-01-01 11:05:00"), 2, 5.0),  # on time
]


def _write_batch_file(d: str, name: str, rows: list[tuple]) -> None:
    tbl = pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "v": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, name))


def _file_stream(spark, d):
    return spark.readStream.schema("ts timestamp, user_id bigint, v double").parquet(d)


def _run_two_batches(spark, tmp_path, build_query, sink_name):
    """Start the streaming query over an input dir, feed BATCH1, let it
    fully process, then feed BATCH2 — two deterministic micro-batches."""
    d = str(tmp_path / "stream_in")
    os.makedirs(d)
    _write_batch_file(d, "f1.parquet", BATCH1)
    q = build_query(_file_stream(spark, d), str(tmp_path / "ckpt"), sink_name)
    try:
        q.processAllAvailable()
        _write_batch_file(d, "f2.parquet", BATCH2)
        q.processAllAvailable()
    finally:
        q.stop()


def test_s4_watermark_drops_late_data(spark, tmp_path):
    def build(src, ckpt, name):
        agg = (
            src.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    _run_two_batches(spark, tmp_path, build, "s4_sink")
    rows = {
        r["w"]["start"].strftime("%H:%M"): r["n"]
        for r in spark.sql("SELECT * FROM s4_sink").collect()
    }
    # the 10:00 window closed with only batch-1 rows; the late 10:02 event
    # from batch 2 was dropped by the watermark
    assert rows.get("10:00") == 2, rows


def test_s6_stateful_running_count(spark, tmp_path):
    def running_count(key, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

    def build(src, ckpt, name):
        out = src.groupBy("user_id").applyInPandasWithState(
            running_count,
            outputStructType="user_id bigint, n bigint",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        return (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    _run_two_batches(spark, tmp_path, build, "s6_sink")
    # state accumulates across batches: user 1 -> 2 (batch1), user 2 ->
    # 1 then 2, user 3 -> 1
    latest = {
        r.user_id: r.n
        for r in spark.sql(
            "SELECT user_id, MAX(n) AS n FROM s6_sink GROUP BY user_id"
        ).collect()
    }
    assert latest == {1: 2, 2: 2, 3: 1}, latest


def test_s5_streaming_dedup(spark, tmp_path):
    def build(src, ckpt, name):
        dedup = src.withWatermark("ts", "1 hour").dropDuplicates(["user_id"])
        return (
            dedup.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    _run_two_batches(spark, tmp_path, build, "s5_sink")
    # user 2 appears in both batches but is emitted once; dedup state
    # spans micro-batches
    assert spark.sql("SELECT COUNT(*) AS n FROM s5_sink").first().n == 3


def test_d3_mock_source_through_pipeline(spark, tmp_path):
    """MockKafka analog: rate-source bytes -> decode -> normalize ->
    sinks, a few processing-time triggers (D3 + D13/D16/D24)."""
    from quacfka_spark.plans.normalizer import NormalizerSpec
    from quacfka_spark.sources.kafka import decode_json
    from quacfka_spark.sources.mock import NESTED_SCHEMA, mock_kafka_bytes_stream
    from quacfka_spark.streaming import PipelineConfig, StreamingPipeline

    out = str(tmp_path / "mock_out")
    pipe = StreamingPipeline(
        spark,
        mock_kafka_bytes_stream(spark, rows_per_second=500),
        PipelineConfig(output_dir=out, trigger_seconds=1),
        decode=lambda df: decode_json(df, NESTED_SCHEMA),
        normalizer=NormalizerSpec(
            fields=["r.site.id", "r.deals.id"], aliases=["site", "deal_id"]
        ),
    )
    q = pipe.start()
    deadline = time.time() + 30
    while time.time() < deadline and pipe.metrics.records_consumed == 0:
        time.sleep(1)
    pipe.stop()
    assert pipe.error() is None
    rep = pipe.metrics.report()
    assert rep["records_consumed"] > 0
    assert rep["records_inserted"] == rep["records_consumed"]
    assert rep["norm_records_inserted"] > 0


def test_d16_processing_time_trigger_rotation(spark, tmp_path):
    """D16: wall-clock trigger mode — epochs rotate on the trigger
    interval like the reference's duration-based file rotation
    (quacfka.go:94-104). Uses the live mock source for a few seconds."""
    import time as _time

    from quacfka_spark.sources.kafka import decode_json
    from quacfka_spark.sources.mock import NESTED_SCHEMA, mock_kafka_bytes_stream
    from quacfka_spark.streaming import PipelineConfig, StreamingPipeline

    out = str(tmp_path / "out")
    pipe = StreamingPipeline(
        spark,
        mock_kafka_bytes_stream(spark, rows_per_second=2000),
        PipelineConfig(output_dir=out, dest_table="messages", trigger_seconds=1),
        decode=lambda df: decode_json(df, NESTED_SCHEMA),
    )
    q = pipe.start()
    try:
        deadline = _time.time() + 30
        while _time.time() < deadline and pipe.metrics.batches < 2:
            _time.sleep(0.5)
    finally:
        pipe.stop()
    assert pipe.error() is None
    assert pipe.metrics.batches >= 2  # rotated at least twice
    assert pipe.metrics.records_inserted == pipe.metrics.records_consumed
    assert len(pipe.completed_paths) >= 2


def test_s01_streaming_batch_equivalence(spark, tmp_path):
    """S1 executed as an ACTUAL streaming query (readStream over the
    events fixture, window() agg, memory sink) must produce exactly the
    batch-mode declared-query result — the survey's 'streaming in the
    engine, hash-checked in batch' contract (SURVEY.md §2b)."""
    from pyspark.sql import functions as F

    from quacfka_spark.registry import get_queries

    sf_dir = "/root/testdata/sf0.001"
    # file-stream sources want a directory; symlink the fixture in.
    # stream_events sniffs the on-disk ts flavor and normalizes like
    # catalog.load_views does for batch.
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", stream_dir / "events.parquet")
    ev = stream_events(spark, str(stream_dir))
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("w"),
            "event_type",
            "n",
            "s",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("s01_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM s01_stream").collect())
    )
    want = sorted(
        map(tuple, get_queries()["s01_tumbling_window"](spark, sf_dir).collect())
    )
    assert got == want


def test_s03_streaming_session_window_with_watermark(spark, tmp_path):
    """S3 as an actual watermark-closed streaming query: sessions emit in
    append mode once the watermark passes them. A far-future sentinel
    event arrives as the final micro-batch to push the watermark past
    every real session; the emitted sessions must equal the batch
    declared-query result."""
    from pyspark.sql import functions as F

    from quacfka_spark.registry import get_queries

    sf_dir = "/root/testdata/sf0.001"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", stream_dir / "a_events.parquet")

    # sentinel: one event a year past the fixture, lexicographically and
    # mtime-wise LAST so it forms the final micro-batch. Its ts column
    # must use the SAME physical type as the fixture file (the stream
    # reads one directory schema), so derive it from the fixture.
    ts_type = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    ts_val = pd.Timestamp("2025-06-01")
    sent_ts = (
        pa.array([ts_val], ts_type)
        if pa.types.is_timestamp(ts_type)
        else pa.array([ts_val.value], pa.int64())
    )
    sent = pa.table(
        {
            "event_id": pa.array([10**9], pa.int64()),
            "ts": sent_ts,
            "user_id": pa.array([-1], pa.int64()),
            "event_type": pa.array(["view"], pa.string()),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    sent_path = stream_dir / "z_sentinel.parquet"
    pq.write_table(sent, sent_path)
    os.utime(sent_path, (time.time() + 60, time.time() + 60))

    ev = stream_events(spark, str(stream_dir), maxFilesPerTrigger="1")
    sessions = (
        ev.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", "5 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("win.start").cast("string").alias("session_start"),
            F.col("win.end").cast("string").alias("session_end"),
            "n",
        )
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("s03_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM s03_stream WHERE user_id >= 0").collect())
    )
    want = sorted(
        map(tuple, get_queries()["s03_session_window"](spark, sf_dir).collect())
    )
    assert got == want


def test_s7_stream_stream_interval_join(spark, tmp_path):
    """S7: stream-stream inner join with watermarks on both sides and a
    time-interval condition (ad impression joined to clicks within 10
    minutes). State for each side is bounded by its watermark; Spark
    drops impression state once click-time watermark passes imp_ts+10m.
    The reference has no join at all in its streaming path — this is
    engine-native capability beyond it (SURVEY.md §2b S-table scope)."""

    def _write(d, name, col, rows):
        tbl = pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                col: pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(d, name))

    imp_dir, clk_dir = str(tmp_path / "imps"), str(tmp_path / "clicks")
    os.makedirs(imp_dir)
    os.makedirs(clk_dir)
    # batch 1: impressions for ads 1,2 at 10:00; click on ad 1 at 10:05
    _write(imp_dir, "f1.parquet", "ad_id", [(TS("2024-01-01 10:00:00"), 1), (TS("2024-01-01 10:00:00"), 2)])
    _write(clk_dir, "f1.parquet", "c_ad_id", [(TS("2024-01-01 10:05:00"), 1)])

    imps = (
        spark.readStream.schema("ts timestamp, ad_id bigint")
        .parquet(imp_dir)
        .withColumnRenamed("ts", "imp_ts")
        .withWatermark("imp_ts", "10 minutes")
    )
    clks = (
        spark.readStream.schema("ts timestamp, c_ad_id bigint")
        .parquet(clk_dir)
        .withColumnRenamed("ts", "click_ts")
        .withWatermark("click_ts", "10 minutes")
    )
    joined = imps.join(
        clks,
        F.expr(
            "ad_id = c_ad_id AND "
            "click_ts >= imp_ts AND click_ts <= imp_ts + INTERVAL 10 MINUTES"
        ),
    ).select("ad_id", "imp_ts", "click_ts")
    q = (
        joined.writeStream.format("memory")
        .queryName("s7_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: late click on ad 2 (10:45 — outside the 10-minute
        # interval) must NOT join; click on ad 3 joins its impression
        _write(imp_dir, "f2.parquet", "ad_id", [(TS("2024-01-01 11:00:00"), 3)])
        _write(
            clk_dir,
            "f2.parquet",
            "c_ad_id",
            [(TS("2024-01-01 10:45:00"), 2), (TS("2024-01-01 11:04:00"), 3)],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        (r.ad_id, r.click_ts.strftime("%H:%M"))
        for r in spark.sql("SELECT * FROM s7_sink").collect()
    )
    assert rows == [(1, "10:05"), (3, "11:04")], rows


def test_s6b_transform_with_state_in_pandas(spark, tmp_path):
    """S6 via the modern stateful API (transformWithStateInPandas,
    Spark 4): a StatefulProcessor with ValueState keeps a running
    per-user count across micro-batches. Requires the RocksDB state
    store provider, and the ``protobuf`` Python package for Spark's
    state-server protocol (absent in this container -> skipped; the
    applyInPandasWithState path above is the tested-everywhere S6)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas needs the protobuf package",
    )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            total = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                total += len(pdf)
            self._count.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

        def close(self) -> None:
            pass

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        def build(src, ckpt, name):
            out = src.groupBy("user_id").transformWithStateInPandas(
                RunningCount(),
                outputStructType="user_id bigint, n bigint",
                outputMode="Update",
                timeMode="None",
            )
            return (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .start()
            )

        _run_two_batches(spark, tmp_path, build, "s6b_sink")
        latest = {
            r.user_id: r.n
            for r in spark.sql(
                "SELECT user_id, MAX(n) AS n FROM s6b_sink GROUP BY user_id"
            ).collect()
        }
        assert latest == {1: 2, 2: 2, 3: 1}, latest
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_s02_streaming_sliding_window_equivalence(spark, tmp_path):
    """S2 as an actual streaming query: the sliding window(ts, 1h, 30m)
    aggregation over readStream must equal the batch declared query —
    each event lands in its two overlapping windows in streaming exactly
    as the batch oracle's 2-row offsets replay says it should."""
    from pyspark.sql import functions as F

    from quacfka_spark.registry import get_queries

    sf_dir = "/root/testdata/sf0.001"
    stream_dir = tmp_path / "events_stream_s02"
    stream_dir.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", stream_dir / "events.parquet")
    ev = stream_events(spark, str(stream_dir))
    agg = (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes")
            .getField("start")
            .cast("string")
            .alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("s02_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_s02"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM s02_stream").collect()))
    want = sorted(
        map(tuple, get_queries()["s02_sliding_window"](spark, sf_dir).collect())
    )
    assert got == want


def test_s09_streaming_changelog_foreachbatch_merge(spark, tmp_path):
    """x11's streaming form, run through a REAL readStream: each
    micro-batch delta is changelog_reduce'd and merged into the state
    at rest (epoch-versioned parquet — the D19 idempotent-sink
    discipline), tombstones survive in state so later upserts
    resurrect the key, and the published snapshot after N micro-batches
    equals the one-shot batch reduce over the full changelog — the
    merge is lossless across any batch boundary placement."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quacfka_spark.operators.extensions import (
        changelog_merge,
        changelog_publish,
        changelog_reduce,
    )

    def write_changelog(d, name, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, os.path.join(d, name))

    B1 = [
        (1, TS("2024-01-01 10:00:00"), 1, "click", 1.0),
        (2, TS("2024-01-01 10:05:00"), 1, "view", 2.0),
        (3, TS("2024-01-01 10:01:00"), 2, "click", 3.0),
    ]
    B2 = [
        (4, TS("2024-01-01 10:10:00"), 2, "error", 0.0),  # tombstone u2
        (5, TS("2024-01-01 10:02:00"), 3, "view", 5.0),
        (6, TS("2024-01-01 10:20:00"), 1, "click", 7.0),
    ]
    B3 = [
        (7, TS("2024-01-01 10:30:00"), 2, "view", 9.0),  # resurrect u2
    ]

    src = tmp_path / "changelog_in"
    src.mkdir()
    state_root = tmp_path / "state"
    state_root.mkdir()
    state_paths: list[str] = []

    def upsert(batch_df, epoch_id):
        delta = changelog_reduce(batch_df)
        if state_paths:
            prev = spark.read.parquet(state_paths[-1])
            new = changelog_merge(prev, delta)
        else:
            new = delta
        out = str(state_root / f"e{epoch_id}")
        new.write.mode("overwrite").parquet(out)
        state_paths.append(out)

    write_changelog(str(src), "b1.parquet", B1)
    q = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        tombstoned = spark.read.parquet(state_paths[-1])
        write_changelog(str(src), "b2.parquet", B2)
        q.processAllAvailable()
        # tombstone RETAINED in state (publish would drop it) ...
        mid = spark.read.parquet(state_paths[-1])
        assert mid.filter("user_id = 2").count() == 1
        assert (
            changelog_publish(mid).filter("user_id = 2").count() == 0
        ), "tombstoned key must not publish"
        write_changelog(str(src), "b3.parquet", B3)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        map(tuple, changelog_publish(spark.read.parquet(state_paths[-1])).collect())
    )
    allrows = spark.createDataFrame(
        [(r[0], r[1].to_pydatetime(), r[2], r[3], r[4]) for r in B1 + B2 + B3],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    want = sorted(map(tuple, changelog_publish(changelog_reduce(allrows)).collect()))
    assert got == want and len(got) == 3  # u2 resurrected by B3's view


def test_s8_stream_static_enrich(spark, tmp_path):
    """S8: stream-static enrichment join — the zero-state streaming join
    class. A file-source event stream is left-joined to a STATIC segment
    dimension (Spark broadcasts it into every micro-batch; no state
    store involved) and aggregated into tumbling windows per segment.
    The batch-oracle twin is the s08_stream_static_enrich query key;
    here we assert the streaming engine computes the identical frame,
    including the dimension-miss -> 'UNKNOWN' degradation and rows
    arriving across separate micro-batches folding into one window."""
    d = str(tmp_path / "ev")
    os.makedirs(d)
    _write_batch_file(d, "f1.parquet", BATCH1)  # users 1, 2, 1

    dim = spark.createDataFrame(
        [(1, "AUTOMOBILE"), (2, "BUILDING")], "user_id bigint, seg string"
    )
    enriched = (
        _file_stream(spark, d)
        .join(F.broadcast(dim), "user_id", "left")
        .groupBy(
            F.window("ts", "1 hour").getField("start").alias("w"),
            F.coalesce("seg", F.lit("UNKNOWN")).alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s"))
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("s8_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: user 3 has NO dimension row (-> UNKNOWN); user 1's
        # second 10:00-hour event must fold into the existing window
        _write_batch_file(
            d,
            "f2.parquet",
            [(TS("2024-01-01 10:20:00"), 3, 10.0), (TS("2024-01-01 10:40:00"), 1, 4.0)],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        (r.w.strftime("%H:%M"), r.segment, r.n, r.s)
        for r in spark.sql("SELECT * FROM s8_sink").collect()
    )
    assert rows == [
        ("10:00", "AUTOMOBILE", 2, 5.0),   # 1.0 (b1) + 4.0 (b2)
        ("10:00", "BUILDING", 1, 2.0),
        ("10:00", "UNKNOWN", 1, 10.0),     # user 3: no dim row
        ("11:00", "AUTOMOBILE", 1, 3.0),
    ], rows


def test_s9_outer_interval_join_null_pads_on_watermark(spark, tmp_path):
    """S9: stream-stream LEFT OUTER interval join. Inner matches emit
    as they join; an unmatched view emits its NULL-padded row only
    after the purchase-side watermark passes view_ts + interval — the
    watermark-expiry semantics the batch key s09_outer_interval_join
    hash-checks against the oracle. The reference's streaming path has
    no joins at all (SURVEY.md S-table scope)."""

    def _write(d, name, col, rows):
        tbl = pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                col: pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(d, name))

    v_dir, p_dir = str(tmp_path / "views"), str(tmp_path / "purch")
    os.makedirs(v_dir)
    os.makedirs(p_dir)
    # batch 1: views by users 1 and 2 at 10:00; purchase by user 1 at
    # 10:10 (inside 30 min -> inner match). User 2 never converts.
    _write(v_dir, "f1.parquet", "v_user", [(TS("2024-01-01 10:00:00"), 1), (TS("2024-01-01 10:00:00"), 2)])
    _write(p_dir, "f1.parquet", "p_user", [(TS("2024-01-01 10:10:00"), 1)])

    views = (
        spark.readStream.schema("ts timestamp, v_user bigint")
        .parquet(v_dir)
        .withColumnRenamed("ts", "v_ts")
        .withWatermark("v_ts", "10 minutes")
    )
    purch = (
        spark.readStream.schema("ts timestamp, p_user bigint")
        .parquet(p_dir)
        .withColumnRenamed("ts", "p_ts")
        .withWatermark("p_ts", "10 minutes")
    )
    joined = views.join(
        purch,
        F.expr(
            "v_user = p_user AND "
            "p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 30 MINUTES"
        ),
        "leftOuter",
    ).select("v_user", "v_ts", "p_ts")
    q = (
        joined.writeStream.format("memory")
        .queryName("s9_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2 advances BOTH watermarks far past 10:30 (user 2's
        # expiry point); its own rows don't match each other
        _write(v_dir, "f2.parquet", "v_user", [(TS("2024-01-01 12:00:00"), 8)])
        _write(p_dir, "f2.parquet", "p_user", [(TS("2024-01-01 12:00:00"), 9)])
        q.processAllAvailable()
        # batch 3: watermark updates take effect at the NEXT trigger —
        # one more micro-batch flushes user 2's expired state
        _write(v_dir, "f3.parquet", "v_user", [(TS("2024-01-01 13:00:00"), 8)])
        _write(p_dir, "f3.parquet", "p_user", [(TS("2024-01-01 13:00:00"), 9)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r.v_user, r.p_ts.strftime("%H:%M") if r.p_ts else None)
        for r in spark.sql(
            "SELECT * FROM s9_sink WHERE v_user IN (1, 2)"
        ).collect()
    }
    # user 1's view converted (inner row); user 2's view null-padded
    # on watermark expiry, exactly once, never a phantom conversion
    assert rows == {(1, "10:10"), (2, None)}, rows
