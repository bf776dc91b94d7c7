"""Streaming operators in batch-equivalent form — SURVEY.md §2b S1-S6
(plus S7, the stream-stream interval join, beyond survey scope).

The reference's streaming semantics are count/wall-clock batching only
(/root/reference/proto.go:148); event time is merely carried as a column
(/root/reference/kafka.go:150-157). Our engine provides the Spark-native
streaming set; the driver hash-checks these batch equivalents over the
``events`` fixture, while ``tests/test_streaming.py`` exercises the same
operators through real ``readStream`` queries (watermarks, state).

Window columns are cast to STRING on both sides so timestamp rendering
can't drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.registry import query


# --------------------------------------------------------------------------
# S1 — tumbling window aggregation
@query(
    "s01_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS w,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS s
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="groupBy(window(ts,'1 hour')) in the streaming engine; batch "
    "equivalent via date_trunc. One shuffle on (window, event_type).",
)
def s01_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.window("ts", "1 hour").getField("start").cast("string").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .orderBy("w", "event_type")
    )


# --------------------------------------------------------------------------
# S2 — sliding window (1 hour window, 30 minute slide => each event in 2 windows)
@query(
    "s02_sliding_window",
    oracle="""
    WITH slid AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - (k * INTERVAL '30 minutes') AS w_start,
             value
      FROM events, (VALUES (0), (1)) offsets(k)
    )
    SELECT CAST(w_start AS VARCHAR) AS w, COUNT(*) AS n,
           ROUND(SUM(value), 2) AS s
    FROM slid GROUP BY 1 ORDER BY 1
    """,
    doc="window(ts, '1 hour', '30 minutes'); oracle replays each event into "
    "its two overlapping windows via a 2-row offsets join (SURVEY.md S2).",
)
def s02_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").getField("start").cast("string").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .orderBy("w")
    )


# --------------------------------------------------------------------------
# S3 — session window (5 minute gap) per user
@query(
    "s03_session_window",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), g AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM o
    )
    SELECT user_id,
           CAST(MIN(ts) AS VARCHAR) AS session_start,
           CAST(MAX(ts) + INTERVAL 5 MINUTE AS VARCHAR) AS session_end,
           COUNT(*) AS n
    FROM g GROUP BY user_id, grp
    ORDER BY user_id, session_start
    """,
    doc="session_window(ts,'5 minutes') per user_id; oracle is the classic "
    "gaps-and-islands LAG + cumulative-sum rewrite (SURVEY.md S3).",
)
def s03_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    sw = F.session_window("ts", "5 minutes")
    return (
        t["events"]
        .groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("session_window.start").cast("string").alias("session_start"),
            F.col("session_window.end").cast("string").alias("session_end"),
            "n",
        )
        .orderBy("user_id", "session_start")
    )


# --------------------------------------------------------------------------
# S5 — streaming dedup (batch equivalent: distinct count on the dedup key)
@query(
    "s05_stream_dedup",
    oracle="SELECT COUNT(DISTINCT event_id) AS n FROM events",
    doc="dropDuplicates(['event_id']) with watermark in the streaming "
    "engine (tests/test_streaming.py); batch equivalent distinct count.",
)
def s05_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["events"]
        .dropDuplicates(["event_id"])
        .agg(F.count(F.lit(1)).alias("n"))
    )


# S4 (watermark/late data) and S6 (arbitrary stateful agg) have no batch
# oracle — they are engine-level tests in tests/test_streaming.py, per
# SURVEY.md §2b ("engine-level test ... no batch oracle").


# --------------------------------------------------------------------------
# S7 — stream-stream interval join, batch-equivalent form. The real
# streaming twin (two watermarked streams, time-interval condition,
# bounded state) runs in tests/test_streaming.py::
# test_s7_stream_stream_interval_join; this key hash-checks the JOIN
# SEMANTICS the streaming query computes: the view -> purchase funnel
# within a 30-minute attribution window per user.
@query(
    "s07_funnel_join",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
           CAST(p.ts AS VARCHAR) AS purchase_ts
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
    ORDER BY purchase_id, view_id
    """,
    doc="Stream-stream interval join semantics (funnel attribution: "
    "each purchase matched to same-user views in the prior 30 min) in "
    "batch form — an equi join on user_id with the interval as a "
    "residual predicate, exactly the condition the watermarked "
    "streaming twin evaluates against bounded state.",
)
def s07_funnel_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the join is HASH-keyed on user_id — the
    interval is a residual filter, never a nested-loop condition — so
    both sides shuffle once on the same key (or co-locate if events are
    bucketed by user at rest, the x06 layout). In the streaming form
    the same plan holds against state stores: watermarks bound each
    side's state to the 30-minute window, so state size tracks the
    event rate, not history."""
    t = load_views(spark, sf_dir)
    ev = t["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "purchase_id",
            "view_id",
            "user_id",
            F.col("p_ts").cast("string").alias("purchase_ts"),
        )
        .orderBy("purchase_id", "view_id")
    )


# --------------------------------------------------------------------------
# S8 — stream-static enrichment join, batch-equivalent form. The third
# Structured Streaming join class (after S7's stream-stream and the
# windowed aggs): a fact stream enriched against a slowly-changing
# dimension held as a STATIC DataFrame. Spark evaluates stream-static
# joins with ZERO state — the static side is broadcast to every task
# and each micro-batch joins map-side — so this is the canonical
# "enrich then aggregate" ingest topology. The real readStream twin
# runs in tests/test_streaming.py::test_s8_stream_static_enrich; this
# key hash-checks the join + window semantics that query computes.
@query(
    "s08_stream_static_enrich",
    oracle="""
    SELECT CAST(date_trunc('hour', e.ts) AS VARCHAR) AS w,
           COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
           COUNT(*) AS n, ROUND(SUM(e.value), 2) AS s
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Stream-static enrichment: events left-joined to the customer "
    "dimension (broadcast — the stream-static join plan, zero state) "
    "then tumbling-window aggregated per market segment. Unmatched "
    "users degrade to segment 'UNKNOWN' (stream-side left outer is "
    "the supported streaming form).",
)
def s08_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the dimension is broadcast — the fact
    stream NEVER shuffles for the join (identical to Spark's own
    stream-static execution, where each micro-batch joins against the
    replicated static side map-side). The only exchange is the partial
    -> final window aggregation on (window, segment), whose input is
    already reduced by map-side combine. A dimension too big to
    broadcast is the x06 co-bucketed layout's case, not this one.
    Reference analog: none — the reference's streaming path has no
    join (proto.go:148 batches by count/wall-clock only); this is
    engine-native capability beyond it (SURVEY.md §2b S-table scope)."""
    t = load_views(spark, sf_dir)
    dim = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        t["events"]
        .join(F.broadcast(dim), "user_id", "left")
        .groupBy(
            F.window("ts", "1 hour").getField("start").cast("string").alias("w"),
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .orderBy("w", "segment")
    )


# --------------------------------------------------------------------------
# S9 — stream-stream LEFT OUTER interval join, batch-equivalent form.
# The outer variant of S7: every view is attributed to same-user
# purchases within the following 30 minutes, and views that never
# convert emit a NULL-padded row. In the streaming form Spark holds
# view-side state until the purchase-side watermark passes
# view_ts + 30min, THEN emits the null-padded row — outer results are
# late by construction, the canonical watermark-expiry semantics the
# real readStream twin (tests/test_streaming.py::
# test_s9_outer_interval_join_null_pads_on_watermark) pins. NULL
# purchase ids surface as -1 in both engines so the ORDER BY is
# engine-neutral (Spark sorts NULLS FIRST, DuckDB NULLS LAST).
@query(
    "s09_outer_interval_join",
    oracle="""
    SELECT v.event_id AS view_id, v.user_id,
           CAST(v.ts AS VARCHAR) AS view_ts,
           COALESCE(p.event_id, -1) AS purchase_id,
           CAST(CASE WHEN p.event_id IS NULL THEN 0 ELSE 1 END AS INTEGER)
             AS converted
    FROM events v LEFT JOIN events p
      ON v.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    WHERE v.event_type = 'view'
    ORDER BY view_id, purchase_id
    """,
    doc="Stream-stream LEFT OUTER interval join semantics (conversion "
    "attribution: every view paired with same-user purchases in the "
    "next 30 min, unconverted views null-padded) in batch form — the "
    "outer twin of s07, with the watermark-expiry emission pinned by "
    "the real readStream engine test.",
)
def s09_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): identical exchange discipline to s07 —
    the join hash-keys on user_id, the interval stays a residual
    predicate, each side shuffles once (zero times if bucketed by
    user at rest, the x06 layout). Streaming twin state: the outer
    side's state store holds only rows younger than watermark +
    interval, so memory tracks event rate; the null-padded emission on
    expiry is exactly how unconverted views leave state. Reference
    analog: none — the reference's streaming path has no joins
    (SURVEY.md S-table scope)."""
    t = load_views(spark, sf_dir)
    ev = t["events"]
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
            "left",
        )
        .select(
            "view_id",
            "user_id",
            F.col("v_ts").cast("string").alias("view_ts"),
            F.coalesce(F.col("p_id"), F.lit(-1)).alias("purchase_id"),
            F.col("p_id").isNotNull().cast("int").alias("converted"),
        )
        .orderBy("view_id", "purchase_id")
    )
