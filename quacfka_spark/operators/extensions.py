"""Extension operators beyond the reference surface: as-of join and
deterministic stratified sampling.

- **As-of join** (x01): the canonical "operator Spark lacks" — join each
  event to the most recent prior event of another stream. The naive
  formulation is a range join (quadratic blow-up per user); the
  distributed pattern is union-the-streams + one window per partition
  key: a single shuffle on user_id, then a sorted scan per user carrying
  the last-seen view via ``last(..., ignorenulls)``. At 100 TB this is
  shuffle-optimal (one exchange, no per-row probing) and is exactly how
  ASOF is implemented inside columnar engines.

- **Stratified sampling** (x02): training-data pipelines rebalance
  corpora (downsample the dominant language) with DETERMINISTIC
  per-row hashing, never ``rand()``: task retries and re-runs must pick
  identical rows (the same idempotency argument as the salted join,
  functions/skew.py). Single scan, no shuffle; the sample decision is
  a pure function of the key, portable across engines (md5 on both
  sides of the oracle).

Reference relation: neither exists in quacfka (its SQL surface delegated
such queries to DuckDB, SURVEY.md §2b); both are declared-query
extensions with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.functions.text import md5_frac, md5_frac_sql
from quacfka_spark.registry import query


@query(
    "x01_asof_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, ts, event_type, value FROM events
      WHERE event_type IN ('view', 'click')),
    c AS (SELECT * FROM ev WHERE event_type = 'click'),
    v AS (SELECT * FROM ev WHERE event_type = 'view'),
    j AS (
      SELECT c.event_id AS click_id, c.user_id,
             v.event_id AS view_id, ROUND(v.value, 2) AS view_value,
             ROW_NUMBER() OVER (PARTITION BY c.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM c LEFT JOIN v
        ON v.user_id = c.user_id
       AND (v.ts < c.ts OR (v.ts = c.ts AND v.event_id < c.event_id)))
    SELECT click_id, user_id, view_id, view_value
    FROM j WHERE rn = 1 ORDER BY click_id
    """,
    doc="As-of join: each click paired with the user's most recent "
    "strictly-prior view ((ts, event_id) lexicographic order makes ties "
    "deterministic). Implemented as union + window last(ignorenulls) — "
    "ONE shuffle on user_id, no range join. The oracle is the "
    "independent row_number-over-range-join formulation.",
)
def x01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    ev = (
        t["events"]
        .filter(F.col("event_type").isin("view", "click"))
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_view = F.col("event_type") == "view"
    view_id = F.last(F.when(is_view, F.col("event_id")), ignorenulls=True).over(w)
    view_value = F.last(F.when(is_view, F.col("value")), ignorenulls=True).over(w)
    # both window expressions in ONE projection so they extract into a
    # single Window operator (chained withColumn produced two)
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            view_id.alias("view_id"),
            F.round(view_value, 2).alias("view_value"),
        )
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"), "user_id", "view_id", "view_value"
        )
        .orderBy("click_id")
    )


@query(
    "x02_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {md5_frac_sql("doc_id")}
          < CASE WHEN lang = 'en' THEN 0.10 ELSE 0.50 END
    ORDER BY doc_id
    """,
    doc="Deterministic stratified sampling: keep 10% of the dominant "
    "language, 50% of the rest, decided by a pure md5 hash of doc_id "
    "(identical under retries/re-runs; same rows in Spark and DuckDB). "
    "Single scan, no shuffle.",
)
def x02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    frac = md5_frac("doc_id")
    rate = F.when(F.col("lang") == "en", 0.10).otherwise(0.50)
    return (
        t["documents"].select("doc_id", "lang").filter(frac < rate).orderBy("doc_id")
    )


_BAND_US = 3600 * 1_000_000  # 1-hour band in microseconds


@query(
    "x03_range_band_join",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         v AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'view')
    SELECT c.event_id AS click_id,
           COUNT(v.event_id) AS n_views,
           ROUND(SUM(v.value), 2) AS sum_value
    FROM c JOIN v
      ON v.user_id = c.user_id
     AND v.ts >= c.ts - INTERVAL 1 HOUR
     AND v.ts < c.ts
    GROUP BY c.event_id ORDER BY click_id
    """,
    doc="Banded range join: views within the hour before each click, "
    "per user. The naive plan is a non-equi (BNLJ) join — quadratic per "
    "user. The 100 TB plan here buckets event time into band-width cells "
    "(exact integer microseconds, unix_micros) and EXPLODES the click "
    "side to its two candidate cells, turning the range predicate into "
    "an equi hash join on (user_id, bucket) + a cheap residual filter: "
    "one shuffle, candidate set bounded by band width, no BNLJ. The "
    "oracle is the direct interval-predicate formulation.",
)
def x03_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    ev = t["events"].select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("us").alias("c_us"),
            F.floor(F.col("us") / _BAND_US).alias("b"),
        )
        .select(
            "click_id", "user_id", "c_us",
            F.explode(F.array(F.col("b") - 1, F.col("b"))).alias("bucket"),
        )
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("us").alias("v_us"),
        "value",
        F.floor(F.col("us") / _BAND_US).alias("bucket"),
    )
    return (
        clicks.join(views, ["user_id", "bucket"])
        .filter(
            (F.col("v_us") >= F.col("c_us") - F.lit(_BAND_US))
            & (F.col("v_us") < F.col("c_us"))
        )
        .groupBy("click_id")
        .agg(
            F.count("view_id").alias("n_views"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("click_id")
    )


@query(
    "x04_time_rollup",
    oracle="""
    SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS gran,
           COALESCE(h, d) AS bucket, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS s
    FROM (SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
                 event_type, value
          FROM events)
    GROUP BY GROUPING SETS ((d, event_type), (h, event_type))
    ORDER BY gran, bucket, event_type
    """,
    doc="Hypertable-style multi-granularity rollup: hourly AND daily "
    "continuous aggregates of the event stream in ONE scan, one Expand, "
    "one aggregation shuffle (GROUPING SETS) — not one pass per "
    "granularity. At 100 TB this is the materialized-rollup maintenance "
    "query run per ingest window (the reference delegates such "
    "aggregate-to-table queries to DuckRunner, duck.go:70-72).",
)
def x04_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS gran,
               COALESCE(h, d) AS bucket, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS s
        FROM (SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
                     event_type, value
              FROM events)
        GROUP BY GROUPING SETS ((d, event_type), (h, event_type))
        ORDER BY gran, bucket, event_type
        """
    )


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "x05_column_profile",
    oracle=" UNION ALL ".join(
        f"""
        (SELECT '{c}' AS column_name,
                COUNT(*) - COUNT({c}) AS n_nulls,
                COUNT(DISTINCT {c}) AS n_distinct,
                ROUND(MIN(CAST({c} AS DOUBLE)), 2) AS min_v,
                ROUND(MAX(CAST({c} AS DOUBLE)), 2) AS max_v
         FROM orders)"""
        for c in _PROFILE_COLS
    )
    + " ORDER BY column_name",
    doc="ANALYZE-style column profiling (null count, distinct count, "
    "min/max) for pipeline-health checks — computed for all columns in "
    "ONE scan and one aggregation (12 aggregates share the pass), then "
    "exploded to long (column_name, stats) rows after the aggregate. "
    "The oracle is the naive one-scan-per-column UNION ALL; at 100 TB "
    "the single-pass form reads the table once instead of N times, and "
    "the distinct counts would switch to approx_count_distinct "
    "(documented trade: exact here for the hash check).",
)
def x05_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.round(F.min(F.col(c).cast("double")), 2).alias(f"{c}__min"),
            F.round(F.max(F.col(c).cast("double")), 2).alias(f"{c}__max"),
        ]
    row = t["orders"].agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
        )
        for c in _PROFILE_COLS
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


# --------------------------------------------------------------------------
# x06 — the one-time-shuffle-at-ingest layout strategy, demonstrated
_BUCKETS = 8


def _ensure_cobucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders/customer co-bucketed on the customer key (once per
    (catalog, sf_dir)) — the ingest-time layout write_bucketed
    advertises. Reuse requires BOTH the session-catalog entry (bucket
    specs live in the in-memory catalog; a fresh session must rewrite)
    AND mtime freshness vs the source fixture (artifact_fresh — a
    fixture regenerated in place mid-session must not be served from
    stale bucketed copies). Returns the two managed-table names."""
    import os
    import shutil

    from quacfka_spark.layout import (
        artifact_dir,
        artifact_fresh,
        table_location,
        write_bucketed,
    )

    sf_dir, wh, tag = artifact_dir(spark, sf_dir)
    names = (f"orders_bkt_{tag}", f"customer_bkt_{tag}")
    srcs = (
        os.path.join(sf_dir, "orders.parquet"),
        os.path.join(sf_dir, "customer.parquet"),
    )

    def _fresh(n: str, src: str) -> bool:
        if not spark.catalog.tableExists(n):
            return False
        # freshness must be checked at the table's CATALOG-resolved
        # location, not warehouse+name string-join — a non-default
        # current database lands tables under db.db/tbl, where the
        # joined path never exists and reuse would always read stale
        loc = table_location(spark, n)
        return bool(loc) and artifact_fresh(os.path.join(loc, "_SUCCESS"), src)

    reusable = all(_fresh(n, src) for n, src in zip(names, srcs))
    if not reusable:
        # drop stale catalog entries AND surviving on-disk locations (a
        # previous session's dirs outlive the in-memory catalog, and
        # saveAsTable refuses with LOCATION_ALREADY_EXISTS otherwise)
        for n in names:
            loc = (
                table_location(spark, n)
                if spark.catalog.tableExists(n)
                else None
            )
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(loc or os.path.join(wh, n), ignore_errors=True)
        t = load_views(spark, sf_dir)
        write_bucketed(
            t["orders"].withColumnRenamed("o_custkey", "custkey"),
            names[0],
            ["custkey"],
            buckets=_BUCKETS,
        )
        write_bucketed(
            t["customer"].withColumnRenamed("c_custkey", "custkey"),
            names[1],
            ["custkey"],
            buckets=_BUCKETS,
        )
    return names


@query(
    "x06_bucketed_join_agg",
    oracle="""
    SELECT c.c_custkey AS custkey,
           c.c_mktsegment AS mktsegment,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2 ORDER BY custkey
    """,
    doc="Q8's join+agg run over CO-BUCKETED tables (layout.py): orders "
    "and customer are hash-bucketed on the customer key at write time, "
    "so the fact-to-dim join needs NO exchange on either side and the "
    "per-customer aggregate reuses the same bucket distribution — the "
    "only shuffle-ish node left is the final presentation sort. At "
    "100 TB this converts the every-query shuffle of the fact table "
    "into a one-time cost paid at ingest; "
    "tests/test_plans.py::test_x06_bucketed_plan_has_no_hash_exchange "
    "pins the zero-Exchange plan with broadcast disabled (the big-big "
    "configuration). The oracle runs the same query on the unbucketed "
    "views — layout must never change results.",
)
def x06_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_t, customer_t = _ensure_cobucketed(spark, sf_dir)
    o = spark.table(orders_t).select("custkey", "o_orderkey", "o_totalprice")
    c = spark.table(customer_t).select("custkey", "c_mktsegment")
    return (
        c.join(o, "custkey", "left")
        .groupBy("custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
        .select(
            "custkey",
            F.col("c_mktsegment").alias("mktsegment"),
            "n_orders",
            "total_spend",
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# x07: partition-pruned rollup — write_partitioned's demonstration key,
# the directory-pruning sibling of x06's bucketing demo. The events
# fixture is rewritten ONCE per (session, sf_dir) partitioned by
# event_type; the filtered rollup then scans only the matching
# directory (PartitionFilters in the plan — tests/test_plans.py).


def _ensure_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """Write events partitioned by event_type (once per (tmp, sf_dir));
    returns the parquet path. The ts column is normalized to plain
    TIMESTAMP at write time so the partitioned copy reads identically
    under every fixture flavor."""
    import os

    from quacfka_spark.layout import artifact_dir, artifact_fresh, write_partitioned

    # under the session's warehouse dir, like x06's bucketed tables —
    # the layout artifacts live wherever the engine's managed data does
    sf_dir, wh, tag = artifact_dir(spark, sf_dir)
    path = os.path.join(wh, f"qs_events_part_{tag}")
    # staleness guard (the x06 "previous session's dirs survive on disk"
    # hazard): a partitioned copy older than the source fixture means
    # the fixture was regenerated in place — rewrite, don't reuse
    if not artifact_fresh(
        os.path.join(path, "_SUCCESS"), os.path.join(sf_dir, "events.parquet")
    ):
        t = load_views(spark, sf_dir)
        write_partitioned(t["events"], path, ["event_type"])
    return path


@query(
    "x07_partition_pruned_rollup",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Hourly rollup of one event type over a directory-partitioned "
    "copy of events (layout.write_partitioned at ingest): the "
    "event_type predicate prunes at the DIRECTORY level — the scan "
    "reads ~1/|event_types| of the data before a single row is "
    "decoded. Results identical to the unpartitioned oracle; layout "
    "must never change results.",
)
def x07_partition_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): partition pruning is the cheapest scan
    reduction there is — a catalog/listing operation, zero I/O on
    non-matching partitions. The rollup itself is one partial-agg
    exchange on (event_type, hour) over the pruned scan. Partition
    column choice: low-cardinality filter keys (event date, type,
    region); never high-cardinality ids (small-file explosion —
    bucketing is the id-key tool, x06)."""
    path = _ensure_partitioned(spark, sf_dir)
    ev = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type", "hour_ts")
    )


# --------------------------------------------------------------------------
# x08: temperature-flattened mixture resampling — the multilingual /
# multi-source mixing step of a pretraining pipeline (exponential
# smoothing of source shares, XLM-R style: Conneau et al. 2020
# arXiv:1911.02116 §3.1, alpha-smoothed sampling p_l^alpha). Each
# language's keep-rate is derived FROM THE DATA (its token share), then
# applied with the same deterministic md5-fraction sampler as x02, so
# the operator is reproducible under retries and bit-identical in the
# oracle.
_X08_ALPHA = 0.3  # temperature: 1.0 = natural mix, 0.0 = uniform mix


@query(
    "x08_mix_resample",
    oracle=f"""
    WITH tok AS (
      SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS tok
      FROM documents GROUP BY 1),
    s AS (SELECT lang, tok / SUM(tok) OVER () AS p FROM tok),
    r AS (
      SELECT lang,
             ROUND(POW(p, {_X08_ALPHA} - 1)
                   / MAX(POW(p, {_X08_ALPHA} - 1)) OVER (), 4) AS rate
      FROM s)
    SELECT d.doc_id, d.lang, r.rate
    FROM documents d JOIN r USING (lang)
    WHERE {md5_frac_sql("d.doc_id")} < r.rate
    ORDER BY d.doc_id
    """,
    doc="Temperature-flattened mixture resampling: per-language keep "
    "rates are p_l^(alpha-1) normalized so the rarest language keeps "
    "everything (alpha=0.3 — heavy languages downsampled toward a "
    "flatter mix), applied via the deterministic md5-fraction sampler. "
    "Rates are DERIVED from corpus token mass, not configured — the "
    "agg and the sampling run in one job.",
)
def x08_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the rate table is |languages| rows. The
    share agg is one partial-agg exchange keyed on lang (map-side
    combine reduces each task to its local lang counts); the total and
    max-ratio reductions run as unpartitioned windows over that
    |languages|-row result (one singleton-window exchange of a few
    rows — the oracle's OVER () shape); the keep decision is a
    broadcast join + codegen filter on the scan, so no exchange before
    the presentation sort carries a document row. Skew-immune: the
    heaviest language costs exactly one partial-agg cell per task."""
    from pyspark.sql.window import Window

    t = load_views(spark, sf_dir)
    d = t["documents"].select("doc_id", "lang", "n_chars")
    # one lang agg, then unpartitioned windows over the |languages|-row
    # result (the oracle's OVER () shape) — NOT chained crossJoins with
    # 1-row aggregates, which made Catalyst recompute the agg subtree
    # once per branch (4 corpus scans / 8 exchanges in the audited plan)
    tok = d.groupBy("lang").agg(F.sum("n_chars").cast("double").alias("tok"))
    everything = Window.partitionBy()
    p = F.col("tok") / F.sum("tok").over(everything)
    shares = tok.select("lang", p.alias("p"))
    ratio = F.pow(F.col("p"), F.lit(_X08_ALPHA - 1))
    rates = shares.select(
        "lang", F.round(ratio / F.max(ratio).over(everything), 4).alias("rate")
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(md5_frac("doc_id") < F.col("rate"))
        .select("doc_id", "lang", "rate")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# x09 — Z-order (Morton) clustering, the third at-rest layout demo next
# to x06's bucketing and x07's directory partitioning: events rewritten
# ONCE per (session, sf_dir) sorted by the bit-interleaved
# (user_id, unix(ts)) Z-value, so a 2-dim range predicate can skip most
# files via ordinary parquet min/max stats.
_X09_U_LO, _X09_U_HI = 2, 4
_X09_T_LO, _X09_T_HI = "2024-01-10 00:00:00", "2024-01-15 00:00:00"


def _ensure_zordered(spark: SparkSession, sf_dir: str) -> str:
    """Write events Z-ordered on (user_id, unix(ts)) once per
    (warehouse, sf_dir), under the shared stale-artifact rule (x06/x07's
    mtime-freshness + completion-marker convention). Returns the path."""
    import os

    from quacfka_spark.layout import artifact_dir, artifact_fresh, write_zordered

    sf_dir, wh, tag = artifact_dir(spark, sf_dir, extra="zorder-v1")
    path = os.path.join(wh, f"qs_events_z_{tag}")
    if not artifact_fresh(
        os.path.join(path, "_SUCCESS"), os.path.join(sf_dir, "events.parquet")
    ):
        t = load_views(spark, sf_dir)
        ev = t["events"].withColumn("ts_unix", F.unix_timestamp("ts"))
        write_zordered(ev, path, "user_id", "ts_unix")
    return path


@query(
    "x09_zorder_scan",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE user_id BETWEEN {_X09_U_LO} AND {_X09_U_HI}
      AND ts >= TIMESTAMP '{_X09_T_LO}' AND ts < TIMESTAMP '{_X09_T_HI}'
    GROUP BY event_type ORDER BY event_type
    """,
    doc="2-dim range rollup over a Z-ORDERED copy of events "
    "(layout.write_zordered at ingest): rows are clustered by the "
    "bit-interleaved (user_id, unix(ts)) Morton code, so every file's "
    "min/max envelope is compact on BOTH dimensions and the pushed "
    "user_id + ts range filters skip most files/row-groups via "
    "ordinary parquet stats — where a single-column time sort prunes "
    "only on time. The same one-time-cost-at-ingest story as x06's "
    "bucketing, for multi-dimensional range predicates (the "
    "Delta/Iceberg OPTIMIZE ZORDER technique, expressed as pure "
    "Catalyst bit ops). Results identical to the unclustered oracle; "
    "layout must never change results.",
)
def x09_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the Z-value is a codegen bit-op
    expression; layout cost is one min/max agg + one range-partitioned
    sorted write at ingest. Every later 2-dim range query prunes at
    file/row-group granularity with NO index structure to maintain —
    parquet stats do the work. File-skipping effectiveness vs a
    time-sorted layout is asserted from the actual parquet footers in
    tests/test_layout.py."""
    from quacfka_spark.catalog import normalize_ts

    path = _ensure_zordered(spark, sf_dir)
    ev = normalize_ts(spark.read.parquet(path))
    return (
        ev.filter(
            (F.col("user_id") >= _X09_U_LO)
            & (F.col("user_id") <= _X09_U_HI)
            & (F.col("ts") >= F.lit(_X09_T_LO).cast("timestamp"))
            & (F.col("ts") < F.lit(_X09_T_HI).cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# x10 — small-file compaction (the streaming-sink maintenance pass)
_X10_FRAG_FILES = 96  # simulated micro-batch fragmentation
_X10_OUT_FILES = 6
_X10_T_LO, _X10_T_HI = "2024-01-05 00:00:00", "2024-01-09 00:00:00"


def _ensure_compacted(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write a deliberately fragmented copy of events (96 tiny files —
    the shape a per-epoch streaming sink leaves behind, D13/D15) and a
    compacted copy (6 files, time-clustered via compact_files), once
    per (warehouse, sf_dir) under the shared stale-artifact rule.
    Returns (fragmented_path, compacted_path)."""
    import os

    from quacfka_spark.layout import (
        artifact_dir,
        artifact_fresh,
        compact_files,
        touch_done,
    )

    sf_dir, wh, tag = artifact_dir(spark, sf_dir, extra="compact-v1")
    frag = os.path.join(wh, f"qs_events_frag_{tag}")
    comp = os.path.join(wh, f"qs_events_compact_{tag}")
    src = os.path.join(sf_dir, "events.parquet")
    if not (
        artifact_fresh(os.path.join(frag, "_SUCCESS"), src)
        and artifact_fresh(os.path.join(comp, "_SUCCESS"), src)
    ):
        t = load_views(spark, sf_dir)
        ev = t["events"]
        # round-robin exchange: every file tiny AND spanning the whole
        # time range — worst case for both open cost and stats pruning
        ev.repartition(_X10_FRAG_FILES).write.mode("overwrite").parquet(frag)
        touch_done(frag)  # two-marker freshness contract, like compact_files
        compact_files(
            spark.read.parquet(frag), comp, files=_X10_OUT_FILES, sort_by=["ts"]
        )
    return frag, comp


@query(
    "x10_compact_scan",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '{_X10_T_LO}' AND ts < TIMESTAMP '{_X10_T_HI}'
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Time-range rollup over a COMPACTED copy of a deliberately "
    "fragmented events table (96 micro-batch-sized files -> 6 "
    "time-clustered files via layout.compact_files). Results must be "
    "identical to the unfragmented oracle — compaction is a pure "
    "layout rewrite. The payoff is read-side: each compacted file "
    "owns a compact ts range, so the pushed time filter skips most "
    "files on footer stats, and per-file open overhead drops 16x; "
    "tests/test_layout.py asserts both from the actual parquet "
    "footers. 100 TB: this is the OPTIMIZE pass a streaming sink "
    "schedules per partition; one range exchange, no global sort.",
)
def x10_compact_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design: compaction cost is one repartitionByRange exchange
    over the rewritten slice only (per day/partition in production,
    never the whole table), and the read path needs no index — parquet
    min/max stats on the clustered key do the pruning (reference
    parity: the reference's rotated duckdb files are exactly such
    small-file output, /root/reference/README.md:170)."""
    from quacfka_spark.catalog import normalize_ts

    _, comp = _ensure_compacted(spark, sf_dir)
    ev = normalize_ts(spark.read.parquet(comp))
    return (
        ev.filter(
            (F.col("ts") >= F.lit(_X10_T_LO).cast("timestamp"))
            & (F.col("ts") < F.lit(_X10_T_HI).cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# X11 — incremental changelog merge (CDC upsert/delete snapshot maintenance)
_X11_CUTOFF = "2024-01-22"


@query(
    "x11_changelog_merge",
    oracle=f"""
    WITH r AS (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events,
             SUM(value) OVER (PARTITION BY user_id) AS sv
      FROM events)
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           ROUND(value, 2) AS last_value,
           CAST(n_events AS BIGINT) AS n_events,
           ROUND(sv, 2) AS sum_value
    FROM r WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
    doc="Incremental snapshot maintenance (the MERGE INTO / CDC-upsert "
    "pattern): the event stream is a changelog keyed by user_id, "
    "'error' rows are tombstones, and the live snapshot is "
    "latest-wins per key plus additively mergeable stats. The Spark "
    "side does it INCREMENTALLY — reduce the pre-cutoff history and "
    "the post-cutoff delta separately, then merge the two partial "
    "snapshots (argmax re-max + count/sum re-add) — exactly how a "
    "100 TB snapshot is maintained without rescanning history: the "
    "base reduce is amortized across ingests and only the delta is "
    "new work each cycle. Tombstoned keys STAY in the merged state "
    "(a later upsert must resurrect them); the delete filter applies "
    "only on publish. The oracle recomputes the snapshot from the "
    "full history in one window pass - agreement proves the "
    "merge is lossless.",
)
def x11_changelog_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design: each reduce is ONE partial+final aggregation on
    the key with argmax as max-of-struct ordered by (ts, event_id) — no
    window over raw rows. The struct-valued max buffer forces Spark's
    sort-based agg fallback (SortAggregate: a map-side LOCAL sort by
    key, no extra exchange), which is the right trade at 100 TB: the
    partial agg still reduces each task to one row per key BEFORE the
    shuffle, where the window formulation would shuffle every raw row.
    The merge re-agg then runs with ZERO additional exchange — both
    reduced inputs are already hash-partitioned on user_id, and Spark
    stacks partial+final directly over the co-partitioned union
    (plan-pinned). The reference delegates snapshot queries to DuckDB
    (/root/reference/duck.go:70-72); the incremental-merge shape is the
    extension."""
    t = load_views(spark, sf_dir)
    ev = t["events"]
    cutoff = F.lit(_X11_CUTOFF).cast("timestamp")
    base = changelog_reduce(ev.filter(F.col("ts") < cutoff))
    delta = changelog_reduce(ev.filter(F.col("ts") >= cutoff))
    return changelog_publish(changelog_merge(base, delta)).orderBy("user_id")


def changelog_reduce(df: DataFrame) -> DataFrame:
    """Reduce a changelog slice to ONE state row per key: latest-wins
    argmax as max-of-struct ordered by (ts, event_id) + additively
    mergeable count/sum. Public building block of x11's incremental
    snapshot and the streaming (foreachBatch) form, where each
    micro-batch delta is reduced with this exact aggregate before
    merging into the state at rest (tests/test_streaming.py::s08)."""
    return df.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("last"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sv"),
    )


def changelog_merge(*snapshots: DataFrame) -> DataFrame:
    """Merge reduced snapshots: re-max the argmax struct, re-add the
    additive stats. Associative and commutative, so any number of
    epoch-reduced states merge in one agg — with inputs already
    hash-partitioned on the key, Spark stacks partial+final over the
    co-partitioned union with ZERO extra exchange (plan-pinned in
    tests/test_plans.py)."""
    out = snapshots[0]
    for s in snapshots[1:]:
        out = out.unionByName(s)
    return out.groupBy("user_id").agg(
        F.max("last").alias("last"),
        F.sum("n_events").alias("n_events"),
        F.sum("sv").alias("sv"),
    )


def changelog_publish(state: DataFrame) -> DataFrame:
    """Publish view of a merged state: drop tombstoned keys (state
    RETAINS them so later upserts resurrect; the filter is publish-time
    only) and flatten the argmax struct to columns."""
    return state.filter(F.col("last.event_type") != "error").select(
        "user_id",
        F.col("last.ts").alias("last_ts"),
        F.col("last.event_type").alias("last_type"),
        F.round(F.col("last.value"), 2).alias("last_value"),
        "n_events",
        F.round(F.col("sv"), 2).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# X12 — time-series gap fill + forward fill (hypertable resample)
@query(
    "x12_gap_fill",
    oracle="""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             COUNT(*) AS n, ROUND(SUM(value), 2) AS raw_sum
      FROM events GROUP BY 1, 2),
    span AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi
             FROM agg GROUP BY 1),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM span),
    f AS (
      SELECT s.event_type, s.hr, COALESCE(a.n, 0) AS n, a.raw_sum
      FROM spine s LEFT JOIN agg a USING (event_type, hr))
    SELECT event_type, hr, CAST(n AS BIGINT) AS n,
           last_value(raw_sum IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY hr) AS sum_filled,
           (raw_sum IS NULL) AS is_gap
    FROM f ORDER BY event_type, hr
    """,
    doc="Gap fill + forward fill (the TimescaleDB time_bucket_gapfill / "
    "locf op): hourly rollup per series, a generated dense hour spine "
    "per series over its own [min, max] span, missing buckets joined "
    "in as explicit zero-count gap rows, and the last observed hourly "
    "total carried forward with last(ignorenulls) (a SUM, not an AVG: "
    "sums of 2-decimal inputs stay on the 0.01 grid so cross-engine "
    "rounding is stable, where an average of a 2-row bucket lands "
    "exactly on the .005 boundary both engines round differently). The spine is "
    "GENERATED (|series| rows exploding to buckets), never scanned, so "
    "gap detection costs a |series x buckets| hash join against the "
    "already-aggregated rollup — raw events are touched exactly once.",
)
def x12_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design: the rollup is one partial+final agg on (series,
    bucket); everything after runs on aggregated rows. The forward-fill
    window partitions on the series key — 5 types in the fixture, but
    the production shape is millions of independent series (one per
    metric/device), so the window parallelizes on the same key the
    rollup already shuffled on. TimescaleDB's gapfill is the reference
    analog of this rollup maintenance (the reference delegates its
    aggregate-to-table queries to DuckDB, /root/reference/duck.go:70-72)."""
    t = load_views(spark, sf_dir)
    agg = (
        t["events"]
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"), "value")
        .groupBy("event_type", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("raw_sum"),
        )
    )
    spine = (
        agg.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("hr"),
        )
    )
    return (
        spine.join(agg, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("raw_sum", ignorenulls=True)
            .over(
                Window.partitionBy("event_type")
                .orderBy("hr")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("sum_filled"),
            F.col("raw_sum").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "hr")
    )


# --------------------------------------------------------------------------
# x13: dynamic partition pruning — the RUNTIME sibling of x07's static
# pruning demo and the third leg of the layout triptych (x06 bucketing,
# x07 static pruning, x13 runtime pruning). x07 prunes on a literal the
# planner can see; x13 prunes on a predicate only known after evaluating
# the DIM SIDE of a join (here: "event types whose category is
# 'engagement'"), which is the shape every star-schema fact scan has at
# 100 TB — the fact filter lives in a dimension attribute, not in the
# fact table. Spark's InjectRuntimeFilter/DPP rule turns the broadcast
# dim into a directory-listing filter on the partitioned fact scan
# (PartitionFilters: [... dynamicpruningexpression(...)]), so the fact
# table's non-matching partitions cost ZERO I/O even though no literal
# partition predicate appears in the query.

_X13_DIM = [
    ("view", "engagement"),
    ("click", "engagement"),
    ("purchase", "revenue"),
    ("signup", "acquisition"),
    ("error", "ops"),
]


@query(
    "x13_dynamic_pruned_join",
    oracle="""
    WITH dim AS (
      SELECT * FROM (VALUES
        ('view', 'engagement'), ('click', 'engagement'),
        ('purchase', 'revenue'), ('signup', 'acquisition'),
        ('error', 'ops')) AS t(event_type, category))
    SELECT e.event_type,
           d.category,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e JOIN dim d USING (event_type)
    WHERE d.category = 'engagement'
    GROUP BY 1, 2 ORDER BY 1
    """,
    doc="Dynamic partition pruning: the fact (events, partitioned by "
    "event_type on disk) is filtered by a DIMENSION attribute "
    "(category = 'engagement'), never by a literal partition predicate "
    "— Spark's DPP rule broadcasts the filtered dim and prunes the "
    "fact scan's directories at runtime "
    "(tests/test_plans.py::test_x13_dynamic_pruning_reaches_scan pins "
    "the dynamicpruningexpression in PartitionFilters). The oracle "
    "runs the same join on the unpartitioned view — layout must never "
    "change results.",
)
def x13_dynamic_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the canonical star-schema scan. The dim is
    tiny (broadcast, reused as the pruning subquery — no extra job); the
    fact scan lists only the 2 matching directories out of
    |event_type|, so scan I/O tracks the SELECTED data, not the table.
    One partial-agg exchange on (event_type, category) after the
    broadcast join. Partition-column choice follows x07's rule
    (low-cardinality filter keys); DPP is what keeps that choice useful
    when the predicate arrives through a dimension instead of a
    literal."""
    path = _ensure_partitioned(spark, sf_dir)
    ev = spark.read.parquet(path).select("event_type", "value")
    dim = spark.createDataFrame(_X13_DIM, ["event_type", "category"])
    return (
        ev.join(F.broadcast(dim.filter(F.col("category") == "engagement")), "event_type")
        .groupBy("event_type", "category")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
@query(
    "x14_scd2_history",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT user_id, event_type, ts,
             SUM(CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run
      FROM o),
    runs AS (
      SELECT user_id, event_type, run,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM r GROUP BY user_id, event_type, run)
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run)
             AS valid_to,
           CAST(CASE WHEN LEAD(valid_from) OVER (
                  PARTITION BY user_id ORDER BY run) IS NULL
                THEN 1 ELSE 0 END AS BIGINT) AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM runs ORDER BY user_id, valid_from
    """,
    doc="SCD type-2 history build from an event stream: consecutive "
    "equal attribute runs per user collapse into validity intervals "
    "(valid_from, valid_to, is_current) — the gaps-and-islands LAG + "
    "running-SUM run id + LEAD close-out, the standard warehouse "
    "dimension-history derivation a DuckRunner user writes over "
    "ingested events.",
)
def x14_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): every window and the run aggregation key
    on user_id, so the whole derivation is ONE hash exchange reused by
    all three stages (Spark keeps the user_id partitioning across the
    LAG window, the run-id window, the group-by, and the LEAD window —
    same-key exchange reuse); state per task is one user's runs. At
    dimension scale valid_to never needs a self-join — LEAD over the
    aggregated runs frame replaces the classic from/to range join.
    Reference analog: post-ingest DuckDB SQL (duck.go:49-52)."""
    t = load_views(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = t["events"].select(
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_id"),
    )
    run = F.sum(
        F.when(
            F.col("prev").isNull() | (F.col("prev") != F.col("event_type")), 1
        ).otherwise(0)
    ).over(w)
    runs = (
        o.select("user_id", "event_type", "ts", run.alias("run"))
        .groupBy("user_id", "event_type", "run")
        .agg(
            F.min("ts").alias("valid_from"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    wr = Window.partitionBy("user_id").orderBy("run")
    nxt = F.lead("valid_from").over(wr)
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().cast("bigint").alias("is_current"),
        "n_events",
    ).orderBy("user_id", "valid_from")


# --------------------------------------------------------------------------
@query(
    "x15_cohort_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events),
    coh AS (
      SELECT user_id, MIN(wk) AS cohort_week FROM act GROUP BY user_id),
    cs AS (
      SELECT cohort_week, COUNT(*) AS cohort_size
      FROM coh GROUP BY cohort_week),
    m AS (
      SELECT c.cohort_week,
             date_diff('day', c.cohort_week, a.wk) // 7 AS week_offset,
             COUNT(*) AS n_active
      FROM coh c JOIN act a ON a.user_id = c.user_id
      GROUP BY 1, 2)
    SELECT CAST(m.cohort_week AS VARCHAR) AS cohort_week, m.week_offset,
           CAST(m.n_active AS BIGINT) AS n_active,
           CAST(cs.cohort_size AS BIGINT) AS cohort_size,
           ROUND(m.n_active * 1.0 / cs.cohort_size, 4) AS retention
    FROM m JOIN cs ON cs.cohort_week = m.cohort_week
    ORDER BY m.cohort_week, m.week_offset
    """,
    doc="Weekly cohort retention matrix: cohort = first active week per "
    "user, retention = fraction of the cohort active at each week "
    "offset — the canonical product-analytics rollup over ingested "
    "events.",
)
def x15_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the event stream reduces to DISTINCT
    (user_id, week) FIRST — one partial-agg exchange carrying 12-byte
    rows, after which everything operates on |users| x |weeks| rows.
    Cohort assignment is a user_id-co-keyed self-join (no re-exchange
    of the distinct frame on the probe side beyond its existing key),
    the matrix agg shuffles |cohorts| x |offsets| rows, and the
    cohort-size join is a broadcast. Per-user state never materializes
    an activity array. Reference analog: post-ingest DuckDB SQL
    (duck.go:49-52)."""
    t = load_views(spark, sf_dir)
    act = (
        t["events"]
        .select(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
        )
        .distinct()
    )
    coh = act.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    cs = coh.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    m = (
        coh.join(act, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return (
        m.join(F.broadcast(cs), "cohort_week")
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") * 1.0 / F.col("cohort_size"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
@query(
    "x16_snapshot_timeline",
    oracle="""
    WITH wks AS (
      SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events),
    r AS (
      SELECT w.wk, e.user_id, e.ts, e.event_type, e.value,
             ROW_NUMBER() OVER (PARTITION BY w.wk, e.user_id
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY w.wk, e.user_id) AS n_events,
             SUM(e.value) OVER (PARTITION BY w.wk, e.user_id) AS sv
      FROM wks w JOIN events e ON e.ts < w.wk + INTERVAL 7 DAY)
    SELECT CAST(CAST(wk + INTERVAL 7 DAY AS DATE) AS VARCHAR) AS as_of,
           user_id, ts AS last_ts, event_type AS last_type,
           ROUND(value, 2) AS last_value,
           CAST(n_events AS BIGINT) AS n_events,
           ROUND(sv, 2) AS sum_value
    FROM r WHERE rn = 1 AND event_type <> 'error'
    ORDER BY as_of, user_id
    """,
    doc="Changelog TIME TRAVEL: the published snapshot AS OF every week "
    "boundary, reconstructed in ONE pass over the events changelog — "
    "per-(key, week) partial states (x11's changelog_reduce aggregate) "
    "then a cumulative re-max/re-add window ACROSS weeks per key, so "
    "raw events are scanned and reduced exactly once for all W "
    "snapshots. Tombstone semantics match x11: a key deleted as of "
    "week k disappears from that snapshot but resurrects in a later "
    "one if upserted again. The oracle recomputes each snapshot from "
    "the full prefix — agreement proves the cumulative merge lossless "
    "at every boundary, not just the final state.",
)
def x16_snapshot_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the per-(key, week) reduce is one
    partial+final aggregation — each task emits at most one row per
    (key, week) before the exchange, the same map-side discipline as
    x11. Everything after operates on the |keys| x W reduced frame
    (dimension-scale): the dense spine is a broadcast |W|-row dim
    crossed against the distinct keys already co-partitioned by the
    reduce, and the cumulative window partitions by key over W rows.
    The naive form — W separate prefix scans — reads the fact table W
    times; this reads it once. Reference analog: snapshot queries
    delegated to DuckDB (duck.go:70-72); the timeline shape is the
    time-travel extension."""
    t = load_views(spark, sf_dir)
    ev = t["events"]
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    red = (
        ev.select("user_id", wk.alias("wk"), "ts", "event_id", "event_type", "value")
        .groupBy("user_id", "wk")
        .agg(
            F.max(F.struct("ts", "event_id", "event_type", "value")).alias("last"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sv"),
        )
    )
    weeks = red.select("wk").distinct()
    spine = red.select("user_id").distinct().crossJoin(F.broadcast(weeks))
    dense = spine.join(red, ["user_id", "wk"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dense.select(
        "user_id",
        "wk",
        F.max("last").over(w).alias("last"),
        F.sum("n_events").over(w).alias("n_events"),
        F.sum("sv").over(w).alias("sv"),
    ).filter(F.col("last").isNotNull())
    return (
        cum.filter(F.col("last.event_type") != "error")
        .select(
            F.date_add(F.col("wk"), 7).cast("string").alias("as_of"),
            "user_id",
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_type").alias("last_type"),
            F.round(F.col("last.value"), 2).alias("last_value"),
            "n_events",
            F.round(F.col("sv"), 2).alias("sum_value"),
        )
        .orderBy("as_of", "user_id")
    )


# --------------------------------------------------------------------------
@query(
    "x17_bloom_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev,
           COUNT(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="Runtime BLOOM-FILTER pruned shuffle join: fact lineitem joins "
    "a selectively filtered orders side under a MERGE hint (the "
    "beyond-broadcast dim case); with Spark's runtime bloom filter "
    "engaged, a bloom built from the filtered creation side is pushed "
    "into the fact scan as a might_contain probe, so non-joining "
    "fact rows die BEFORE the join exchange (plan-pinned in "
    "tests/test_plans.py under the injection thresholds). Revenue sums "
    "in DECIMAL(18,2) so both engines aggregate exactly.",
)
def x17_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the complement to x13's dynamic partition
    pruning for NON-partition join keys. A selective dim predicate
    (here: the top price band) leaves a dim side too large to
    broadcast at production scale, forcing a shuffle join in which
    every fact row — joining or not — normally pays the exchange.
    Spark's runtime bloom filter (spark.sql.optimizer.runtime.
    bloomFilter.*) builds an xxhash64 bloom from the filtered creation
    side and injects might_contain(bloom, xxhash64(l_orderkey)) into the
    fact scan stage, cutting exchange volume by roughly the join
    selectivity at the cost of one tiny bloom aggregate. The injection
    thresholds (creation side under ~10 MB, application scan over
    ~10 GB by default) mean Spark engages it exactly when the fact
    scan is big enough to matter AND the creation side is genuinely
    beyond-broadcast (canBroadcastBySize false — for a broadcastable
    dim the join already kills fact rows scan-side) — at fixture
    scale the plan test lowers the scan threshold and disables
    broadcast to pin the injected shape, while the bench runs the
    honest un-injected plan. The query itself is
    semantics-identical either way (the bloom only drops rows the join
    would drop). Reference analog: join pushdown delegated to DuckDB
    (duck.go:70-72); runtime filtering is the at-scale extension."""
    t = load_views(spark, sf_dir)
    od = (
        t["orders"]
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_orderpriority")
        .hint("merge")
    )
    j = t["lineitem"].select("l_orderkey", "l_extendedprice").join(
        od, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )
