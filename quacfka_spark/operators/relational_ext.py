"""Relational surface extensions — Q25+: the rest of the SQL dialect a
DuckRunner user reaches today.

The reference's query capability is "arbitrary DuckDB SQL on each
completed file" (/root/reference/duck.go:49-52, 110-119; README.md:91-95),
so completeness means the whole everyday dialect, not just the Q1-Q24
core: set operations, CUBE + GROUPING(), navigation window functions,
statistical/percentile/decimal aggregates, PIVOT-style conditional
aggregation, regular expressions, higher-order array functions,
ordered string aggregation, and map-typed values (SURVEY.md §1.2 calls
out Decimal/Map as required even though no reference call site exercises
them). Each is a declared (Spark fn, DuckDB oracle) pair like Q1-Q24.

Scale notes per query; the common posture: every query here is pure
Catalyst (no Python UDFs), aggregates are partial+final (map-side
combine before the shuffle), and scans prune to the touched columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.registry import query


# --------------------------------------------------------------------------
# Q25 — EXCEPT (set difference)
@query(
    "q25_except",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
    EXCEPT
    SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    ORDER BY k
    """,
    doc="EXCEPT (distinct set difference). Plans as a left-anti join over "
    "distinct keys; at scale both sides partial-aggregate before the "
    "shuffle so only distinct keys move.",
)
def q25_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").cast("long").alias("k"))
    s = t["supplier"].select(F.col("s_nationkey").cast("long").alias("k"))
    return c.subtract(s).orderBy("k")


# --------------------------------------------------------------------------
# Q26 — UNION ALL + aggregate
@query(
    "q26_union_all_agg",
    oracle="""
    SELECT k, COUNT(*) AS n FROM (
      SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
      UNION ALL
      SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    ) u GROUP BY k ORDER BY k
    """,
    doc="UNION ALL is a zero-cost plan concat (no dedup shuffle); the "
    "aggregate above it partial-combines per input partition.",
)
def q26_union_all_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").cast("long").alias("k"))
    s = t["supplier"].select(F.col("s_nationkey").cast("long").alias("k"))
    return (
        c.unionByName(s)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# Q27 — CUBE + GROUPING()
@query(
    "q27_cube_grouping",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g1,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g2,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE = grouping-set expansion with GROUPING() disambiguating "
    "real NULLs from subtotal rows. Spark expands in one Expand node -> "
    "single shuffle for all 4 grouping sets.",
)
def q27_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g1"),
            F.grouping("l_linestatus").cast("long").alias("g2"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            "g1",
            "g2",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
        .select("l_returnflag", "l_linestatus", "g1", "g2", "n")
    )


# --------------------------------------------------------------------------
# Q28 — navigation window functions
@query(
    "q28_window_nav",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(COALESCE(LAG(o_totalprice) OVER w, 0), 2) AS prev_price,
           ROUND(COALESCE(LEAD(o_totalprice) OVER w, 0), 2) AS next_price,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey LIMIT 200
    """,
    doc="lag/lead/ntile/percent_rank/cume_dist over one window spec: a "
    "single hash-partition shuffle on o_custkey serves all five "
    "functions (one Window node, one Exchange).",
)
def q28_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias(
                "prev_price"
            ),
            F.round(F.coalesce(F.lead("o_totalprice").over(w), F.lit(0.0)), 2).alias(
                "next_price"
            ),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q29 — statistical aggregates
@query(
    "q29_stats_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 2) AS sd,
           ROUND(var_samp(l_quantity), 2) AS vr,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS cr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cv
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="stddev/variance/correlation/covariance: all decompose into "
    "partial moment sums (count, sum, sum-of-squares, cross products) -> "
    "map-side combine, constant-size shuffle rows.",
)
def q29_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 2).alias("sd"),
            F.round(F.var_samp("l_quantity"), 2).alias("vr"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("cr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cv"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q30 — exact interpolated percentiles
@query(
    "q30_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 2)
             AS median_qty,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 2)
             AS p90_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Exact percentile_cont (linear interpolation). Exact percentiles "
    "buffer per-group values; the 100 TB path is approx_percentile "
    "(t-digest sketch, constant memory) — declared exact here because "
    "the oracle must match bit-for-bit.",
)
def q30_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 2).alias("median_qty"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 2).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q30p — the sketch path alone, benched against q30's exact plan
@query(
    "q30p_approx_percentile_only",
    oracle=None,
    doc="q30's production configuration: approx_percentile only (sketch "
    "aggregate, constant memory per group, bounded-size shuffle rows) — "
    "the plan you run at 100 TB where exact percentile_cont's per-group "
    "value buffering is a straight OOM. PERMANENTLY rows-only (r10 "
    "verdict #4, the d03p-treatment analysis): d03p became exact-oracle-"
    "checkable because xxHash64 is a pure PER-ROW function — replicating "
    "the published spec in DuckDB SQL reproduces Spark's values no "
    "matter how either engine schedules the scan. approx_percentile is "
    "a Greenwald-Khanna quantile summary (Spark QuantileSummaries; "
    "Greenwald & Khanna, SIGMOD 2001): its emitted value depends on the "
    "ORDER rows are inserted and on WHERE partition boundaries fall "
    "(each task builds a summary; merge order and per-summary "
    "compression thresholds decide which samples survive). A SQL oracle "
    "would have to simulate the executing session's task partitioning — "
    "but the driver runs this key under ITS OWN session (different "
    "parallelism than any session the oracle string could be written "
    "against), so no fixed DuckDB SQL can reproduce the value even in "
    "principle; the same engine at a different core count already "
    "disagrees with itself within the sketch's rank-error bound. That "
    "bound IS checkable, and is: q30x_approx_percentile gates every "
    "group's approx p50/p90 within 1% of the exact interpolated "
    "percentile, both engines agreeing on the folded boolean.",
)
def q30p_approx_percentile_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_quantity", F.lit(0.5), F.lit(10_000)).alias(
                "median_qty"
            ),
            F.approx_percentile(
                "l_extendedprice", F.lit(0.9), F.lit(10_000)
            ).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q30x — the 100 TB percentile path, self-verified (q06 pattern)
@query(
    "q30x_approx_percentile",
    oracle="SELECT CAST(1 AS INTEGER) AS ok",
    doc="approx_percentile — the constant-memory sketch q30's docstring "
    "declares as the 100 TB path (exact percentile_cont buffers every "
    "per-group value; the sketch shuffles a bounded digest). Sketches "
    "can't hash-match an exact oracle, so the declared check is the q06 "
    "self-verifying pattern: every group's approx p50/p90 must land "
    "within 1% of the exact interpolated percentile, folded to one "
    "boolean the oracle agrees on.",
)
def q30x_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    acc = 10_000  # 1/acc relative rank error bound
    agg = t["lineitem"].groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", F.lit(0.5), F.lit(acc)).alias("aq"),
        F.approx_percentile("l_extendedprice", F.lit(0.9), F.lit(acc)).alias("ap"),
        F.percentile("l_quantity", F.lit(0.5)).alias("eq"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("ep"),
    )
    within = (F.abs(F.col("aq") - F.col("eq")) <= 0.01 * F.abs(F.col("eq"))) & (
        F.abs(F.col("ap") - F.col("ep")) <= 0.01 * F.abs(F.col("ep"))
    )
    return agg.agg(F.min(within.cast("int")).alias("ok"))


# --------------------------------------------------------------------------
# Q31 — decimal arithmetic (SURVEY §1.2: DecimalType required)
@query(
    "q31_decimal_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Exact decimal summation (no float drift regardless of partition "
    "order — the reason money columns must aggregate as DECIMAL at "
    "scale); final CAST to DOUBLE only for the cross-engine hash.",
)
def q31_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q32 — PIVOT (conditional aggregation)
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q32_pivot",
    oracle="""
    SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY 1 ORDER BY bucket
    """,
    doc="PIVOT with an explicit value list = one pass, one shuffle, no "
    "distinct-values pre-query (never pivot without the list at scale: "
    "the value discovery is an extra full scan + collect).",
)
def q32_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    piv = (
        t["events"]
        .select((F.col("user_id") % 10).cast("long").alias("bucket"), "event_type")
        .groupBy("bucket")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # pivot yields NULL for empty cells; FILTER-count yields 0
    return piv.select(
        "bucket",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in _EVENT_TYPES],
    ).orderBy("bucket")


# --------------------------------------------------------------------------
# Q33 — regular expressions
@query(
    "q33_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '(spark|vector|window)', 1) AS first_kw,
           CAST(len(regexp_extract_all(text, 'data')) AS BIGINT) AS n_data
    FROM documents
    WHERE regexp_matches(text, '(spark|vector|window)')
    ORDER BY doc_id LIMIT 200
    """,
    doc="regexp filter + first-group extract + match count. Patterns kept "
    "to the RE2/Java-regex common subset so both engines agree.",
)
def q33_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    pat = "(spark|vector|window)"
    return (
        t["documents"]
        .filter(F.col("text").rlike(pat))
        .select(
            "doc_id",
            F.regexp_extract("text", pat, 1).alias("first_kw"),
            F.regexp_count("text", F.lit("data")).cast("long").alias("n_data"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q34 — higher-order array functions
@query(
    "q34_higher_order_array",
    oracle="""
    SELECT vec_id,
           ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> x * x)), 4) AS sum_sq,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
    FROM embeddings ORDER BY vec_id
    """,
    doc="transform/filter/aggregate lambdas over array columns — pure "
    "codegen, no UDF, no explode (explode-then-groupBy would shuffle "
    "every element; the lambda fold touches none).",
)
def q34_higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        t["embeddings"]
        .select(
            "vec_id",
            F.round(
                F.aggregate(
                    F.transform(emb_d, lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
            ).alias("sum_sq"),
            F.size(F.filter(F.col("embedding"), lambda x: x > 0))
            .cast("long")
            .alias("n_pos"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Q35 — ordered string aggregation
@query(
    "q35_string_agg",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS k,
           string_agg(c_name, ',' ORDER BY c_name) AS names,
           COUNT(*) AS n
    FROM customer WHERE c_custkey <= 100
    GROUP BY 1 ORDER BY k
    """,
    doc="Ordered string_agg == concat_ws over a sorted collect_list. "
    "collect_list buffers the group in memory — fine for bounded groups; "
    "unbounded groups at scale should pre-limit per key (window rank).",
)
def q35_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 100)
        .groupBy(F.col("c_nationkey").cast("long").alias("k"))
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("c_name"))).alias("names"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# Q36 — map-typed values (SURVEY §1.2: MapType required)
@query(
    "q36_map_access",
    oracle="""
    SELECT vec_id,
           (MAP(['label','vid'],
                [CAST(label AS BIGINT), vec_id])['label'])[1] AS label_val
    FROM embeddings WHERE label >= 3 ORDER BY vec_id LIMIT 100
    """,
    doc="Construct a map column and extract by key (DuckDB map subscript "
    "returns a list -> [1]; Spark element_at returns the scalar). "
    "Exercises MapType end-to-end through the hash compare.",
)
def q36_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    m = F.map_from_arrays(
        F.array(F.lit("label"), F.lit("vid")),
        F.array(F.col("label").cast("long"), F.col("vec_id")),
    )
    return (
        t["embeddings"]
        .filter(F.col("label") >= 3)
        .select("vec_id", F.element_at(m, "label").alias("label_val"))
        .orderBy("vec_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q37 — time-interval RANGE window frame
@query(
    "q37_range_interval_frame",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
             AS rolling_1h
    FROM events ORDER BY event_id
    """,
    doc="Rolling 1-hour sum per user via a RANGE frame over event time — "
    "the time-series frame the reference's DuckRunner users write "
    "(/root/reference/duck.go:70-72 delegates arbitrary SQL). SUM over a "
    "RANGE frame is peer-insensitive, so ts ties stay deterministic. "
    "Scale: one shuffle on user_id, sorted scan per partition; frame "
    "evaluation is streaming (no per-row re-scan).",
)
def q37_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    win = (
        "SUM(value) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return (
        t["events"]
        .select(
            "event_id", "user_id", F.round(F.expr(win), 2).alias("rolling_1h")
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q38 — correlated scalar subquery in the select list
@query(
    "q38_correlated_scalar",
    oracle="""
    SELECT c.c_custkey,
           (SELECT ROUND(MAX(o.o_totalprice), 2) FROM orders o
             WHERE o.o_custkey = c.c_custkey) AS max_price
    FROM customer c ORDER BY c_custkey
    """,
    doc="Correlated scalar subquery — Catalyst decorrelates it into a "
    "left outer aggregate join (RewriteCorrelatedScalarSubquery), so at "
    "scale this is one shuffled agg + one join, not a per-row probe.",
)
def q38_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey,
               (SELECT ROUND(MAX(o.o_totalprice), 2) FROM orders o
                 WHERE o.o_custkey = c.c_custkey) AS max_price
        FROM customer c ORDER BY c_custkey
        """
    )


# --------------------------------------------------------------------------
# Q39 — LATERAL correlated subquery join (top-N per row)
@query(
    "q39_lateral_topn",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """,
    doc="LATERAL top-2 orders per customer. Spark SQL supports the same "
    "LATERAL syntax (3.2+); Catalyst plans the correlated LIMIT as a "
    "decorrelated window/rank, i.e. the same single-shuffle plan q13 "
    "writes by hand — per-row probing never reaches the physical plan.",
)
def q39_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey
        """
    )


# --------------------------------------------------------------------------
# Q40 — FILTER clause on aggregates
@query(
    "q40_filtered_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
           ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
             AS disc_rev
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Conditional aggregation via the SQL FILTER clause — several "
    "differently-filtered aggregates in ONE scan + one shuffle (the "
    "pre-FILTER idiom was N scans or CASE-wrapped inputs). Partial "
    "aggregation still combines map-side.",
)
def q40_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
               ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
                 AS disc_rev
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


# --------------------------------------------------------------------------
# Q41 — UNPIVOT / melt
@query(
    "q41_unpivot",
    oracle="""
    WITH a AS (
      SELECT l_returnflag,
             ROUND(SUM(l_quantity), 2) AS qty,
             ROUND(SUM(l_extendedprice), 2) AS price,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'qty' AS metric, qty AS value FROM a
    UNION ALL SELECT l_returnflag, 'price', price FROM a
    UNION ALL SELECT l_returnflag, 'n', n FROM a
    ORDER BY l_returnflag, metric
    """,
    doc="UNPIVOT (wide metrics -> long key/value rows) via DataFrame "
    ".unpivot — the inverse of q32_pivot. Catalyst plans it as a single "
    "Expand over the 3-row aggregate (no self-union of scans); the "
    "oracle is the portable UNION ALL formulation.",
)
def q41_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    agg = (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("price"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    return agg.unpivot(
        ["l_returnflag"], ["qty", "price", "n"], "metric", "value"
    ).orderBy("l_returnflag", "metric")


# --------------------------------------------------------------------------
# Q42 — latest-row-per-key (QUALIFY-style window dedup)
@query(
    "q42_latest_per_key",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS VARCHAR) AS ts_s, value
    FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1 ORDER BY user_id
    """,
    doc="Latest row per key — the most common production dedup pattern "
    "(current state from an event log): ROW_NUMBER() per key ordered by "
    "event time desc, keep rn=1 (DuckDB users write it with QUALIFY, "
    "via the reference's arbitrary-SQL runner duck.go:70-72). "
    "(ts, event_id) lexicographic order makes ties deterministic. "
    "Scale: one hash shuffle on user_id + per-partition sort; Catalyst "
    "inserts a WindowGroupLimit below the shuffle, so each map task "
    "forwards only its per-key top-1 candidates, not the whole log — "
    "the map-side-combine analog for window dedup.",
)
def q42_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_views(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t["events"]
        .select(
            "user_id", "event_id", "ts", "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_id",
            F.col("ts").cast("string").alias("ts_s"),
            "value",
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q43 — skew-safe aggregation (explicit two-phase salt)
@query(
    "q43_skew_safe_agg",
    oracle="""
    SELECT CASE WHEN user_id % 10 < 3 THEN 0 ELSE user_id END AS user_key,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS s
    FROM events GROUP BY 1 ORDER BY user_key
    """,
    doc="Aggregation under a power-law hot key (a CASE maps ~30% of "
    "events onto key 0 — the synthetic stand-in for the null-key / "
    "celebrity-user skew every 100 TB log has). Implemented with the "
    "engine's two_phase_agg: phase 1 aggregates on (key, deterministic "
    "salt) so the hot key spreads over 16 tasks, phase 2 merges the 16 "
    "partials per key. For plain sum/count Spark's own partial "
    "aggregation gives the same protection — this declared query keeps "
    "the explicit pattern (needed for collect-style/distinct aggs where "
    "map-side combine is defeated) oracle-checked. Deterministic salt "
    "(hash, not rand()) keeps task retries idempotent.",
)
def q43_skew_safe_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quacfka_spark.functions.skew import two_phase_agg

    t = load_views(spark, sf_dir)
    keyed = t["events"].select(
        F.when(F.col("user_id") % 10 < 3, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("user_key"),
        "value",
    )
    return two_phase_agg(
        keyed,
        ["user_key"],
        [F.count(F.lit(1)).alias("pn"), F.sum("value").alias("ps")],
        [
            F.sum("pn").alias("n"),
            F.round(F.sum("ps"), 2).alias("s"),
        ],
        salt_buckets=16,
    ).orderBy("user_key")


# --------------------------------------------------------------------------
# q44 — mergeable HLL sketches (Apache DataSketches, Spark 3.5+ builtins).
# q06 tests approx_count_distinct as a black box; this key exercises the
# PATTERN that matters at 100 TB: per-shard sketches built independently
# (here keyed by a synthetic shard = o_orderkey % 16), persisted/merged
# with hll_union_agg, estimated once at the end. That two-level shape is
# how distinct counts compose across partitions, days, or tables without
# ever re-scanning raw data — the sketch is the aggregate state.
@query(
    "q44_hll_sketch",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_nd,
           CAST(1 AS INTEGER) AS ok
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Two-level mergeable distinct-count: shard-local hll_sketch_agg "
    "-> hll_union_agg -> estimate, per order status. The hash compares "
    "exact_nd plus the self-verifying ok flag (estimate within 5% of "
    "exact — the q06 pattern; the raw estimate is engine-specific).",
)
def q44_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): level 1 runs inside each shard with NO
    cross-shard traffic (partial aggregation of (status, shard));
    level 2 shuffles only the ~KB binary sketches, one per (status,
    shard) — never row-level data. HLL union is commutative and
    associative, so the estimate is independent of shard count or
    merge order: the same code path handles per-day rollups merged
    into months, or per-table sketches merged across sources. The
    exact count_distinct rides along here only to power the ok flag."""
    t = load_views(spark, sf_dir)
    shards = (
        t["orders"]
        .select(
            "o_orderstatus",
            (F.col("o_orderkey") % 16).alias("shard"),
            "o_custkey",
        )
        .groupBy("o_orderstatus", "shard")
        # lgConfigK=14 (16384 buckets, ~0.8% standard error, ~16 KB per
        # sketch): the default 12 measured outside the 5% ok-band when
        # the 5x-replica sweep pushed per-status cardinality to ~72k
        # (union of 16 shard sketches) — precision is the right fix,
        # band width is not; the sketch stays KBs, the merge shape is
        # unchanged
        .agg(F.hll_sketch_agg("o_custkey", 14).alias("sk"))
    )
    merged = shards.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_nd")
    )
    exact = (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").cast("bigint").alias("exact_nd"))
    )
    return (
        exact.join(merged, "o_orderstatus")
        .select(
            "o_orderstatus",
            "exact_nd",
            (
                F.abs(F.col("approx_nd") - F.col("exact_nd"))
                <= 0.05 * F.col("exact_nd")
            )
            .cast("int")
            .alias("ok"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Q45 — arbitrary GROUPING SETS (finer than q17 ROLLUP / q27 CUBE)
@query(
    "q45_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2
              + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderpriority), ())
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="Arbitrary GROUPING SETS — exactly the 3 requested sets "
    "including one NOT on the rollup path ((priority) without "
    "(status, priority) above it), with grouping_id() disambiguating "
    "subtotal rows from real NULLs. Spark expands all sets in ONE "
    "Expand node feeding ONE partial+final aggregate: a single scan "
    "and a single shuffle compute every set — at 100 TB strictly "
    "cheaper than unioning 3 separate aggregations.",
)
def q45_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["orders"]
        .groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


# --------------------------------------------------------------------------
# Q46 — bivariate statistics profile (corr / covariance / regression)
@query(
    "q46_stats_profile",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_samp(l_discount), 8) AS var_disc,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_qty,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept_price_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Bivariate statistics the reference exposes via DuckDB's "
    "aggregate dialect (duck.go:49-52 'arbitrary SQL'): Pearson "
    "correlation, sample covariance, stddev/variance, and OLS "
    "regression slope/intercept per group. All are single-pass "
    "co-moment aggregates: Spark computes partial (n, mean, M2, "
    "co-moment) tuples map-side and merges them in ONE exchange "
    "carrying |groups| rows — the textbook parallel-moments form, so "
    "100 TB costs one scan + a 3-row shuffle. Rounded on both sides "
    "(engines merge partials in different orders; the estimators are "
    "identical).",
)
def q46_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
                "slope_price_qty"
            ),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
                "icept_price_qty"
            ),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q47 — median + deterministic mode per group
@query(
    "q47_median_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS flag, l_quantity AS qty, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2),
    m AS (
      SELECT flag, qty AS mode_qty, CAST(n AS BIGINT) AS mode_n
      FROM (SELECT flag, qty, n,
                   ROW_NUMBER() OVER (PARTITION BY flag
                                      ORDER BY n DESC, qty) AS rn
            FROM c)
      WHERE rn = 1),
    med AS (
      SELECT l_returnflag AS flag,
             ROUND(median(l_quantity), 4) AS median_qty
      FROM lineitem GROUP BY 1)
    SELECT med.flag AS l_returnflag, median_qty, mode_qty, mode_n
    FROM med JOIN m ON med.flag = m.flag
    ORDER BY l_returnflag
    """,
    doc="Exact median + MODE per group. Both engines' built-in mode() "
    "breaks frequency ties arbitrarily, so the mode is computed "
    "explicitly — value-count aggregate + row_number ordered by "
    "(count DESC, value ASC) — making the answer deterministic and "
    "portable. Scale shape: the count aggregate is partial+final on "
    "(group, value) — the exchange carries distinct value counts, not "
    "rows — and the per-group argmax is WindowGroupLimit-class work "
    "on that reduced frame. The exact median's full-sort cost is the "
    "declared parity baseline; q30p's t-digest sketch is the "
    "registered production path for percentiles at 100 TB.",
)
def q47_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    li = t["lineitem"]
    c = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").alias("qty")
    ).agg(F.count(F.lit(1)).alias("n"))
    mode = (
        c.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("flag").orderBy(F.desc("n"), F.asc("qty"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("flag", F.col("qty").alias("mode_qty"), F.col("n").alias("mode_n"))
    )
    med = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(F.median("l_quantity"), 4).alias("median_qty")
    )
    return (
        med.join(mode, "flag")
        .select(
            F.col("flag").alias("l_returnflag"), "median_qty", "mode_qty", "mode_n"
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q48 — blocked fuzzy match (entity-resolution join)
_Q48_MAX_DIST = 2
_Q48_TOPK = 100


@query(
    "q48_fuzzy_match",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS blk
      FROM part)
    SELECT a.p_partkey AS p1, b.p_partkey AS p2,
           a.p_name AS name1, b.p_name AS name2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {_Q48_MAX_DIST}
    ORDER BY dist, p1, p2 LIMIT {_Q48_TOPK}
    """,
    doc="Record-linkage fuzzy match: near-identical part names by "
    "Levenshtein distance, BLOCKED on the name's noun token so the "
    "join is a hash equi-join on the block key — never an all-pairs "
    "cross join (the classic entity-resolution blocking strategy; "
    "d02/d03's shingle banding is the same idea for documents). "
    "Levenshtein runs only inside blocks, the p1<p2 key order halves "
    "the candidate set, and the top-k is TakeOrderedAndProject. At "
    "100 TB a hot block key (a noun shared by millions of names) is "
    "the d07 degenerate-bucket problem - same salting answer.",
)
def q48_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quacfka_spark.plans.spread import spread_for_cpu

    t = load_views(spark, sf_dir)
    p = t["part"].select(
        "p_partkey", "p_name", F.split_part("p_name", F.lit(" "), F.lit(2)).alias("blk")
    )
    # the probe side MUST be spread: with the dim side broadcast, a
    # single-file scan would expand every in-block pair (25M at sf0.1)
    # and run every Levenshtein in ONE task (measured 44s -> ~2s)
    a = spread_for_cpu(p).alias("a")
    b = p.alias("b")
    # bounded edit distance: the threshold form early-exits the DP as
    # soon as a row's minimum cost exceeds max_dist (returns -1), so
    # far-apart names — the overwhelming majority of in-block pairs —
    # cost O(len x d) instead of O(len^2). Within the threshold it
    # returns the exact distance, so the oracle is unchanged.
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), _Q48_MAX_DIST)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        # length-gap prefilter: |len(a)-len(b)| > d implies dist > d,
        # and the length compare is codegen-cheap where Levenshtein is
        # O(len^2) — the standard edit-distance candidate pruning
        .filter(
            F.abs(F.length("a.p_name") - F.length("b.p_name")) <= _Q48_MAX_DIST
        )
        .filter(dist >= 0)
        .select(
            F.col("a.p_partkey").alias("p1"),
            F.col("b.p_partkey").alias("p2"),
            F.col("a.p_name").alias("name1"),
            F.col("b.p_name").alias("name2"),
            dist.cast("bigint").alias("dist"),
        )
        .orderBy("dist", "p1", "p2")
        .limit(_Q48_TOPK)
    )


# --------------------------------------------------------------------------
# Q51 — running COUNT(DISTINCT) over a window (dialect-gap rewrite)
@query(
    "q51_running_distinct",
    oracle="""
    WITH dd AS (
      SELECT DISTINCT event_type, date_trunc('day', ts) AS day, user_id
      FROM events)
    SELECT DISTINCT event_type, day,
           CAST(count(DISTINCT user_id)
                  OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS cum_users
    FROM dd ORDER BY event_type, day
    """,
    doc="Cumulative distinct-user count per event type by day — "
    "COUNT(DISTINCT) OVER, a window shape Spark does not support "
    "directly (DuckDB does; it is the oracle formulation). The "
    "distributed rewrite is first-occurrence flags + running sum: a "
    "user contributes to the cumulative count exactly on their first "
    "day, so min(day) per (type, user) -> new-user counts per (type, "
    "day) -> cumulative sum over the per-day frame. Every aggregate is "
    "partial+final on its key and the window runs over |types|x|days| "
    "aggregated rows, never raw events — where a naive per-row distinct "
    "window would hold per-partition hash sets of every user ever "
    "seen. The same rewrite is how cumulative-reach dashboards scale.",
)
def q51_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    ev = t["events"].select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
    )
    first = ev.groupBy("event_type", "user_id").agg(F.min("day").alias("day"))
    new_users = first.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = ev.select("event_type", "day").distinct()
    return (
        days.join(new_users, ["event_type", "day"], "left")
        .withColumn("new_users", F.coalesce("new_users", F.lit(0)))
        .withColumn(
            "cum_users",
            F.sum("new_users").over(
                W.partitionBy("event_type")
                .orderBy("day")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .select("event_type", "day", "cum_users")
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Q52 — recursive CTE (iterative fixpoint in the SQL surface)
@query(
    "q52_recursive_cte",
    oracle="""
    WITH RECURSIVE up AS (
      SELECT s_suppkey AS k, s_suppkey AS a, 0 AS depth FROM supplier
      UNION ALL
      SELECT k, a // 10, depth + 1 FROM up WHERE a > 0
    )
    SELECT u.k AS s_suppkey, CAST(MAX(u.depth) AS BIGINT) AS depth,
           ROUND(SUM(b.s_acctbal), 2) AS chain_bal
    FROM up u JOIN supplier b ON u.a = b.s_suppkey
    GROUP BY u.k ORDER BY s_suppkey
    """,
    doc="WITH RECURSIVE (Spark 4's UnionLoop): walk each supplier's "
    "ancestor chain in a derived decimal hierarchy (parent = key DIV "
    "10) and aggregate over the expanded paths — the recursion "
    "operator the reference's DuckDB surface has always offered and "
    "Spark only gained in 4.x. Every iteration is a full distributed "
    "step (filter + project over the previous frontier), so depth — "
    "O(log10 max_key) here, bounded by spark.sql.cteRecursionLevelLimit "
    "— not data size, bounds the plan; the final join + agg are "
    "ordinary hash operators. d06's driver-looped label propagation is "
    "the DataFrame-side analog for fixpoints whose depth is data-"
    "dependent.",
)
def q52_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    t["supplier"].createOrReplaceTempView("q52_supplier")
    return spark.sql(
        """
        WITH RECURSIVE up AS (
          SELECT s_suppkey AS k, s_suppkey AS a, 0 AS depth
          FROM q52_supplier
          UNION ALL
          SELECT k, a DIV 10, depth + 1 FROM up WHERE a > 0
        )
        SELECT u.k AS s_suppkey, CAST(MAX(u.depth) AS BIGINT) AS depth,
               ROUND(SUM(b.s_acctbal), 2) AS chain_bal
        FROM up u JOIN q52_supplier b ON u.a = b.s_suppkey
        GROUP BY u.k ORDER BY s_suppkey
        """
    )


# --------------------------------------------------------------------------
# Q49 — equi-width histogram (data-driven bounds, one stats broadcast)
_Q49_BUCKETS = 12


@query(
    "q49_histogram",
    oracle=f"""
    WITH s AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
               FROM orders)
    SELECT CAST(LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / {_Q49_BUCKETS})),
                      {_Q49_BUCKETS - 1}) AS BIGINT) AS bucket,
           ROUND(MIN(lo + ((hi - lo) / {_Q49_BUCKETS}) *
                 LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / {_Q49_BUCKETS})),
                       {_Q49_BUCKETS - 1})), 4) AS lo_edge,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS mass
    FROM orders, s
    GROUP BY bucket ORDER BY bucket
    """,
    doc="Equi-width histogram with data-driven bounds: one tiny "
    "min/max aggregate broadcast to every task (a 1-row dimension, "
    "the t16 corpus-stats pattern), then bucket = floor((v-lo)/width) "
    "as pure codegen arithmetic and a partial+final count per bucket. "
    "Two passes over the fact by necessity (bounds, then counts) but "
    "the only exchanges are the 1-row stats agg and the "
    f"{_Q49_BUCKETS}-row bucket agg — the histogram every profiler "
    "(ANALYZE, x05) builds, made explicit. At 100 TB the bounds pass "
    "can read parquet footer min/max instead (x10's footer-stats "
    "trick) making it metadata-only.",
)
def q49_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    o = t["orders"]
    stats = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(_Q49_BUCKETS)
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / width),
        F.lit(_Q49_BUCKETS - 1),
    ).cast("bigint")
    return (
        o.join(F.broadcast(stats))
        .select(
            bucket.alias("bucket"),
            (F.col("lo") + width * bucket).alias("edge"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.round(F.min("edge"), 4).alias("lo_edge"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("mass"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Q50 — per-group decile statistics via NTILE
@query(
    "q50_ntile_deciles",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority,
             ntile(10) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS decile,
             o_totalprice
      FROM orders)
    SELECT o_orderpriority, CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM d GROUP BY o_orderpriority, decile
    ORDER BY o_orderpriority, decile
    """,
    doc="Per-group decile table: NTILE(10) partitioned by order "
    "priority with a (price, key) total order — the tie-break key "
    "makes bucket assignment deterministic and engine-identical — "
    "then count/min/max/avg per decile. One hash exchange on the "
    "group key and a group-local sort; the decile agg is "
    "partial+final over |groups|x10 rows. Exact NTILE sorts each "
    "group, so this is the parity surface; at 100 TB the production "
    "path is q30p's t-digest sketch (bucket edges from quantiles, "
    "no per-group sort) — the same exact-vs-sketch split as "
    "q30/q30p.",
)
def q50_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    d = t["orders"].select(
        "o_orderpriority",
        F.ntile(10)
        .over(
            W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
        )
        .cast("bigint")
        .alias("decile"),
        "o_totalprice",
    )
    return (
        d.groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("o_orderpriority", "decile")
    )


# --------------------------------------------------------------------------
@query(
    "q53_string_agg",
    oracle="""
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
           COUNT(*) AS n
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    doc="Ordered string aggregation (the LISTAGG / string_agg classic): "
    "suppliers per nation concatenated in name order. Spark 4's "
    "listagg ... WITHIN GROUP (ORDER BY) — deterministic ordered "
    "concat as a real aggregate, no collect_list + array_join "
    "two-step.",
)
def q53_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): one partial+final aggregation on the
    group key after a broadcast dim join — the ordered concat's sort
    is group-local at the final aggregate. The usual 100 TB caveat for
    ordered-concat aggregates applies and is inherent to the SQL
    semantics, not the plan: a group's concatenated value must fit one
    row, so hot groups belong behind a length guard or the q15-style
    top-k cut. Reference analog: DuckDB string_agg delegated via
    duck.go:70-72."""
    t = load_views(spark, sf_dir)
    return (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.expr(
                "listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)"
            ).alias("suppliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_name")
    )
