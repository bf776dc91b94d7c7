"""Relational/SQL operator surface — SURVEY.md §2b Q1-Q24.

The reference (loicalleyne/quacfka) delegates its entire SQL surface to
DuckDB via DuckRunner (/root/reference/duck.go:38-134); an equivalent
engine must provide the standard relational operator set natively. Here
each operator class is one declared query, implemented with the PySpark
DataFrame API (Catalyst plans it: pushdown, pruning, join selection, AQE)
and hash-checked against a DuckDB oracle on the same parquet fixtures.

Scale notes are per-query docstrings: at 100 TB every one of these plans
relies on (a) parquet predicate pushdown + column pruning at the scan,
(b) partial (map-side) aggregation before the shuffle, (c) broadcast for
the small join sides, and (d) AQE for runtime coalesce/skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.registry import query


# --------------------------------------------------------------------------
# Q1 — scan
@query(
    "q01_scan_count",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    doc="Parquet scan; count comes from row-group metadata, no full read.",
)
def q01_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return t["lineitem"].agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Q2 — projection + scalar math
@query(
    "q02_project_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge
    FROM lineitem ORDER BY l_orderkey, l_linenumber, charge LIMIT 100
    """,
    doc="Projection with scalar arithmetic; ReadSchema pruned to 5 columns. "
    "(l_orderkey, l_linenumber) is not unique in the fixture, so charge "
    "joins the ORDER BY to keep the LIMIT boundary deterministic.",
)
def q02_project_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    li = t["lineitem"]
    charge = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
    )
    return (
        li.select("l_orderkey", "l_linenumber", charge.alias("charge"))
        .orderBy("l_orderkey", "l_linenumber", "charge")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q3 — filter / predicate pushdown
@query(
    "q03_filter",
    oracle="""
    SELECT l_orderkey, l_quantity FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Both predicates reach the parquet scan as PushedFilters.",
)
def q03_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .orderBy("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_quantity")
    )


# --------------------------------------------------------------------------
# Q4 — hash aggregate (the reference's raison d'être: aggregation over the
# flattened table, /root/reference/quacfka.go:106-108)
@query(
    "q04_hash_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="HashAggregate partial->final; map-side combine halves the shuffle.",
)
def q04_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q5 — distinct aggregate
@query(
    "q05_count_distinct",
    oracle="SELECT COUNT(DISTINCT l_partkey) AS d FROM lineitem",
    doc="Expands to two-stage agg (distinct keys then count) — no driver collect.",
)
def q05_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return t["lineitem"].agg(F.countDistinct("l_partkey").alias("d"))


# --------------------------------------------------------------------------
# Q6 — approximate count-distinct (HyperLogLog++). Different sketches across
# engines can't hash-match; the declared check is "within 5% of exact",
# encoded as a boolean both sides agree on (oracle returns the expected 1).
@query(
    "q06_approx_count_distinct",
    oracle="SELECT CAST(1 AS INTEGER) AS ok",
    doc="approx_count_distinct within 5% of exact, as a self-verifying flag.",
)
def q06_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    agg = t["lineitem"].agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    ok = (F.abs(F.col("approx") - F.col("exact")) <= 0.05 * F.col("exact")).cast("int")
    return agg.select(ok.alias("ok"))


# --------------------------------------------------------------------------
# Q7 — equi inner join
@query(
    "q07_inner_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 200000
    ORDER BY o.o_orderkey
    """,
    doc="Filter pushed below the join; customer side broadcast when small, "
    "shuffled-hash/SMJ via AQE when not.",
)
def q07_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    o = t["orders"].filter(F.col("o_totalprice") > 200000)
    c = t["customer"].select("c_custkey", "c_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Q8 — outer join
@query(
    "q08_left_join_agg",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
    doc="Left outer join preserving customers with no orders; COUNT(col) "
    "skips the NULLs the outer join introduces.",
)
def q08_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    c = t["customer"].select("c_custkey")
    o = t["orders"].select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Q9 — semi join
@query(
    "q09_semi_join",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
    doc="left_semi: probe side never materializes matches (EXISTS semantics).",
)
def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    c = t["customer"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Q10 — anti join
@query(
    "q10_anti_join",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="left_anti (NOT EXISTS); null-safe by construction.",
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    o = t["orders"].select("o_custkey")
    c = t["customer"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Q11 — multi-way join + agg (TPC-H Q5 shape) — the flagship query.
@query(
    "q11_multiway_join",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name ORDER BY revenue DESC, n.n_name
    """,
    doc="5-way join: region/nation broadcast explicitly (tiny at any SF); "
    "customer->orders->lineitem joins shuffle on their keys; the region "
    "filter semi-reduces customers before the fact-table join.",
)
def q11_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    # Dimension pipeline first: filter region, broadcast into nation, then
    # into customer — at 100 TB this keeps the only big shuffles on
    # (o_custkey) and (l_orderkey).
    r = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n = (
        t["nation"]
        .join(F.broadcast(r), t["nation"].n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    c = t["customer"].join(F.broadcast(n), t["customer"].c_nationkey == n.n_nationkey).select(
        "c_custkey", "n_name"
    )
    o = t["orders"].select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    # lineitem is the STREAMED side (r13, guide §3.1): the old
    # c.join(o).join(li) shape put tiny customer on the probe side and
    # let AQE broadcast the biggest table — a single-threaded 600k-row
    # hash-relation build on the driver at sf0.1, and exactly backwards
    # at 100 TB. Joining li against the (orders x customer) dimension
    # pipeline keeps the fact table streaming: AQE broadcasts the small
    # side when it fits, and past the threshold the plan degrades to a
    # shuffle on (l_orderkey) — the shuffle the docstring promises.
    co = o.join(c, c.c_custkey == o.o_custkey).select("o_orderkey", "n_name")
    joined = li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Q12 — theta / non-equi join component
@query(
    "q12_theta_join",
    oracle="""
    SELECT p.p_partkey, COUNT(*) AS n
    FROM part p JOIN lineitem l
      ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
    GROUP BY p.p_partkey ORDER BY n DESC, p.p_partkey LIMIT 50
    """,
    doc="Equi key + residual range predicate: stays a hash join with a "
    "post-probe filter (never a BNLJ) because the equi conjunct exists.",
)
def q12_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    p = t["part"].select("p_partkey", "p_size")
    li = t["lineitem"].select("l_partkey", "l_quantity")
    return (
        p.join(li, (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size))
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p_partkey")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Q13 — ranking window (top-3 orders per customer)
@query(
    "q13_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders) t
    WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
    doc="Top-k per group: single shuffle on the partition key; rank filter "
    "cuts cardinality before any downstream op.",
)
def q13_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------------
# Q14 — analytic window with frame
@query(
    "q14_window_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity
                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS mv
    FROM lineitem ORDER BY l_orderkey, l_linenumber, mv LIMIT 200
    """,
    doc="Moving sum over a 2-row frame within each order. The fixture has "
    "duplicate (l_orderkey, l_linenumber) pairs, so the frame order adds "
    "l_quantity (ties then sum identically either way) and the outer "
    "ORDER BY adds mv to pin the LIMIT boundary.",
)
def q14_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(-1, 0)
    )
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_quantity").over(w), 2).alias("mv"),
        )
        .orderBy("l_orderkey", "l_linenumber", "mv")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q15 — sort / limit / top-k
@query(
    "q15_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="TakeOrderedAndProject: per-partition top-10 then driver merge of "
    "10*P rows — never a full sort.",
)
def q15_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q16 — set ops
@query(
    "q16_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
    doc="INTERSECT -> left-semi join over distinct inputs.",
)
def q16_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("k"))
    s = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


# --------------------------------------------------------------------------
# Q17 — rollup / grouping sets
@query(
    "q17_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="Rollup = Expand (3 grouping sets) + one hash agg; no extra shuffle.",
)
def q17_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# Q18 — string scalar functions
@query(
    "q18_string_fns",
    oracle="""
    SELECT c_custkey, UPPER(SUBSTR(c_name, 1, 8)) AS u, LENGTH(c_name) AS len
    FROM customer WHERE c_name LIKE '%5%' ORDER BY c_custkey
    """,
    doc="upper/substr/length/LIKE — all whole-stage-codegen expressions.",
)
def q18_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_name").like("%5%"))
        .select(
            "c_custkey",
            F.upper(F.substring("c_name", 1, 8)).alias("u"),
            F.length("c_name").alias("len"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Q19 — date/time + math scalar functions
@query(
    "q19_datetime_math",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
           COUNT(*) AS n,
           ROUND(SQRT(AVG(o_totalprice)), 2) AS s
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="year/month extraction + sqrt/avg/round; UTC session TZ pinned so "
    "extraction matches the oracle.",
)
def q19_datetime_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["orders"]
        .groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sqrt(F.avg("o_totalprice")), 2).alias("s"),
        )
        .orderBy("y", "m")
    )


# --------------------------------------------------------------------------
# Q20 — nested access: JSON string props + array column carried through scan
@query(
    "q20_json_access",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events ORDER BY event_id LIMIT 100
    """,
    doc="Declared dialect variant pair: Spark get_json_object vs DuckDB "
    "json_extract_string (SURVEY.md §2b Q20).",
)
def q20_json_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["events"]
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .orderBy("event_id")
        .limit(100)
    )


@query(
    "q20_array_carry",
    oracle="""
    SELECT vec_id, label FROM embeddings WHERE label = 3
    ORDER BY vec_id LIMIT 50
    """,
    doc="Array column survives the scan; filter pushed down on label.",
)
def q20_array_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["embeddings"]
        .filter(F.col("label") == 3)
        .select("vec_id", "label")
        .orderBy("vec_id")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Q21 — explode / unnest: the normalizer semantics (reference D10,
# /root/reference/quacfka.go:106-120 + README.md:110-131)
@query(
    "q21_posexplode",
    oracle="""
    SELECT vec_id,
           CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 4) AS val
    FROM embeddings WHERE vec_id < 10 ORDER BY vec_id, pos
    """,
    doc="posexplode vs DuckDB parallel-unnest zip — declared variant pair.",
)
def q21_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            "pos",
            F.round(F.col("val").cast("double"), 4).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


# --------------------------------------------------------------------------
# Q22 — CASE / conditional
@query(
    "q22_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket
    FROM orders ORDER BY o_orderkey LIMIT 200
    """,
)
def q22_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    bucket = (
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
    )
    return (
        t["orders"]
        .select("o_orderkey", bucket.alias("bucket"))
        .orderBy("o_orderkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q23 — subqueries (scalar + IN); Catalyst decorrelates both
@query(
    "q23_subqueries",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
      AND o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    ORDER BY o_orderkey
    """,
    doc="Scalar subquery becomes a broadcast one-row join; IN becomes a "
    "left-semi join — SQL form kept because it IS the operator under test.",
)
def q23_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
          AND o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        ORDER BY o_orderkey
        """
    )


# --------------------------------------------------------------------------
# Q24 — HAVING + DISTINCT agg
@query(
    "q24_having_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n
    FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 100
    ORDER BY l_returnflag
    """,
)
def q24_having_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.count(F.lit(1)).alias("_total"),
        )
        .filter(F.col("_total") > 100)
        .drop("_total")
        .orderBy("l_returnflag")
    )
