"""AQE skew-join handling — the runtime complement to q43's explicit
two-phase salted aggregation (functions/skew.py).

The engine session enables spark.sql.adaptive.skewJoin (session.py:37);
this test proves the setting DOES something: a deliberately skewed
sort-merge join (one key holding ~all left rows) gets its oversized
partition SPLIT by AQE — visible as a `skewed` AQEShuffleRead / skew=true
join in the final adaptive plan — and returns correct results. At 100 TB
this is the default defense for moderately skewed fact-fact joins;
explicit salting (q43/salted_join) remains the tool for extreme or
aggregation-side skew, which AQE skew-join does not cover.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # thresholds scaled DOWN so a ~MB-sized test partition counts as
        # skewed (production defaults are 256MB/factor 5)
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        # forbid broadcast so the join MUST be a shuffle join
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        # left: 200k rows, 99% on key 7, with a fat payload column;
        # right: 100 distinct keys, a few rows each
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id") % 100)
            .cast("long")
            .alias("k"),
            F.concat(F.lit("p" * 64), F.col("id").cast("string")).alias("pay"),
        )
        right = spark.range(300).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("rid")
        )
        joined = left.join(right, "k")
        # execute the DataFrame's OWN plan (count()/write would run a
        # separate execution and leave this one isFinalPlan=false)
        rows = joined.collect()
        # 99% of 200k left rows match key 7's 3 right rows, the rest 3 each
        assert len(rows) > 500_000, len(rows)

        # the FINAL adaptive plan must mark the join/shuffle-read skewed
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "isSkew=true" in plan or "skewed" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
