"""Runtime Bloom-filter join pruning — row-level runtime filtering.

tests/test_plans.py pins dynamic PARTITION pruning (directory level);
this pins its row-level sibling: on a shuffle join where one side is
small-after-filter and the other is large, Catalyst's
InjectRuntimeFilter builds a Bloom filter over the small side's join
keys and pushes a BloomFilterMightContain probe into the LARGE side's
scan stage — rows that cannot join are dropped before the exchange. At
100 TB this is the difference between shuffling the whole fact table
and shuffling the ~matching fraction when joins are selective.

The engine session leaves spark.sql.optimizer.runtime.bloomFilter at
Spark's default (enabled in 3.5+); the test lowers the size thresholds
so fixture-scale inputs qualify, then asserts the filter is injected
and results are unchanged by it.
"""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F


def _ensure_wide(spark, n=120_000):
    # creationThreshold compares the application side's size estimate;
    # a generated range with a fat payload column clears 10MB easily
    return spark.range(n).select(
        (F.col("id") % 5_000).alias("fk"),
        F.concat(F.lit("x" * 128), F.col("id").cast("string")).alias("pay"),
    )


def test_bloom_filter_injected_on_selective_join(spark):
    conf = spark.conf
    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # forbid broadcast: runtime filters target shuffle joins
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        fact = _ensure_wide(spark)
        dim = (
            spark.range(5_000)
            .select(F.col("id").alias("fk"), (F.col("id") * 2).alias("attr"))
            .filter(F.col("attr") % 100 == 0)  # selective: 100 of 5000 keys
        )
        joined = fact.join(dim, "fk")

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(True)
        plan = buf.getvalue()
        assert "bloom_filter" in plan or "BloomFilterMightContain" in plan, (
            plan[-3000:]
        )
        # and the filter never changes results: attr%100==0 keeps keys
        # divisible by 50 -> 100 of 5000 keys, 24 fact rows each
        assert joined.count() == 100 * 24
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
