#!/usr/bin/env python
"""End-to-end demo: the reference's README pipeline, Spark-first.

Mirrors /root/reference/README.md:96-185 (orchestrator + normalizer +
custom arrow + DuckRunner) using the mock source, then queries the
rotated output. Run: python examples/pipeline_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from quacfka_spark import (
    NormalizerSpec,
    PipelineConfig,
    SQLRunner,
    StreamingPipeline,
    TransformRegistry,
)
from quacfka_spark.session import get_spark
from quacfka_spark.sources.kafka import decode_json
from quacfka_spark.sources.mock import NESTED_SCHEMA, nested_payload


def main() -> None:
    spark = get_spark("pipeline-demo")
    out = tempfile.mkdtemp(prefix="quacfka_demo_")

    # --- source: 50k mock "Kafka" messages (value: binary JSON payloads),
    # 8 files so availableNow+maxFilesPerTrigger yields multiple epochs
    # (= the reference's rotated .db files)
    src = os.path.join(out, "topic")
    (
        spark.range(0, 50_000, 1, 8)
        .select(F.encode(F.to_json(nested_payload(F.col("id"))), "utf-8").alias("value"))
        .write.parquet(src)
    )
    source = (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )

    # --- normalizer (WithNormalizer analog): flat table, one row per deal
    norm = NormalizerSpec(
        fields=["r.site.id", "r.user_id", "r.amount", "r.deals.id", "r.deals.kind"],
        aliases=["site", "user_id", "amount", "deal_id", "deal_kind"],
    )
    # --- custom transform (WithCustomArrows analog): per-user rollup table
    custom = TransformRegistry()
    custom.add(
        "user_amounts",
        lambda df: df.groupBy(F.col("r.user_id").alias("user_id")).agg(
            F.round(F.sum("r.amount"), 2).alias("total")
        ),
    )
    # --- post-SQL per completed epoch (DuckRunner analog)
    runner = SQLRunner(
        queries=[
            "CREATE OR REPLACE TEMP VIEW top_sites AS "
            "SELECT site, COUNT(*) AS n FROM messages_norm "
            "GROUP BY site ORDER BY n DESC LIMIT 5",
        ]
    )

    pipe = StreamingPipeline(
        spark,
        source,
        PipelineConfig(output_dir=out, dest_table="messages", available_now=True),
        decode=lambda df: decode_json(df, NESTED_SCHEMA),
        normalizer=norm,
        custom=custom,
        runner=runner,
    )
    pipe.start().awaitTermination()
    assert pipe.error() is None, pipe.error()

    print("metrics:", pipe.metrics.report_json())
    print("epochs written:", len(pipe.completed_paths), "paths")

    # --- query the "rotated files" (the reference's duckPaths consumers)
    norm_df = spark.read.parquet(os.path.join(out, "messages_norm"))
    print("norm rows:", norm_df.count())
    norm_df.groupBy("deal_kind").count().orderBy("deal_kind").show()
    spark.sql("SELECT * FROM top_sites").show()
    spark.stop()


if __name__ == "__main__":
    main()
