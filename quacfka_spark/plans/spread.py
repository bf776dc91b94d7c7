"""Conditional fan-out for CPU-heavy stages.

A tokenize/hash/Python-UDF stage should run at full core count even when
the scan behind it has fewer splits (single-file fixtures, tiny topics:
the t08 lesson — one input file otherwise serializes the whole pipeline
into ONE task). But at real scale a table is thousands of files and an
unconditional ``repartition`` would shuffle every payload byte for
nothing. ``spread_for_cpu`` keys the decision off the scan's file count
— pure plan metadata (``df.inputFiles``), no RDD materialization, no
job — and skips the exchange once the scan is already parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to total parallelism iff its scan has too few
    splits to keep the cluster busy (files*2 <= cores). Non-file-backed
    plans (in-memory ranges, mocks) count as unsplit and spread."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file source — treat as a single split
        n_files = 0
    if n_files * 2 <= target:
        return df.repartition(target)
    return df
