"""Conditional fan-out for CPU-heavy stages.

A tokenize/hash/Python-UDF stage should run at full core count even when
the scan behind it has fewer splits (single-file fixtures, tiny topics:
the t08 lesson — one input file otherwise serializes the whole pipeline
into ONE task). But at real scale a table is thousands of files and an
unconditional ``repartition`` would shuffle every payload byte for
nothing. ``spread_for_cpu`` estimates the scan's SPLIT count — files are
splittable (parquet), so a single multi-GB file still scans as many
partitions; counting it as 1 would force a redundant full-payload
shuffle. File sizes come from ``os.path`` for local paths (pure
metadata, no job); on remote filesystems where sizes aren't cheaply
reachable from the driver the file count stands in, which at real scale
(thousands of files) gives the same decision.
"""

from __future__ import annotations

import math
import os
import re
from urllib.parse import urlparse

from pyspark.sql import DataFrame

_SIZE_UNITS = {"": 1, "b": 1, "k": 2**10, "kb": 2**10, "m": 2**20,
               "mb": 2**20, "g": 2**30, "gb": 2**30, "t": 2**40, "tb": 2**40}


def _parse_bytes(v: str) -> int:
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", v)
    if not m:
        return 128 * 2**20
    return int(m.group(1)) * _SIZE_UNITS.get(m.group(2).lower(), 1)


def _est_splits(df: DataFrame, files: list[str]) -> int:
    """Estimated scan partitions: ceil(size / maxPartitionBytes) per file
    when every path is locally stat-able, else the file count."""
    mpb = _parse_bytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    )
    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            return len(files)
        try:
            sz = os.path.getsize(p.path)
        except OSError:
            return len(files)
        total += max(1, math.ceil(sz / mpb))
    return total


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to total parallelism iff its scan has too few
    splits to keep the cluster busy (splits*2 <= cores). Non-file-backed
    plans (in-memory ranges, mocks) count as unsplit and spread."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # non-file source — treat as a single split
        files = []
    splits = _est_splits(df, files) if files else 0
    if splits * 2 <= target:
        return df.repartition(target)
    return df
