"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All declared queries live in ``quacfka_spark.registry`` (populated by the
operator modules: relational Q1-Q24, streaming-batch S1-S5, text T,
dedup D, similarity SIM, multimodal M).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quacfka_spark.registry import get_oracles, get_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q11_multiway_join"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 shape: 5-way join + agg) on sf0.001."""
    return get_queries()[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return get_queries()


def oracle_sql() -> dict[str, str]:
    return get_oracles()
