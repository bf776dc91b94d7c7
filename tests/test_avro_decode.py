"""decode_avro: the Avro flavor of the D7/D8 decode surface.

The spark-avro data source is an external module (same deployment story
as spark-protobuf: only Avro-core jars ship inside plain pyspark), so
this file probes availability at session start and skips cleanly when
the module isn't loaded — launch pytest with
``--packages org.apache.spark:spark-avro_2.13:<ver>`` (or the
SPARK_GRAFT_AVRO_PACKAGE env hook below) to exercise the round-trip,
PERMISSIVE corrupt-drop, and FAILFAST semantics against the official
JVM codec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quacfka_spark.sources.kafka import decode_avro


@pytest.fixture(scope="module", autouse=True)
def _require_spark_avro(spark):
    """Skip the module unless the spark-avro data source is loaded."""
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(
            to_avro(F.struct("id"), '{"type":"record","name":"p","fields":'
                                    '[{"name":"id","type":"long"}]}')
        ).collect()
    except Exception as e:
        pytest.skip(f"spark-avro data source not loaded: {str(e)[:120]}")

AVRO_SCHEMA = """
{
  "type": "record", "name": "Event",
  "fields": [
    {"name": "id", "type": "long"},
    {"name": "name", "type": "string"},
    {"name": "score", "type": "double"}
  ]
}
"""


def _payloads(spark, n=100):
    from pyspark.sql.avro.functions import to_avro

    rows = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )
    return rows.select(
        to_avro(F.struct("id", "name", "score"), AVRO_SCHEMA).alias("value")
    )


def test_avro_round_trip(spark):
    decoded = decode_avro(_payloads(spark), AVRO_SCHEMA).select("r.*")
    got = {r["id"]: (r["name"], r["score"]) for r in decoded.collect()}
    assert len(got) == 100
    assert got[7] == ("n7", 10.5)


def test_avro_permissive_drops_corrupt(spark):
    good = _payloads(spark, 50)
    # truncated payloads: chop every record to 1 byte — structurally
    # undecodable for a record with a long + string + double
    bad = good.select(F.expr("substring(value, 1, 1)").alias("value")).limit(10)
    mixed = good.union(bad)
    out = decode_avro(mixed, AVRO_SCHEMA)
    assert out.count() == 50  # the 10 corrupt payloads dropped


def test_avro_failfast_raises(spark):
    bad = _payloads(spark, 5).select(
        F.expr("substring(value, 1, 1)").alias("value")
    )
    with pytest.raises(Exception):
        decode_avro(bad, AVRO_SCHEMA, permissive=False).collect()
