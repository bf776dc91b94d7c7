"""Mock sources — reference D3 (MockKafka, /root/reference/kafka.go:238-264).

The reference spawns 10 goroutines generating random protobufs from a
sample message via protorand. Spark-first: the ``rate`` source provides
the ticking row stream; deterministic column generators derive a nested
payload from the sequence number (so tests are reproducible, unlike
protorand), and ``to_json``-encoded bytes mirror the Kafka source's
``value: binary`` column so the full decode path (D4/D7) is exercised
without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The nested message shape used by tests — mirrors the reference README's
# normalizer example (site struct + repeated deals, README.md:45-46,
# 116-130).
NESTED_SCHEMA = T.StructType(
    [
        T.StructField(
            "site",
            T.StructType(
                [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
            ),
        ),
        T.StructField("user_id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField(
            "deals",
            T.ArrayType(
                T.StructType(
                    [T.StructField("id", T.LongType()), T.StructField("kind", T.StringType())]
                )
            ),
        ),
    ]
)


def nested_payload(seq: F.Column) -> F.Column:
    """Deterministic nested struct derived from the rate-source sequence:
    0-2 deals per row (seq % 3), so explode/empty-list paths are hit."""
    deal = lambda k: F.struct(
        (seq * 10 + k).alias("id"),
        F.concat(F.lit("kind_"), ((seq + k) % 4).cast("string")).alias("kind"),
    )
    deals = F.when(seq % 3 == 0, F.array().cast(NESTED_SCHEMA["deals"].dataType)).when(
        seq % 3 == 1, F.array(deal(0))
    ).otherwise(F.array(deal(0), deal(1)))
    return F.struct(
        F.struct((seq % 100).alias("id"), F.concat(F.lit("site_"), (seq % 100).cast("string")).alias("name")).alias("site"),
        (seq % 1000).alias("user_id"),
        F.round(seq % 997 * 1.5, 2).alias("amount"),
        deals.alias("deals"),
    )


def mock_nested_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Decoded-shape mock: rate source -> nested struct column ``r`` +
    ``timestamp`` (what decode_json/decode_protobuf would output)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("timestamp"), nested_payload(F.col("value")).alias("r")
    )


def mock_kafka_bytes_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Byte-level mock matching the Kafka source schema (``value: binary``
    + ``timestamp``): payloads are JSON-encoded nested messages, so the
    pipeline's full strip/decode path runs without a broker."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("timestamp"),
        F.encode(F.to_json(nested_payload(F.col("value"))), "utf-8").alias("value"),
    )
