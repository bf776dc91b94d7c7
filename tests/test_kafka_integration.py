"""Opt-in REAL-Kafka integration test for D1/D2 (reference
kafka.go:90-167: brokers, consumer groups, offsets, SASL/TLS).

The sandbox has no broker and no spark-sql-kafka connector jar, so the
default test run exercises the byte-identical mock source instead
(tests/test_pipeline.py). Point this module at a real broker to drive
``kafka_stream``'s actual connector surface end-to-end:

    SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092 \
    SPARK_GRAFT_KAFKA_PACKAGE=org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 \
    python -m pytest tests/test_kafka_integration.py -q

Optional: SPARK_GRAFT_KAFKA_SASL_USERNAME / _PASSWORD / _TLS=1 exercise
the SASL/PLAIN (+TLS) auth path (kafka.py maps them to
kafka.security.protocol / sasl.jaas.config exactly as the reference's
WithSASL/WithTLS options do).

Without SPARK_GRAFT_KAFKA_BOOTSTRAP every test here skips cleanly.
"""

from __future__ import annotations

import os
import uuid

import pytest

BROKER = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BROKER,
    reason="real-Kafka integration is opt-in: set SPARK_GRAFT_KAFKA_BOOTSTRAP",
)


@pytest.fixture(scope="module")
def kafka_spark():
    """Session with the Kafka connector on the classpath — separate from
    the shared test session because spark.jars.packages must be set at
    build time."""
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("quacfka-kafka-integration")
        .config("spark.sql.shuffle.partitions", "8")
    )
    pkg = os.environ.get("SPARK_GRAFT_KAFKA_PACKAGE")
    if pkg:
        builder = builder.config("spark.jars.packages", pkg)
    s = builder.getOrCreate()
    yield s
    s.stop()


def _auth_kwargs() -> dict:
    kw: dict = {"tls": os.environ.get("SPARK_GRAFT_KAFKA_TLS") == "1"}
    user = os.environ.get("SPARK_GRAFT_KAFKA_SASL_USERNAME")
    if user:
        kw["sasl_username"] = user
        kw["sasl_password"] = os.environ.get("SPARK_GRAFT_KAFKA_SASL_PASSWORD")
    return kw


def _produce(spark, topic: str, payloads: list[bytes]) -> None:
    df = spark.createDataFrame([(p,) for p in payloads], "value binary")
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", BROKER)
        .option("topic", topic)
        .save()
    )


def test_kafka_roundtrip_protobuf(kafka_spark, tmp_path):
    """Produce wire-format protobuf to a fresh topic, consume through
    kafka_stream (consumer group + bounded offsets + min_partitions),
    decode, and assert exactly-once arrival of every record."""
    from pyspark.sql import functions as F

    from quacfka_spark.sources.kafka import kafka_stream
    from quacfka_spark.sources.proto_jvm import decode_protobuf_auto
    from quacfka_spark.sources.proto_wire import Field, MessageSpec, encode_message

    spec = MessageSpec([Field(1, "id", "int64"), Field(2, "name", "string")])
    topic = f"quacfka-it-{uuid.uuid4().hex[:12]}"
    n = 500
    _produce(
        kafka_spark,
        topic,
        [encode_message({"id": i, "name": f"rec{i}"}, spec) for i in range(n)],
    )

    src = kafka_stream(
        kafka_spark,
        BROKER,
        topic,
        group_id=f"quacfka-it-{uuid.uuid4().hex[:8]}",
        starting_offsets="earliest",
        max_offsets_per_trigger=200,  # D22 backpressure surface
        min_partitions=4,             # D2 fan-out surface
        **_auth_kwargs(),
    )
    decoded = decode_protobuf_auto(src, spec).select("r.id", "r.name")
    q = (
        decoded.writeStream.format("memory")
        .queryName("kafka_it_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = kafka_spark.sql(
        "SELECT id, name FROM kafka_it_sink ORDER BY id"
    ).collect()
    assert len(got) == n
    assert [r["id"] for r in got] == list(range(n))
    assert got[7]["name"] == "rec7"


def test_kafka_offsets_resume(kafka_spark, tmp_path):
    """Checkpoint restart consumes only records produced after the first
    run — the D19 exactly-once property against a real broker."""
    from quacfka_spark.sources.kafka import kafka_stream
    from quacfka_spark.sources.proto_wire import Field, MessageSpec, encode_message
    from quacfka_spark.sources.proto_jvm import decode_protobuf_auto

    spec = MessageSpec([Field(1, "id", "int64")])
    topic = f"quacfka-it-{uuid.uuid4().hex[:12]}"
    ckpt = str(tmp_path / "ckpt")

    def run_once() -> int:
        src = kafka_stream(
            kafka_spark, BROKER, topic,
            starting_offsets="earliest", **_auth_kwargs(),
        )
        q = (
            decode_protobuf_auto(src, spec)
            .select("r.id")
            .writeStream.format("memory")
            .queryName("kafka_it_resume")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return kafka_spark.sql("SELECT COUNT(*) c FROM kafka_it_resume").collect()[0]["c"]

    _produce(kafka_spark, topic, [encode_message({"id": i}, spec) for i in range(100)])
    assert run_once() == 100
    _produce(kafka_spark, topic, [encode_message({"id": i}, spec) for i in range(100, 150)])
    # memory sink truncates per restart; the checkpoint must admit ONLY the 50 new records
    assert run_once() == 50
