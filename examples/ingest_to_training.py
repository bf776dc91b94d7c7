"""Ingest-to-training-shards: the full streaming -> curation -> packing
composition — what a quacfka user's workflow becomes end to end.

    kafka-ish topic (binary JSON doc payloads, duplicates across epochs)
      -> StreamingPipeline                       the reference's D13-D24 loop
           decode_json                           D7
           dedup_keys=["r.text"]                 cross-epoch content dedup
           NormalizerSpec -> docs_norm sink      D10/D13 per-epoch parquet
      -> curation over the normalized sink       batch operators
           PII masking (scrub_pii)               t10 machinery
           quality floor (token/stopword exprs)  t02 machinery
      -> pack_sequences(capacity)                t12 machinery, public API
      -> train_shards parquet                    the training-ready output

The streaming phase is where bytes move: decode runs once per payload,
duplicate docs are dropped at the sink by the digest ledger (content
dedup while ingesting — the reference cannot do this at all), and the
per-epoch dirs arrive already columnar. The curation phase then reads
ONLY the normalized columns it needs, masks and gates text, and the
packing phase shuffles nothing but (doc_id, source, n_tokens).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quacfka_spark.operators.text import pack_sequences, scrub_pii
from quacfka_spark.plans.normalizer import NormalizerSpec
from quacfka_spark.sources.kafka import decode_json
from quacfka_spark.streaming import PipelineConfig, StreamingPipeline

DOC_SCHEMA = (
    "struct<doc_id:bigint,text:string,lang:string,source:string>"
)
_QUALITY_CUT = 0.27
_CAPACITY = 128

_WORDS = (
    "the data spark join window table scan filter value row agg batch "
    "query merge order line part key hash fast slow small"
).split()


def _payload(seq: F.Column) -> F.Column:
    """Deterministic doc payload: ~24-word pseudo-sentences, 4 langs,
    8 sources. Same seq => same text, so replaying ids across epochs
    creates genuine content duplicates for the ledger to drop."""
    words = [
        F.element_at(
            F.array(*[F.lit(w) for w in _WORDS]),
            ((seq * (i + 3) + i * 7) % len(_WORDS) + 1).cast("int"),
        )
        for i in range(24)
    ]
    # the word-mix above repeats with period |words|; the id-derived
    # token keeps every doc_id's text globally unique so the ONLY
    # duplicate content is the deliberate cross-epoch id replay
    uniq = F.concat(F.lit("u"), (seq * 2654435761 % 1_000_000_007).cast("string"))
    return F.struct(
        seq.alias("doc_id"),
        F.concat_ws(" ", uniq, *words).alias("text"),
        F.concat(F.lit("l"), (seq % 4).cast("string")).alias("lang"),
        F.concat(F.lit("src"), (seq % 8).cast("string")).alias("source"),
    )


def write_topic(spark: SparkSession, src: str, batches: list[tuple[int, int]]) -> None:
    """Materialize the 'topic at rest': one file per micro-batch of
    encoded JSON doc payloads; overlapping id ranges => cross-epoch
    duplicate content."""
    for lo, hi in batches:
        (
            spark.range(lo, hi)
            .select(F.encode(F.to_json(_payload(F.col("id"))), "utf-8").alias("value"))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )


def ingest(spark: SparkSession, src: str, out: str) -> StreamingPipeline:
    """Phase 1: the reference's rotation loop with content dedup at the
    sink. The normalized per-epoch parquet is the curation input."""
    source = (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    pipe = StreamingPipeline(
        spark,
        source,
        PipelineConfig(
            output_dir=out,
            dest_table="docs",
            available_now=True,
            dedup_keys=["r.text"],
        ),
        decode=lambda df: decode_json(df, DOC_SCHEMA),
        normalizer=NormalizerSpec(
            fields=["r.doc_id", "r.text", "r.lang", "r.source"],
            aliases=["doc_id", "text", "lang", "source"],
        ),
    )
    q = pipe.start()
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("ingest did not finish within 300s")
    err = pipe.error()
    if err is not None:
        raise RuntimeError(f"ingest failed: {err}")
    return pipe


def curate(spark: SparkSession, out: str) -> DataFrame:
    """Phase 2: PII mask + quality gate over the normalized sink."""
    docs = spark.read.parquet(os.path.join(out, "docs_norm"))
    masked = docs.withColumn("text", scrub_pii(F.col("text")))
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("bigint")
    stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of")))
    quality = (stop / F.greatest(n_tokens, F.lit(1))) + F.least(
        n_tokens, F.lit(100)
    ) / 100.0
    return masked.select(
        "doc_id",
        "text",
        "lang",
        "source",
        n_tokens.alias("n_tokens"),
        F.round(quality, 4).alias("quality"),
    ).filter(F.col("quality") >= _QUALITY_CUT)


def shard(curated: DataFrame, shards_dir: str, capacity: int = _CAPACITY) -> DataFrame:
    """Phase 3: pack into fixed-capacity training sequences and write
    the shards. Text rejoins the narrow packing frame by doc_id only at
    write time."""
    packed = pack_sequences(
        curated.select("doc_id", "source", "n_tokens"), capacity=capacity
    )
    shards = curated.select("doc_id", "text", "lang").join(packed, "doc_id")
    shards.write.mode("overwrite").partitionBy("source").parquet(shards_dir)
    return shards


def run(spark: SparkSession, work_dir: str) -> dict:
    src = os.path.join(work_dir, "topic")
    out = os.path.join(work_dir, "ingested")
    shards_dir = os.path.join(work_dir, "train_shards")
    # 3 micro-batches; the 2nd and 3rd replay half the previous range
    write_topic(spark, src, [(0, 400), (200, 600), (400, 800)])
    pipe = ingest(spark, src, out)
    curated = curate(spark, out)
    shard(curated, shards_dir)
    back = spark.read.parquet(shards_dir)
    lang_mix = {
        r["lang"]: r["n"]
        for r in back.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    report = {
        "consumed": pipe.metrics.records_consumed,
        "inserted": pipe.metrics.records_inserted,
        "dedup_dropped": pipe.metrics.records_consumed
        - pipe.metrics.records_inserted,
        "curated": curated.count(),
        "shard_rows": back.count(),
        "sequences": back.select("source", "seq_id").distinct().count(),
        "tokens": back.agg(F.sum("n_tokens")).collect()[0][0],
        "lang_mix": lang_mix,
        "capacity": _CAPACITY,
        "quality_cut": _QUALITY_CUT,
    }
    # the dataset card every real pipeline ships next to its shards:
    # provenance counts (what was consumed, deduped, gated), the mix,
    # and the packing contract a loader needs
    with open(os.path.join(shards_dir, "_manifest.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    return report


def main() -> None:
    import tempfile

    from quacfka_spark.session import get_spark

    spark = get_spark("ingest-to-training")
    with tempfile.TemporaryDirectory() as d:
        print(json.dumps(run(spark, d)))
    spark.stop()


if __name__ == "__main__":
    main()
