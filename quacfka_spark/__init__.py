"""quacfka_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of loicalleyne/quacfka (reference studied at
/root/reference, snapshot 2025-11-14).

The reference is a Go streaming ETL orchestrator (Kafka -> protobuf decode
-> Arrow -> DuckDB + arbitrary SQL on rotated files). This package
re-expresses that capability Spark-first:

- ``sources``    : Kafka/rate/file stream builders + binary decode helpers
                   (reference kafka.go, proto.go)
- ``plans``      : normalizer/flatten compiler, custom fields, transforms
                   (reference quacfka.go:106-120, custom.go)
- ``streaming``  : the pipeline orchestrator — foreachBatch sink, rotation,
                   post-SQL runner, completed-path feed, metrics
                   (reference duck.go, metrics.go)
- ``operators``  : the relational/SQL surface (SURVEY.md §2b Q1-Q24, S1-S6)
                   plus LLM-data-pipeline operators: dedup, similarity
                   search, text analysis, multimodal columns
- ``functions``  : reusable column expressions (vector math, hashing)

Every declared query is registered in ``registry.QUERIES`` with a DuckDB
oracle SQL string so the driver can hash-check results.
"""

from quacfka_spark.registry import QUERIES, get_queries, get_oracles

__all__ = [
    "QUERIES",
    "get_queries",
    "get_oracles",
    # convenience re-exports (see MIGRATION.md for the reference mapping)
    "StreamingPipeline",
    "PipelineConfig",
    "SQLRunner",
    "NormalizerSpec",
    "TransformRegistry",
    # composed-pipeline building blocks (examples/training_data_pipeline.py)
    "minhash_pairs",
    "label_propagate",
    "bm25_topk",
    "pack_sequences",
    "knn_edges",
    "choose_salt",
    "choose_band_bits",
    "cosine_lsh_pairs",
]
__version__ = "0.1.0"


def __getattr__(name: str):
    """Lazy re-exports so `import quacfka_spark` stays light."""
    if name in ("StreamingPipeline", "PipelineConfig", "SQLRunner"):
        from quacfka_spark import streaming

        return getattr(streaming, name)
    if name == "NormalizerSpec":
        from quacfka_spark.plans.normalizer import NormalizerSpec

        return NormalizerSpec
    if name == "TransformRegistry":
        from quacfka_spark.plans.custom import TransformRegistry

        return TransformRegistry
    if name in ("minhash_pairs", "label_propagate"):
        from quacfka_spark.operators import dedup

        return getattr(dedup, name)
    if name == "bm25_topk":
        from quacfka_spark.operators.text import bm25_topk

        return bm25_topk
    if name == "pack_sequences":
        from quacfka_spark.operators.text import pack_sequences

        return pack_sequences
    if name == "knn_edges":
        from quacfka_spark.operators.similarity import knn_edges

        return knn_edges
    if name == "choose_salt":
        from quacfka_spark.operators.lsh_tuning import choose_salt

        return choose_salt
    if name == "choose_band_bits":
        from quacfka_spark.operators.lsh_tuning import choose_band_bits

        return choose_band_bits
    if name == "cosine_lsh_pairs":
        # the full knob surface (salt_buckets/auto, bits/bands/
        # auto_bits/auto_bands) for composed vector-dedup pipelines
        # (d08's recipe: pairs -> label_propagate -> keep-the-smallest)
        from quacfka_spark.operators.dedup import cosine_lsh_pairs

        return cosine_lsh_pairs
    raise AttributeError(name)
