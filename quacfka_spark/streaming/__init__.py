"""Streaming pipeline orchestrator — the Spark-first re-expression of the
reference's Orchestrator/DuckIngest/DuckRunner machinery (SURVEY.md §3.1,
D13-D24)."""

from quacfka_spark.streaming.pipeline import (
    PipelineConfig,
    PipelineMetrics,
    SQLRunner,
    StreamingPipeline,
)

__all__ = ["PipelineConfig", "PipelineMetrics", "SQLRunner", "StreamingPipeline"]
