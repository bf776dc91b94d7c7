"""The composed curation pipeline (examples/training_data_pipeline.py)
holds its invariants: quality floor respected, content digests unique,
and no embedding near-dup cluster member (keep=false) survives."""

from __future__ import annotations

from pyspark.sql import functions as F

from examples.training_data_pipeline import curate
from quacfka_spark.operators.dedup import d08_dedup_keep

import tests.conftest as cf


def test_curation_invariants(spark):
    corpus = curate(spark, cf.SMOKE_DIR).cache()
    rows = corpus.count()
    assert 0 < rows < 500  # filters actually fired

    assert corpus.filter(F.col("quality") < 0.45).count() == 0

    digests = corpus.select(F.md5("text").alias("d"))
    assert digests.distinct().count() == rows

    dropped = (
        d08_dedup_keep(spark, cf.SMOKE_DIR)
        .filter(~F.col("keep"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    assert corpus.join(dropped, "doc_id").count() == 0
    corpus.unpersist()


def test_no_contaminated_doc_survives(spark):
    from quacfka_spark.operators.text import t08_decontaminate

    corpus = curate(spark, cf.SMOKE_DIR)
    contaminated = t08_decontaminate(spark, cf.SMOKE_DIR).select("doc_id").distinct()
    assert corpus.join(contaminated, "doc_id").count() == 0


def test_no_blocked_url_survives_and_mix_applied(spark):
    from examples.training_data_pipeline import _masked_corpus_dir
    from quacfka_spark.operators.extensions import x08_mix_resample
    from quacfka_spark.operators.text import T08_EVAL_SOURCE, t13_url_filter

    corpus = curate(spark, cf.SMOKE_DIR).cache()
    # blocked-domain ids derive from (doc_id, source, lang) only, so the
    # raw dir names the same ids the gated write dropped
    blocked = (
        t13_url_filter(spark, cf.SMOKE_DIR)
        .filter(~F.col("keep"))
        .select("doc_id")
    )
    assert corpus.join(blocked, "doc_id").count() == 0
    # the held-out eval set never ships
    eval_ids = (
        spark.read.parquet(f"{cf.SMOKE_DIR}/documents.parquet")
        .filter(F.col("source") == T08_EVAL_SOURCE)
        .select("doc_id")
    )
    assert corpus.join(eval_ids, "doc_id").count() == 0
    # every surviving doc is in the resampler's keep set — computed on
    # the same gated corpus curate() resamples (rates derive from the
    # post-gate token mass)
    gated = _masked_corpus_dir(spark, cf.SMOKE_DIR)
    mix_keep = x08_mix_resample(spark, gated).select("doc_id")
    assert corpus.join(mix_keep, "doc_id", "left_anti").count() == 0
    corpus.unpersist()
