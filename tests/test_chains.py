"""Chained-key (e01) composition invariants — the properties that make
it a certification of the COMPOSITION, not a re-test of its stages
(r12 verdict #5)."""

from __future__ import annotations

from pyspark.sql import functions as F

import tests.conftest as cf
from quacfka_spark.operators.chains import (
    _E01_QUALITY_CUT,
    e01_ingest_to_training,
)


def test_e01_stage_invariants(spark):
    out = e01_ingest_to_training(spark, cf.SMOKE_DIR)
    rows = out.collect()
    assert rows, "chain must keep a nontrivial corpus"
    # gate respected end-to-end: nothing below the floor survives pack
    assert all(r["quality"] >= _E01_QUALITY_CUT for r in rows)
    # ledger dedup respected: kept docs have pairwise-distinct digests
    docs = spark.read.parquet(f"{cf.SMOKE_DIR}/documents.parquet")
    kept_ids = [r["doc_id"] for r in rows]
    n_digests = (
        docs.filter(F.col("doc_id").isin(kept_ids))
        .select(F.md5("text"))
        .distinct()
        .count()
    )
    assert n_digests == len(kept_ids)
    # pack arithmetic internally consistent per stream: offset is the
    # running cumsum mod capacity, seq_id its div
    by_src: dict[str, int] = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["doc_id"])):
        cum = by_src.get(r["source"], 0)
        assert r["offset"] == cum % 128 and r["seq_id"] == cum // 128
        assert r["crosses_boundary"] == (cum % 128 + r["n_tokens"] > 128)
        by_src[r["source"]] = cum + r["n_tokens"]


def test_e01_is_order_sensitive(spark):
    """The key certifies STAGE ORDER: packing the UNGATED corpus gives
    different sequence assignments for some doc the gate keeps — i.e.
    a regression that packed before gating could not hash-match. If
    this ever fails, the fixture stopped exercising the composition
    (the gate removed nothing ahead of any kept doc) and the key has
    silently degraded to stage-testing."""
    from quacfka_spark.operators.text import pack_sequences, tokens

    out = e01_ingest_to_training(spark, cf.SMOKE_DIR)
    docs = spark.read.parquet(f"{cf.SMOKE_DIR}/documents.parquet")
    ungated = pack_sequences(
        docs.select(
            "doc_id",
            "source",
            F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        )
    ).select("doc_id", F.col("seq_id").alias("seq_u"), F.col("offset").alias("off_u"))
    diff = (
        out.join(ungated, "doc_id")
        .filter(
            (F.col("seq_id") != F.col("seq_u"))
            | (F.col("offset") != F.col("off_u"))
        )
        .count()
    )
    assert diff > 0


def test_pack_sequences_carry_columns(spark):
    """carry= rides narrow columns through the pack window unchanged
    and keeps the computed columns' schema tail intact."""
    from quacfka_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [(1, "s", 10, 0.5), (2, "s", 200, 0.9), (3, "t", 7, 0.1)],
        "doc_id bigint, source string, n_tokens bigint, quality double",
    )
    got = pack_sequences(df, capacity=64, carry=("quality",))
    assert got.columns == [
        "doc_id", "source", "n_tokens", "quality",
        "seq_id", "offset", "crosses_boundary",
    ]
    q = {r["doc_id"]: r["quality"] for r in got.collect()}
    assert q == {1: 0.5, 2: 0.9, 3: 0.1}
