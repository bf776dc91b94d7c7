"""Chained pipeline keys: whole COMPOSITIONS under the per-round hash
gate, not just their stages (r12 verdict #5).

The reference's end-to-end posture is ingest -> dedup-at-sink ->
post-ingest SQL (duck.go:299-419's rotation loop feeding duck.go:49-52's
query runner); this repo's examples/ingest_to_training.py is that
workflow re-expressed Spark-first (streaming ledger dedup -> curation ->
sequence packing), engine-tested for invariants in
test_ingest_to_training.py. What the example CANNOT give the driver is a
hash-checked oracle — its input is a synthesized topic, not the shared
parquet tables. This module registers the same POLICY chain over the
``documents`` table so DuckDB can replay it verbatim:

  1. exact content dedup, ingest-ledger semantics — keep the FIRST
     arrival (min doc_id) per md5(text) digest, the exact keep rule of
     the streaming sink's cross-epoch ledger (streaming/pipeline.py
     dedup_keys; d08's keep="first" policy face);
  2. t02's quality score, gated at a fixed floor — the curation gate of
     the example's curate() phase (same stopword/punct/length
     heuristic, same 4dp rounding on BOTH engines so the gate decision
     is identical by construction);
  3. t12's concatenate-and-chop sequence packing over the survivors
     (pack_sequences, the example's shard() phase) — per-source token
     cumsum in doc_id order at the example's capacity.

A regression anywhere in the chain — the dedup keep rule, the gate
arithmetic, the pack cumsum, or HOW THE STAGES COMPOSE (e.g. packing
before gating would shift every downstream seq_id) — flips the hash
even when each stage's own key stays green.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.operators.text import (
    PUNCT_CLASS,
    STOPWORDS,
    pack_sequences,
    tokens,
)
from quacfka_spark.registry import query

# The example's packing capacity (examples/ingest_to_training.py
# _CAPACITY); t12's fixture constant happens to match.
_E01_CAPACITY = 128
# Quality floor: keeps ~40% of the fixture corpus at every SF (measured
# 213/500 at sf0.001, 200/500 at sf0.01, 1996/4992 at sf0.1) with no
# boundary mass at the cut (zero docs within 2e-4 of 0.7 at any SF) —
# the gate-below-measured rule applied to a filter constant. Both
# engines gate on the IDENTICALLY-ROUNDED 4dp score, so the decision
# cannot diverge on representation noise.
_E01_QUALITY_CUT = 0.7


def _e01_oracle() -> str:
    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return f"""
    WITH keep AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM documents) WHERE rn = 1),
    m AS (
      SELECT d.doc_id, d.source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
               AS n_tokens,
             CAST(len(regexp_extract_all(text, '{PUNCT_CLASS}'))
               AS BIGINT) AS n_punct,
             CAST(len(regexp_extract_all(text, '{stop_re}')) AS BIGINT)
               AS n_stop
      FROM documents d JOIN keep k USING (doc_id)),
    q AS (
      SELECT doc_id, source, n_tokens,
             ROUND(n_stop * 1.0 / n_tokens - n_punct * 1.0 / n_chars
                   + LEAST(n_tokens, 100) / 100.0, 4) AS quality
      FROM m),
    g AS (SELECT * FROM q WHERE quality >= {_E01_QUALITY_CUT}),
    c AS (
      SELECT doc_id, source, n_tokens, quality,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM g)
    SELECT doc_id, source, n_tokens, quality,
           CAST((cum - n_tokens) // {_E01_CAPACITY} AS BIGINT) AS seq_id,
           CAST((cum - n_tokens) % {_E01_CAPACITY} AS BIGINT) AS offset,
           ((cum - n_tokens) % {_E01_CAPACITY} + n_tokens
             > {_E01_CAPACITY}) AS crosses_boundary
    FROM c ORDER BY source, doc_id
    """


@query(
    "e01_ingest_to_training",
    oracle=_e01_oracle(),
    doc="Chained certification of the ingest->curation->packing "
    "composition (r12 verdict #5): ledger-semantics exact dedup (keep "
    "first arrival per md5 digest) -> t02 quality gate at a measured "
    "floor -> t12 sequence packing of the survivors, hash-checked "
    "end-to-end against a DuckDB oracle replaying the identical "
    "policy. The per-stage keys (d01/d08, t02, t12) certify each "
    "stage; this key certifies their COMPOSITION — stage order and "
    "inter-stage contracts — so e.g. a pack that stopped respecting "
    "the gate would flip the hash while every stage key stayed green. "
    "Mirrors examples/ingest_to_training.py (engine-tested invariants) "
    "on the shared tables where an oracle can see it.",
)
def e01_ingest_to_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): stage 1's keep-set is a groupBy on the
    16-byte digest with a map-side partial min — document bytes never
    enter that exchange — and the survivors join back on doc_id (at
    real scale the narrow keep-set is also a bloom-filter pushdown
    candidate). Stage 2 is one codegen'd scan projection, no shuffle.
    Stage 3 shuffles only (doc_id, source, n_tokens, quality) rows
    keyed on the stream id (pack_sequences' contract). Total: two
    narrow exchanges plus the unavoidable per-stream pack window;
    text moves zero times after the digest scan."""
    t = load_views(spark, sf_dir)
    docs = t["documents"]
    keep = (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = docs.join(keep, "doc_id")
    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"
    m = kept.select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(PUNCT_CLASS), 0))
        .cast("bigint")
        .alias("n_punct"),
        F.size(F.regexp_extract_all("text", F.lit(stop_re), 0))
        .cast("bigint")
        .alias("n_stop"),
    )
    quality = F.round(
        F.col("n_stop") / F.col("n_tokens")
        - F.col("n_punct") / F.col("n_chars")
        + F.least(F.col("n_tokens"), F.lit(100)) / 100.0,
        4,
    )
    gated = m.select(
        "doc_id", "source", "n_tokens", quality.alias("quality")
    ).filter(F.col("quality") >= _E01_QUALITY_CUT)
    return pack_sequences(
        gated, capacity=_E01_CAPACITY, carry=("quality",)
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        "quality",
        "seq_id",
        "offset",
        "crosses_boundary",
    ).orderBy("source", "doc_id")
