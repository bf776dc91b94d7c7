"""Cross-epoch NEAR-dup gate (PipelineConfig.neardup_col): rows whose
minhash band keys collide with >= neardup_min_bands bands recorded by an
earlier epoch are dropped at the sink — the approximate streaming form
of d03p, gating re-crawled / lightly-edited content the exact-digest
ledger (dedup_keys) can never catch.

Everything here is deterministic: fixed texts, seeded xxhash64 hashes —
the assertions pin exact row sets, not probabilities. The band ledger is
the only cross-epoch state ((band, sig) int pairs, no payloads), and the
gate sees strictly-earlier epochs only (the D19 replay-idempotence rule
shared with the exact ledger).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from quacfka_spark.sources.kafka import decode_json
from quacfka_spark.streaming import PipelineConfig, StreamingPipeline

SCHEMA = "doc_id bigint, text string"


def _doc(i: int, n: int = 60, flip_last: bool = False) -> str:
    toks = [f"w{i}t{k}" for k in range(n)]
    if flip_last:
        toks[-1] = "FLIPPED"
    return " ".join(toks)


def _payloads(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).select(
        F.encode(F.to_json(F.struct("doc_id", "text")), "utf-8").alias("value")
    )


def _write_epochs(spark, d: str, epochs) -> None:
    for rows in epochs:
        _payloads(spark, rows).coalesce(1).write.mode("append").parquet(d)


def _run(spark, src: str, out: str, **cfg) -> StreamingPipeline:
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
            dest_table="messages",
            available_now=True,
            neardup_col="r.text",
            **cfg,
        ),
        decode=lambda df: decode_json(df, SCHEMA),
    )
    q = pipe.start()
    q.awaitTermination(180)
    assert pipe.error() is None
    return pipe


def test_neardup_gate_drops_history_collisions(spark, tmp_path):
    """Epoch 2's exact copy AND one-token-changed variant of epoch-1
    docs are dropped (>= 2 band collisions); a fresh doc passes. The
    one-token edit on a 60-token doc changes only the trailing
    shingles, so >= 2 of the 4 band keys (each over 3 of the 12
    minhash folds) still agree — the classic LSH near-dup catch that
    an exact digest misses."""
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    e1 = [(0, _doc(0)), (1, _doc(1)), (2, _doc(2))]
    e2 = [
        (10, _doc(0)),                       # exact text copy, new id
        (11, _doc(1, flip_last=True)),       # near-dup variant
        (12, _doc(99)),                      # fresh
    ]
    _write_epochs(spark, src, [e1, e2])
    pipe = _run(spark, src, out)

    raw = spark.read.parquet(os.path.join(out, "messages"))
    kept = {r.doc_id for r in raw.select("r.doc_id").collect()}
    assert kept == {0, 1, 2, 12}
    assert pipe.metrics.records_consumed == 6
    assert pipe.metrics.records_inserted == 4
    # ledger state is (band, sig) pairs only — no payload column (the
    # extra `epoch` is the directory partition key, not stored data)
    ledger = spark.read.parquet(os.path.join(out, "_neardup_ledger", "epoch=0"))
    assert sorted(ledger.columns) == ["band", "sig"]


def test_neardup_within_epoch_lands_together(spark, tmp_path):
    """The gate is epoch-granular by design: two near-identical docs in
    the SAME epoch both land (history is strictly earlier epochs), and
    a later epoch is gated against both."""
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    e1 = [(0, _doc(0)), (1, _doc(0, flip_last=True))]  # in-epoch near-pair
    e2 = [(2, _doc(0))]  # collides with epoch-1 content
    _write_epochs(spark, src, [e1, e2])
    _run(spark, src, out)

    raw = spark.read.parquet(os.path.join(out, "messages"))
    kept = {r.doc_id for r in raw.select("r.doc_id").collect()}
    assert kept == {0, 1}


def test_neardup_composes_with_exact_dedup(spark, tmp_path):
    """dedup_keys and neardup_col stack: the exact ledger collapses the
    in-batch duplicate row, the band ledger drops the cross-epoch
    near-dup, and fresh content flows through both gates."""
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    e1 = [(0, _doc(0)), (1, _doc(1))]
    e2 = [
        (0, _doc(0)),                    # exact row dup -> exact ledger
        (5, _doc(1, flip_last=True)),    # near-dup -> band ledger
        (6, _doc(77)),                   # fresh
    ]
    _write_epochs(spark, src, [e1, e2])
    pipe = _run(spark, src, out, dedup_keys=["r.doc_id", "r.text"])

    raw = spark.read.parquet(os.path.join(out, "messages"))
    kept = {r.doc_id for r in raw.select("r.doc_id").collect()}
    assert kept == {0, 1, 6}
    assert pipe.metrics.records_consumed == 5
    assert pipe.metrics.records_inserted == 3


def test_neardup_ledger_horizon_prunes_and_readmits(spark, tmp_path):
    """With dedup_ledger_epochs=1 the band ledger keeps one epoch of
    state: epoch 3's copy of epoch-1 content re-admits (outside the
    window) while its copy of epoch-2 content still gates; on-disk
    state is pruned to the REPLAY-reachable window (bounded-state
    contract, shared with the exact ledger). The prune runs before the
    current epoch's checkpoint commits, so the current epoch's own
    window must survive it: after epoch N, dirs [N - horizon, N]
    remain — epoch N - horizon is deleted only once epoch N + 1 runs
    (D19 replay idempotence; round-6 advisor finding)."""
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    e1 = [(0, _doc(0))]
    e2 = [(1, _doc(1))]
    e3 = [(2, _doc(0)), (3, _doc(1))]  # old content + in-window content
    _write_epochs(spark, src, [e1, e2, e3])
    _run(spark, src, out, dedup_ledger_epochs=1)

    raw = spark.read.parquet(os.path.join(out, "messages"))
    kept = {r.doc_id for r in raw.select("r.doc_id").collect()}
    assert kept == {0, 1, 2}
    dirs = sorted(os.listdir(os.path.join(out, "_neardup_ledger")))
    assert dirs == ["epoch=1", "epoch=2"]


def test_gate_band_family_matches_batch_d03p_family(spark, tmp_path):
    """The d03g certification key scores a BATCH replica of the gate's
    pair policy — which certifies the production gate only if the
    pipeline's band keys (_nd_band_sigs) and the batch family
    (_minhash_bands, xxhash64) are the SAME function of the text. Pin
    byte-equality of the (band, sig) sets per doc so a drift in either
    implementation (seeds, band size, shingle convention) breaks here
    rather than silently de-certifying d03g."""
    import os

    from pyspark.sql import functions as F

    from quacfka_spark.operators.dedup import _minhash_bands
    from quacfka_spark.streaming.pipeline import (
        PipelineConfig, StreamingPipeline,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again & again!",
        "completely different content about spark shuffle partitions",
        "ts",  # sub-shingle doc: whole-token-string convention
        "",
    ]
    d = str(tmp_path / "fam")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id bigint, text string, source string",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    import tests.conftest as cf

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"]:
        os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", f"{d}/{name}.parquet")

    batch = {
        (r["doc_id"], r["band"], r["sig"])
        for r in _minhash_bands(spark, d, family="xxhash64")
        .select("doc_id", "band", "sig")
        .collect()
    }

    # the pipeline's band derivation, driven directly (no stream needed)
    pipe = StreamingPipeline.__new__(StreamingPipeline)
    narrow = (
        spark.read.parquet(os.path.join(d, "documents.parquet"))
        .select("doc_id", F.col("text").alias("__nd_txt"))
    )
    gate = {
        (r["doc_id"], r["band"], r["sig"])
        for r in pipe._nd_band_sigs(narrow)
        .select(
            "doc_id", F.posexplode_outer("__nd_sigs").alias("band", "sig")
        )
        .collect()
    }
    assert gate == batch
