"""End-to-end training-data curation pipeline — the composed use case
the individual d*/t*/sim* operators exist for.

    documents + embeddings
      -> URL/domain gate (t13 blocklist)             drop blocked domains/TLDs
      -> PII masking (t10 regexes)                   rewrite text in place
      -> text quality scoring (t02 machinery)        keep score >= cut
      -> repetition rules (t11, Gopher-style)        drop keep=false docs
      -> boilerplate screen (d09 chunk frequency)    drop >30%-boilerplate docs
      -> exact dedup on content digest (d01 shape)   keep first per digest
      -> text near-dup (MinHash+LSH, xxhash64)       drop non-representatives
      -> embedding near-dup keep-list (d07 -> d08)   drop keep=false rows
      -> benchmark decontamination (t08)             drop eval-overlap docs
      -> DSIR importance selection (t17)             keep target-like docs
      -> mixture reweighting (x08 resampling)        flatten the language mix
      -> token accounting (t01 shape)                corpus stats

Two-phase shape: phase 1 writes the PII-MASKED corpus at rest (one
scan, one write — this is where corpus bytes move), then EVERY curation
decision — repetition rules, boilerplate frequency, minhash shingles,
decontamination shingles — runs against the masked copy, so unmasked
text never feeds a tokenizer, a shuffle file, or a drop decision made
on different text than the corpus that ships. Phase-2 stages are narrow
projections, hash aggregates, or id-keyed joins: the only text-bytes
shuffle is the exact-dedup group-by on a 16-byte digest, and the
near-dup stage shuffles only (vec_id, band, sig) rows + verified pair
ids.

Run: python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.operators.dedup import (
    label_propagate,
    minhash_pairs,
    d08_dedup_keep,
)
from quacfka_spark.operators.dedup import d09_chunk_freq_dedup
from quacfka_spark.operators.extensions import x08_mix_resample
from quacfka_spark.operators.text import (
    T08_EVAL_SOURCE,
    scrub_pii,
    t08_decontaminate,
    t11_repetition_rules,
    t13_url_filter,
    t17_dsir_resample,
    t18_shuffle_shard,
    t19_split_assign,
)
from quacfka_spark.functions.text import tokens


_PHASE1_V = "v2"  # v2: URL gate (eval-exempt) before the masking write


def _masked_corpus_dir(spark: SparkSession, sf_dir: str) -> str:
    """Phase 1: apply the t13 URL/domain gate, then write the PII-masked
    survivors at rest (t10's regexes on the real text — no enrichment;
    that exists only so the oracle key has matches to verify) and return
    a fixture-layout dir pointing at it (other tables symlinked). The
    gate runs BEFORE the masking write — cheapest filter first: a
    blocked-domain doc is never regex-masked, never written, and never
    reaches a tokenizer. Every downstream operator loads THIS dir, so
    unmasked or blocked text never enters a shuffle file. Rewritten when
    the source fixture is newer (the stale-artifact guard the x06/x07
    helpers use)."""
    from quacfka_spark.catalog import TABLES
    from quacfka_spark.layout import artifact_dir, artifact_fresh, touch_done

    # artifact_dir handles abspath-before-tagging (a relative sf_dir
    # must not fork the tag or store broken relative symlinks) and the
    # `extra` arg versions the PIPELINE DEFINITION, not just the source:
    # artifact_fresh only compares mtimes, so a semantic change to this
    # phase (what gets gated, what gets masked) must change the artifact
    # name or a warehouse surviving from an older run would be reused
    # with the old semantics. Bump _PHASE1_V when phase-1 logic changes.
    sf_dir, wh, tag = artifact_dir(spark, sf_dir, extra=_PHASE1_V)
    dst = os.path.join(wh, f"qs_masked_{tag}")
    marker = os.path.join(dst, "documents.parquet", "_SUCCESS")
    src = os.path.join(sf_dir, "documents.parquet")
    if not artifact_fresh(marker, src):
        os.makedirs(dst, exist_ok=True)
        t = load_views(spark, sf_dir)
        # the gate curates the TRAINING corpus only: eval-source docs are
        # exempt — they exist to be decontaminated AGAINST (t08), never
        # ship, and URL-dropping one would silently weaken the
        # decontamination screen (a corpus doc overlapping a blocked
        # eval doc would sail through)
        url_drop = (
            t13_url_filter(spark, sf_dir)
            .filter(~F.col("keep"))
            .select("doc_id")
            .join(
                t["documents"]
                .filter(F.col("source") == T08_EVAL_SOURCE)
                .select("doc_id"),
                "doc_id",
                "left_anti",
            )
        )
        # one shared mask chain with t10 (order-sensitive; see scrub_pii)
        masked = t["documents"].join(url_drop, "doc_id", "left_anti").withColumn(
            "text", scrub_pii("text")
        )
        masked.write.mode("overwrite").parquet(
            os.path.join(dst, "documents.parquet")
        )
        # completion proof that survives marksuccessfuljobs=false —
        # artifact_fresh accepts _SUCCESS or this library marker, and
        # no longer infers completeness from part files
        touch_done(os.path.join(dst, "documents.parquet"))
        for name in TABLES:
            link = os.path.join(dst, f"{name}.parquet")
            if name == "documents":
                continue
            # lexists, not exists: a BROKEN symlink (exists False) must
            # be repaired, not tripped over with FileExistsError
            if os.path.lexists(link):
                os.unlink(link)
            os.symlink(os.path.join(sf_dir, f"{name}.parquet"), link)
    return dst


def curate(spark: SparkSession, sf_dir: str, quality_cut: float = 0.45) -> DataFrame:
    """Returns the curated corpus (doc_id, text, quality, n_tokens) after
    PII masking, quality/repetition filtering, exact + near dedup, and
    decontamination."""
    # 0. URL gate + PII masking FIRST, materialized at rest — blocked
    # docs are dropped before the masking write (see _masked_corpus_dir)
    # and all later stages (including the operator calls below) read the
    # gated, masked dir
    sf_dir = _masked_corpus_dir(spark, sf_dir)
    docs = load_views(spark, sf_dir)["documents"]

    # 0c. the held-out eval set never ships: those rows live in the
    # corpus table only as the decontamination reference (t08 reads them
    # from the gated dir itself) — a truly held-out benchmark cannot
    # appear in the training corpus
    docs = docs.filter(F.col("source") != T08_EVAL_SOURCE)

    # 1. quality score (t02's signals, one projection — scan-bound)
    tk = tokens("text")
    n_tokens = F.size(tk).cast("bigint")
    punct = F.length(F.regexp_replace("text", r"[^\p{Punct}]", ""))
    stop = F.size(F.expr(
        "filter(split(lower(text), ' '), "
        "w -> w IN ('the','a','of','and','to','in','is','it'))"
    ))
    quality = (
        (stop / F.greatest(n_tokens, F.lit(1)))
        - (punct / F.greatest(F.length("text"), F.lit(1)))
        + F.least(n_tokens, F.lit(100)) / 100.0
    )
    scored = docs.select(
        "doc_id", "text",
        F.round(quality, 4).alias("quality"),
        n_tokens.alias("n_tokens"),
    ).filter(F.col("quality") >= quality_cut)

    # 1b. Gopher-style repetition rules (t11): drop docs failing the
    # word-count / word-length / top-bigram / dup-trigram bands. The
    # operator emits per-doc flags; the pipeline consumes ids only.
    rep_drop = (
        t11_repetition_rules(spark, sf_dir)
        .filter(~F.col("keep"))
        .select("doc_id")
    )
    scored = scored.join(rep_drop, "doc_id", "left_anti")

    # 1c. boilerplate screen (d09): docs where >30% of 3-token spans are
    # corpus-wide boilerplate are template junk — drop whole docs here
    # (C4 drops the spans; at the doc granularity this pipeline keeps
    # text immutable after the PII rewrite).
    boiler_drop = (
        d09_chunk_freq_dedup(spark, sf_dir)
        .filter(F.col("n_dropped") * 1.0 / F.greatest("n_chunks", F.lit(1)) > 0.3)
        .select("doc_id")
    )
    scored = scored.join(boiler_drop, "doc_id", "left_anti")

    # 2. exact dedup (d01 shape): group by content digest, keep min id —
    # the shuffle carries the 16-byte digest + id, never the text twice
    keep_ids = (
        scored.select("doc_id", F.md5(F.col("text")).alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = scored.join(keep_ids, "doc_id")

    # 3. text near-dup removal (MinHash+LSH) in the PRODUCTION config:
    # the seeded-xxhash64 family (d03p shape — native 64-bit hashes,
    # 8-byte band shuffle keys; the md5 family exists for oracle
    # parity), clustered by min-label propagation, keep the cluster
    # representative (min id) and drop the rest.
    text_pairs = minhash_pairs(spark, sf_dir, family="xxhash64").select("i", "j")
    text_drop = (
        label_propagate(text_pairs)
        .filter(F.col("v") != F.col("lbl"))  # non-representatives
        .select(F.col("v").alias("doc_id"))
    )
    deduped = deduped.join(text_drop, "doc_id", "left_anti")

    # 4. embedding near-dup removal: d08's keep-list names the near-dup
    # cluster members to DROP (keep=false). Only near-dup members appear
    # in the list, so the anti-join's build side scales with duplicates
    # found, not corpus size. documents/embeddings share the id space
    # (doc_id == vec_id per TESTDATA.md).
    drop = (
        d08_dedup_keep(spark, sf_dir)
        .filter(~F.col("keep"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    cleaned = deduped.join(drop, "doc_id", "left_anti")

    # 5. benchmark decontamination: t08 names corpus docs overlapping the
    # held-out eval set; they must not ship in a training corpus
    contaminated = t08_decontaminate(spark, sf_dir).select("doc_id").distinct()
    cleaned = cleaned.join(contaminated, "doc_id", "left_anti")

    # 5b. DSIR importance selection (t17): keep docs whose hashed-n-gram
    # profile is closer to the held-out reference slice than to the raw
    # corpus (importance resampling against a quality reference the
    # pipeline never ships — the same slice t08 holds out). Only ids
    # cross the join; the scoring pass shuffles (doc_id, bucket, count)
    # ints, never text.
    dsir_keep = (
        t17_dsir_resample(spark, sf_dir).filter(F.col("keep")).select("doc_id")
    )
    cleaned = cleaned.join(dsir_keep, "doc_id")

    # 6. mixture reweighting (x08): temperature-flatten the language mix
    # — heavy languages downsample by a deterministic md5-fraction, so
    # the kept-id set is reproducible under retries and re-runs. Rates
    # derive from the gated corpus's token mass (the mix you measured
    # after the URL gate); rerunning x08 on the curated subset would
    # instead chase the post-filter mix — either is defensible, this
    # pipeline reweights against the measured corpus.
    mix_keep = x08_mix_resample(spark, sf_dir).select("doc_id")
    return cleaned.join(mix_keep, "doc_id")


def main() -> None:
    from quacfka_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-data-pipeline")
    t = load_views(spark, sf_dir)
    n0 = t["documents"].count()
    corpus = curate(spark, sf_dir)
    stats = corpus.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    ).collect()[0]
    print(f"documents in: {n0}")
    print(
        f"curated corpus: {stats['docs']} docs, {stats['tokens']} tokens, "
        f"avg quality {stats['avg_quality']}"
    )

    # 7. split + shard — the hand-off to the trainer: t19 assigns every
    # curated doc its contamination-aware split (train/val/test, with
    # benchmark-overlapping docs quarantined and the eval source held
    # out), then t18's deterministic hash-shard map orders the TRAIN
    # slice for consumption — reproducible under retries and re-runs,
    # no global sort. Only (doc_id, split/shard) ids cross these joins.
    splits = t19_split_assign(spark, sf_dir).select("doc_id", "split")
    labeled = corpus.join(splits, "doc_id")
    for r in sorted(labeled.groupBy("split").count().collect()):
        print(f"  split {r['split']}: {r['count']} docs")
    train_shards = (
        labeled.filter(F.col("split") == "train")
        .select("doc_id")
        .join(t18_shuffle_shard(spark, sf_dir), "doc_id")
        .groupBy("shard")
        .count()
    )
    n_shards = train_shards.count()
    print(f"train slice sharded into {n_shards} hash-balanced shards")


if __name__ == "__main__":
    main()
