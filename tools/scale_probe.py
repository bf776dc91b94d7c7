#!/usr/bin/env python
"""Scale probe: run the scale-path operators on synthetic data 50-100x
the sf0.1 bench fixture (100k embedding vectors, 50k documents by
default) and emit one JSON line of wall times.

The per-round bench (bench.py at sf0.1: 2k vectors / 5k docs) verifies
steady-state cost at fixture scale; this probe substantiates the scale
DESIGN claims — LSH bucket fan-out, banded joins, inverted-index
decontamination, zero-shuffle scoring — by measuring the same operators
where the quadratic terms would already be fatal for naive shapes
(100k vectors = 5e9 candidate pairs all-pairs; the sign-LSH path does
~1.2e9 bucket-local vectorized comparisons instead, and the banded
text pipeline never leaves bucket-sized joins).

Usage: python tools/scale_probe.py [--n-vecs 100000] [--n-docs 50000]
       [--out SCALE_PROBE.json]

Synthesis is deterministic (seeded numpy): embeddings are noisy copies
of cluster bases so genuine near-dups exist; documents sample a zipfian
vocabulary with 2% exact duplicates and injected eval-overlap docs so
dedup/decontamination outputs are non-trivial.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same env convention as bench.py; --fixture (below) overrides both
FIXTURE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]

OPS = [
    "d01_exact_dedup",
    "d03_minhash_lsh",
    "d04_simhash",
    "d07_cosine_lsh_pairs",
    "t01_token_count",
    "t08_decontaminate",
    "t11_repetition_rules",
    "t14_lm_perplexity",
    "d10_semdedup",
    "sim01_bruteforce_topk",
    "sim04_ivf_topk",
    "x08_mix_resample",
    "t15_url_canonical_dedup",
    "d09_chunk_freq_dedup",
    "t12_sequence_pack",
    "m05_binary_piecewise_dedup",
    "d03p_minhash_xxhash_pairs",
    "sim07_pq_topk",
    "t16_bm25_topk",
    "t17_dsir_resample",
    "d11_cdc_dedup",
    "d12_ngram_novelty",
    "t18_shuffle_shard",
    "t19_split_assign",
    "sim09_range_search",
    "sim10_knn_graph",
    "sim11_knn_pagerank",
    "d13_cluster_quota",
    "t20_distill_classifier",
    "t21_distill_auc",
    "m06_ahash_neardup",
    "m07_dhash_neardup",
    "sim12_mmr_rerank",
]


def synthesize(spark, d: str, n_vecs: int, n_docs: int, dim: int = 64) -> None:
    import numpy as np

    rng = np.random.default_rng(42)
    os.makedirs(d, exist_ok=True)

    # embeddings: 1% cluster bases, each vector = base + noise -> real
    # near-dup pairs inside clusters, across-cluster cosines low
    n_base = max(64, n_vecs // 100)
    bases = rng.normal(size=(n_base, dim))
    idx = rng.integers(0, n_base, size=n_vecs)
    vecs = bases[idx] + 0.35 * rng.normal(size=(n_vecs, dim))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vecs), type=pa.int64()),
                "embedding": pa.array(
                    vecs.astype("float32").tolist(),
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array((idx % 64).astype("int64")),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )

    # documents: zipfian vocab, 30-80 tokens, 2% exact dups, the eval
    # source for t08 overlapping real corpus text
    vocab = np.array([f"w{i}" for i in range(5000)])
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    lengths = rng.integers(30, 81, size=n_docs)
    texts = [
        " ".join(vocab[rng.choice(len(vocab), size=ln, p=p)])
        for ln in lengths
    ]
    for i in range(0, n_docs // 50):  # 2% exact duplicates
        texts[n_docs - 1 - i] = texts[i]
    n_eval = max(20, n_docs // 500)
    sources = np.array([f"src{i % 20}" for i in range(n_docs)])
    # label the injected eval docs with t08's ACTUAL held-out source so
    # the deliberate text overlap below exercises the decontamination
    # path being timed (a probe-private label would leave t08 matching
    # only the incidental src0 corpus slice)
    from quacfka_spark.operators.text import T08_EVAL_SOURCE

    sources[-n_eval:] = T08_EVAL_SOURCE
    for k in range(n_eval // 2):  # half the eval docs overlap the corpus
        texts[n_docs - 1 - k] = texts[2 * k]
    langs = np.array(["en", "zh", "es", "fr", "de"])[
        rng.choice(5, size=n_docs, p=[0.45, 0.2, 0.15, 0.1, 0.1])
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(langs.tolist(), type=pa.string()),
                "source": pa.array(sources.tolist(), type=pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], type=pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    for name in TABLES:
        link = os.path.join(d, f"{name}.parquet")
        if os.path.lexists(link):
            os.unlink(link)
        os.symlink(os.path.join(FIXTURE, f"{name}.parquet"), link)


def main() -> None:
    global FIXTURE
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vecs", type=int, default=100_000)
    ap.add_argument("--n-docs", type=int, default=50_000)
    ap.add_argument("--out", default="SCALE_PROBE.json")
    ap.add_argument("--dir", default="/tmp/quacfka_scale_probe")
    ap.add_argument("--fixture", default=FIXTURE)
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument(
        "--ops",
        default=None,
        help="comma-separated op subset (e.g. targeted larger-N runs); "
        "the synthetic d07_salted4 row runs iff d07_cosine_lsh_pairs "
        "is selected",
    )
    args = ap.parse_args()
    FIXTURE = args.fixture
    if not os.path.isdir(FIXTURE):
        ap.error(f"fixture dir not found: {FIXTURE} (set --fixture or SPARK_GRAFT_SF_DIR)")

    from quacfka_spark.registry import get_queries
    from quacfka_spark.session import get_spark

    spark = get_spark("scale-probe")
    t0 = time.perf_counter()
    synthesize(spark, args.dir, args.n_vecs, args.n_docs)
    synth_s = round(time.perf_counter() - t0, 2)

    qs = get_queries()
    results: dict[str, dict] = {}

    def time_one(name, fn):
        # best-of-N (--trials): one long session ages (JIT/GC), so a
        # single shot systematically penalizes late-listed ops — the
        # min is the honest steady-state figure; rows must agree
        # across trials or the row drift is reported as an error
        best, rows = None, None
        try:
            for _ in range(max(1, args.trials)):
                t0 = time.perf_counter()
                df = fn(spark, args.dir)
                # noop sink materializes every output column exactly
                # once; the row count rides on the same job via an
                # Observation so the timing window holds ONE execution
                from pyspark.sql import Observation
                from pyspark.sql import functions as F

                obs = Observation()
                df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
                    "noop"
                ).mode("overwrite").save()
                sec = time.perf_counter() - t0
                n = int(obs.get["n"])
                if rows is not None and n != rows:
                    raise AssertionError(
                        f"row drift across trials: {rows} != {n}"
                    )
                rows = n
                best = sec if best is None else min(best, sec)
            results[name] = {"sec": round(best, 2), "rows": rows}
        except Exception as e:  # keep probing the rest
            results[name] = {"error": str(e)[:200]}
        print(f"# {name}: {results[name]}", file=sys.stderr)

    req = args.ops.split(",") if args.ops else []
    extra = [o for o in req if o.startswith("d07_salted")]
    extra_knn = [o for o in req if o.startswith("sim10_salted")]
    ops = OPS if not args.ops else [o for o in OPS if o in args.ops.split(",")]
    for name in ops:
        if name == "t16_bm25_topk":
            # the declared t16 terms are the FIXTURE corpus's vocabulary;
            # this corpus is synthetic zipfian w0..w4999 — probe the same
            # scorer with terms spanning its frequency tiers (a head, a
            # torso and a tail word) so the top-k is non-trivial
            from quacfka_spark.operators.text import bm25_topk

            time_one(name, lambda s, d: bm25_topk(s, d, ("w3", "w40", "w400")))
            continue
        time_one(name, qs[name])

    # d07 with the degenerate-bucket salting engaged (salt_buckets=4) on
    # the same clustered corpus: same pair set, S(S+1)/2-way sub-bucket
    # spread — the measured cost of the skew mitigation at probe scale
    if "d07_cosine_lsh_pairs" in ops or extra:
        from quacfka_spark.operators.dedup import _cosine_lsh_pairs

        # "--ops d07_saltedN" (without the unsalted op) times ONLY the
        # salted path with salt_buckets=N — the way to probe sizes
        # where the unsalted run no longer fits the measurement window
        salts = sorted(
            {int(o[len("d07_salted"):]) for o in extra if o[len("d07_salted"):].isdigit()}
        ) or [4]
        for s_n in salts:
            time_one(
                f"d07_salted{s_n}",
                lambda s, d, s_n=s_n: _cosine_lsh_pairs(s, d, salt_buckets=s_n),
            )

    # sim10's top-k twin of the salting row: identical graph (engine-
    # tested set equality), S(S+1)/2-way sub-bucket spread
    if "sim10_knn_graph" in ops or extra_knn:
        from quacfka_spark.operators.similarity import knn_edges

        salts_k = sorted(
            {int(o[len("sim10_salted"):]) for o in extra_knn if o[len("sim10_salted"):].isdigit()}
        ) or [4]
        for s_n in salts_k:
            time_one(
                f"sim10_salted{s_n}",
                lambda s, d, s_n=s_n: knn_edges(s, d, salt_groups=s_n),
            )

    # occupancy-driven AUTO rows ("--ops d07_auto,sim10_auto"): the
    # chooser picks the salt from one (band, sig) count agg — the probe
    # row is the evidence that the pick matches or beats the manual one
    if "d07_auto" in req:
        from quacfka_spark.operators.dedup import _cosine_lsh_pairs

        time_one("d07_auto", lambda s, d: _cosine_lsh_pairs(s, d, auto=True))
    if "sim10_auto" in req:
        from quacfka_spark.operators.similarity import knn_edges

        time_one("sim10_auto", lambda s, d: knn_edges(s, d, auto=True))

    report = {
        "metric": "scale_probe_wall_time",
        "n_vecs": args.n_vecs,
        "n_docs": args.n_docs,
        "synthesize_sec": synth_s,
        "ops": results,
        "vs_bench_fixture": f"~{args.n_vecs // 2000}x vectors, "
        f"~{args.n_docs // 5000}x documents",
    }
    line = json.dumps(report)
    print(line)
    with open(args.out, "w") as fh:
        fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
