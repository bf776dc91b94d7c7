"""Salted-join / two-phase-agg equivalence + plan tests."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from quacfka_spark.functions.skew import salted_join, two_phase_agg


def _skewed_df(spark):
    # 90% of rows share key 0 — the power-law hot key
    return spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    skewed = _skewed_df(spark)
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    plain = skewed.join(dim, ["k"]).groupBy("k").count()
    salted = salted_join(skewed, dim, ["k"], salt_buckets=8).groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    """The salt must appear in the shuffle partitioning so the hot key
    lands on salt_buckets partitions, not one."""
    skewed = _skewed_df(spark)
    dim = spark.range(0, 100).select(F.col("id").alias("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = salted_join(skewed, dim, ["k"], salt_buckets=8)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        p = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", p)
    assert parts and all("__salt" in x for x in parts)


def test_two_phase_agg_avg(spark):
    df = _skewed_df(spark)
    got = two_phase_agg(
        df,
        ["k"],
        [F.sum("v").alias("s"), F.count("v").alias("n")],
        [(F.sum("s") / F.sum("n")).alias("avg_v")],
        salt_buckets=8,
    )
    want = df.groupBy("k").agg(F.avg("v").alias("avg_v"))
    g = {r["k"]: r["avg_v"] for r in got.collect()}
    w = {r["k"]: r["avg_v"] for r in want.collect()}
    assert g.keys() == w.keys()
    assert all(abs(g[k] - w[k]) < 1e-9 for k in g)


def test_d07_degenerate_bucket_chunked_verify(spark, tmp_path):
    """The classic LSH skew case: every vector shares one (band, sig)
    bucket (all-positive leading dims), so one task verifies the whole
    corpus. d07's bucket verify must stay chunked (_D07_CHUNK rows of
    the cosine matrix at a time — memory O(bucket x chunk), never
    O(bucket^2)) and still produce the exact pair set."""
    import numpy as np

    from quacfka_spark.operators.dedup import _D05_THRESHOLD, _cosine_lsh_pairs

    rng = np.random.default_rng(7)
    n, dim = 3000, 8  # > 2x _D07_CHUNK so several chunks run per bucket
    base = rng.uniform(0.1, 1.0, size=dim)
    vecs = base * rng.uniform(0.5, 1.5, size=(n, dim))  # all-positive
    d = str(tmp_path / "deg")
    import os

    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    # satisfy load_views' full-catalog expectation with symlinks
    import tests.conftest as cf

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"]:
        os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", f"{d}/{name}.parquet")

    got = _cosine_lsh_pairs(spark, d).count()
    # exact ground truth: every pair collides (identical signatures), so
    # the verified pairs are exactly the cosine-threshold survivors
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = m @ m.T
    iu = np.triu_indices(n, 1)
    want = int((cos[iu] >= _D05_THRESHOLD).sum())
    assert got == want


def test_d10_semdedup_ground_truth(spark, tmp_path, monkeypatch):
    """Exact numpy ground truth for d10 (guards against impl and oracle
    drifting together): deterministic vectors -> hand-compute the ONE
    Lloyd training round (6dp-rounded seed assignment with smaller-cid
    tie-break, 6dp-rounded per-dimension means), the top-PROBE trained
    cell memberships, and the lower-id-in-any-shared-cell dup rule, and
    require the distributed result to match both columns exactly. The
    chunk size is shrunk below the cell sizes so cell_dups' chunk loop
    genuinely runs several iterations per cell (chunk-boundary indexing
    is on the tested path, not just the claim)."""
    import numpy as np

    import quacfka_spark.operators.dedup as dd
    from quacfka_spark.operators.dedup import (
        _D05_THRESHOLD,
        _D10_K,
        _D10_PROBE,
        d10_semdedup,
    )

    monkeypatch.setattr(dd, "_D07_CHUNK", 64)
    monkeypatch.setattr(dd, "_D10_DIM", 8)  # fixture vectors are dim 8

    rng = np.random.default_rng(11)
    n, dim = 1500, 8
    vecs = rng.normal(size=(n, dim))
    vecs[200:400] = vecs[:200] + 0.05 * rng.normal(size=(200, dim))  # near-dups
    # a zero-norm vector (failed-encoder artifact): its cosine is NULL
    # in-engine and pinned to the -2 sentinel, so it deterministically
    # takes the lowest cids and can never verify as a duplicate
    vecs[777] = 0.0
    d = str(tmp_path / "sem")
    import os

    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    import tests.conftest as cf

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"]:
        os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", f"{d}/{name}.parquet")

    got = {r["vec_id"]: (r["cell"], r["is_dup"]) for r in
           d10_semdedup(spark, d).collect()}

    with np.errstate(divide="ignore", invalid="ignore"):
        m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    # one Lloyd round, exactly as train_centroids: 6dp-rounded seed
    # assignment (smaller-cid tie-break = argmax first index), then
    # 6dp-rounded per-dimension means of the RAW assigned vectors;
    # zero-norm rows get the engine's -2 NULL-cosine sentinel
    seeds = m[:_D10_K]
    s0 = np.round(m @ seeds.T, 6)
    s0 = np.where(np.isnan(s0), -2.0, s0)
    cells0 = s0.argmax(axis=1)
    cents = np.stack(
        [np.round(vecs[cells0 == c].mean(axis=0), 6) for c in range(_D10_K)]
    )
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    s = np.round(m @ cn.T, 6)
    s = np.where(np.isnan(s), -2.0, s)
    # top-PROBE cells per vector ordered by (s desc, cid asc):
    # lexsort on (cid, -s) -> stable ascending cid within equal -s
    order = np.lexsort((np.tile(np.arange(_D10_K), (n, 1)), -s), axis=1)
    member = order[:, :_D10_PROBE]
    prim = member[:, 0]
    dup = np.zeros(n, dtype=bool)
    msets = [set(r) for r in member]
    for i in range(n):
        shared = np.array(
            [j < i and not msets[i].isdisjoint(msets[j]) for j in range(n)]
        )
        if shared.any():
            dup[i] = bool(((m[shared] @ m[i]) >= _D05_THRESHOLD).any())
    assert len(got) == n
    mism = [i for i in range(n)
            if got[i] != (int(prim[i]), int(dup[i]))]
    assert not mism, mism[:10]


def test_d07_salt_buckets_same_pairs_and_balanced_work(spark, tmp_path):
    """The d07 degenerate-bucket mitigation: a corpus where ~90% of
    vectors share every band signature (positive leading 16 dims) puts
    ~all verify work in ONE task unsalted. With salt_buckets=S the pair
    set must be IDENTICAL (every unordered pair lives in exactly one
    salt-pair sub-bucket, so the min-band dedup is undisturbed) while
    the dominant bucket's work spreads over S(S+1)/2 sub-tasks with no
    sub-task above ~2x the mean."""
    import os

    import numpy as np

    from quacfka_spark.operators.dedup import _cosine_lsh_pairs

    rng = np.random.default_rng(7)
    n, dim = 600, 64
    vecs = rng.normal(size=(n, dim))
    # dominant signature: 90% of vectors positive in the 16 band dims
    hot = rng.random(n) < 0.9
    vecs[hot, :16] = np.abs(vecs[hot, :16])
    # genuine near-dups inside the hot mass so the pair set is non-empty
    vecs[50:100] = vecs[:50] + 0.05 * rng.normal(size=(50, dim))
    d = str(tmp_path / "skewlsh")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    import tests.conftest as cf

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"]:
        os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", f"{d}/{name}.parquet")

    S = 4
    unsalted = {(r["i"], r["j"], r["cos"])
                for r in _cosine_lsh_pairs(spark, d).collect()}
    salted = {(r["i"], r["j"], r["cos"])
              for r in _cosine_lsh_pairs(spark, d, salt_buckets=S).collect()}
    assert unsalted, "fixture produced no pairs — test is vacuous"
    assert salted == unsalted

    # Work balance in the dominant bucket, using the operator's OWN salt
    # values (xxhash64 % S via Spark — not reimplemented in python):
    salts = {
        r["vec_id"]: r["s"]
        for r in spark.range(0, n)
        .select(
            F.col("id").alias("vec_id"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(S)).alias("s"),
        )
        .collect()
    }
    hot_ids = [i for i in range(n) if hot[i]]
    c = np.bincount([salts[i] for i in hot_ids], minlength=S).astype(float)
    work = [c[a] * (c[a] - 1) / 2 if a == b else c[a] * c[b]
            for a in range(S) for b in range(a, S)]
    total = len(hot_ids) * (len(hot_ids) - 1) / 2
    assert abs(sum(work) - total) < 1e-6  # decomposition covers all pairs
    assert max(work) <= 2.0 * (sum(work) / len(work)), work
    # and the single-task ceiling actually dropped by ~S(S+1)/2
    assert max(work) <= total / 3


def test_trained_cells_tiny_corpus_smaller_than_k(spark, tmp_path):
    """Corpus smaller than the seed count (N < K): training seeds with
    every vector, cells = N, the packed array is shorter than PROBE
    slices want — d10 and sim04 must still run and produce sane output
    (every vector its own primary cell via self-similarity 1.0, no dups
    among orthogonal vectors)."""
    import os

    import numpy as np

    from quacfka_spark.operators.dedup import d10_semdedup
    from quacfka_spark.operators.similarity import sim04_ivf_topk

    n, dim = 3, 64  # N far below _D10_K=16 / _IVF_K=8; fixture dim
    vecs = np.eye(n, dim)  # orthogonal: cosine 0 everywhere off-diagonal
    d = str(tmp_path / "tiny")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    import tests.conftest as cf

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"]:
        os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", f"{d}/{name}.parquet")

    rows = {r["vec_id"]: (r["cell"], r["is_dup"])
            for r in d10_semdedup(spark, d).collect()}
    assert set(rows) == {0, 1, 2}
    # each vector is its own seed -> self-similarity 1.0 -> own cell
    assert all(rows[i][0] == i for i in range(n)), rows
    assert all(rows[i][1] == 0 for i in range(n)), rows  # orthogonal

    top = sim04_ivf_topk(spark, d).collect()
    # query is vec 0; its 2 probed cells cover the orthogonal others
    assert 0 < len(top) <= 2
    assert all(abs(r["cos"]) < 1e-9 for r in top), top


def test_d07_int8_payload_salt_invariant_and_boundary_only_flips(
    spark, tmp_path
):
    """The int8 verify payload (r10 verdict #2 — the band-exchange
    footprint fix): (1) salted and unsalted int8 plans emit IDENTICAL
    pair sets (the salting invariant is payload-agnostic); (2) every
    disagreement vs the float32 plan is a threshold-boundary pair —
    the surviving side's cosine within quantization error (0.01 at
    dim 64) of the 0.35 verify threshold — because both plans share
    one candidate set (identical float-sign bands)."""
    import os

    import numpy as np

    from quacfka_spark.operators.dedup import _cosine_lsh_pairs

    rng = np.random.default_rng(11)
    n, dim = 500, 64
    vecs = rng.normal(size=(n, dim))
    vecs[40:80] = vecs[:40] + 0.05 * rng.normal(size=(40, dim))
    d = str(tmp_path / "int8lsh")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    import tests.conftest as cf

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"]:
        os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", f"{d}/{name}.parquet")

    q_plain = {(r["i"], r["j"], r["cos"])
               for r in _cosine_lsh_pairs(
                   spark, d, verify_payload="int8").collect()}
    q_salted = {(r["i"], r["j"], r["cos"])
                for r in _cosine_lsh_pairs(
                    spark, d, salt_buckets=3, verify_payload="int8"
                ).collect()}
    assert q_plain, "fixture produced no int8 pairs — test is vacuous"
    assert q_salted == q_plain

    f32 = {(r["i"], r["j"]): r["cos"]
           for r in _cosine_lsh_pairs(spark, d).collect()}
    q8 = {(i, j): c for (i, j, c) in q_plain}
    for k in set(f32) - set(q8):
        assert f32[k] < 0.35 + 0.011, (k, f32[k])
    for k in set(q8) - set(f32):
        assert q8[k] < 0.35 + 0.011, (k, q8[k])
    # common pairs: quantized cosine within the error bound of float
    for k in set(q8) & set(f32):
        assert abs(q8[k] - f32[k]) < 0.02, (k, q8[k], f32[k])
