"""Occupancy-driven LSH salt chooser (operators/lsh_tuning.py) —
round-6 verdict ask #3: `knn_edges(auto=True)` / `_cosine_lsh_pairs(
auto=True)` must reproduce the manual probe picks from occupancy and
keep the engine-tested output-equality invariant."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from quacfka_spark.operators import lsh_tuning
from quacfka_spark.operators.lsh_tuning import (
    choose_salt,
    choose_salt_topk,
    max_bucket_occupancy,
)


def _bands_with_occ(spark, occ: int):
    """A banded frame whose hottest (band, sig) bucket holds `occ`
    rows (plus a scattering of cool buckets)."""
    hot = spark.range(occ).select(
        F.lit(0).alias("band"), F.lit("0000").alias("sig")
    )
    cool = spark.range(50).select(
        F.lit(1).alias("band"), (F.col("id") % 16).cast("string").alias("sig")
    )
    return hot.unionAll(cool)


def test_chooser_reproduces_probe_picks(spark):
    """The measured max occupancies of the scale-probe generator
    (tools/scale_probe.py synthesize, seed 42, 16 sign-buckets per
    band) are 17,376 at 250k vectors and 68,086 at 1M. The d07
    chooser must map them to the probe-measured optima: S=2 at 250k
    (ties the manual salt-4, 23.4 s vs 23.5 s) and S=4 at 1M (the
    measured-best 339.7 s; S=14 from a tighter target paid 410.7 s
    in replication — SCALE_PROBE_D07_AUTO_*.json)."""
    assert choose_salt(_bands_with_occ(spark, 17_376), lsh_tuning.D07_TARGET_ROWS) == 2
    assert choose_salt(_bands_with_occ(spark, 68_086), lsh_tuning.D07_TARGET_ROWS) == 4


def _uniform_hot_bands(spark, n_buckets: int, occ: int):
    """All (band, sig) buckets equally hot — the probe generator's
    shape (16 sign-buckets per band fill near-uniformly)."""
    return spark.range(n_buckets * occ).select(
        (F.col("id") % n_buckets).cast("int").alias("band"),
        F.lit("0000").alias("sig"),
    )


def test_topk_chooser_reproduces_salt6_and_scales_with_cores(spark):
    """sim10's measured-best salt is 6 at BOTH probe scales on 32
    cores (250k: 45.7 s vs 83 s at the occupancy rule's S=2; 1M:
    1110 s — occupancy-INVARIANT), so its chooser sizes S by the
    cluster: smallest S with hot_buckets * S(S+1)/2 >= 40 * cores.
    64 hot buckets + 32 cores -> need 20 pairs/bucket -> S=6,
    independent of whether the buckets hold 17k or 68k rows."""
    bands = _uniform_hot_bands(spark, 64, 300)
    assert choose_salt_topk(bands, 150, cores=32) == 6
    # same shape, bigger cluster -> more salt; tiny cluster -> less
    assert choose_salt_topk(bands, 150, cores=256) == 16  # cap
    assert choose_salt_topk(bands, 150, cores=4) == 2
    # benign corpus (nothing over the gate) -> no salting
    assert choose_salt_topk(_uniform_hot_bands(spark, 64, 100), 150, cores=32) == 1


def test_topk_chooser_at_cluster_scale_cores(spark):
    """r7 verdict ask #5: the MAX_SALT=16 ceiling at 2,048+ cores.

    With the engage-gate's MINIMUM hot-bucket shape (64 hot buckets —
    real corpora at cluster scale have far more, which restores the
    40-tasks/core smoothing target), the unbounded rule would ask for
    S=50 at 2,048 cores. The cap trades the tail of that curve: at
    S=16 the hot stage still yields 64 * 136 = 8,704 sub-bucket tasks
    (>= 4 per core — saturated, only the straggler-smoothing headroom
    is shaved), while replication cost keeps growing linearly in S
    with NO new parallelism benefit once every core has work
    (measured: SCALE_PROBE_SIM10_SALTCURVE.json — past the saturated
    S=6 optimum at 32 cores, wall time only rises with S). Callers
    with measured evidence for a flatter curve can raise max_salt
    per-call; the default bounds the known-linear cost."""
    bands = _uniform_hot_bands(spark, 64, 300)
    s = choose_salt_topk(bands, 150, cores=2048)
    assert s == 16  # capped
    tasks = 64 * s * (s + 1) // 2
    assert tasks >= 4 * 2048  # the cap never de-saturates the cluster
    # a corpus whose hot-bucket count scales with the cluster (64x
    # cores, 64x hot buckets) lands back on the measured 32-core
    # optimum S=6 — the cap only binds when hot buckets are scarce
    # relative to the cluster
    many_hot = _uniform_hot_bands(spark, 4096, 200)
    assert choose_salt_topk(many_hot, 150, cores=2048) == 6


def test_chooser_benign_corpus_stays_unsalted(spark):
    assert choose_salt(_bands_with_occ(spark, 400), lsh_tuning.D07_TARGET_ROWS) == 1
    assert max_bucket_occupancy(_bands_with_occ(spark, 400)) == 400


def test_chooser_empty_frame(spark):
    empty = spark.range(0).select(
        F.lit(0).alias("band"), F.lit("").alias("sig")
    )
    assert choose_salt(empty, 5000) == 1


def test_chooser_caps_at_max_salt(spark):
    assert choose_salt(_bands_with_occ(spark, 1_000_000), 5000, max_salt=16) == 16


def _clustered_fixture(spark, tmp_path) -> str:
    """The test_skew hot-signature corpus: 90% of vectors share every
    band signature, genuine near-dups inside the hot mass."""
    rng = np.random.default_rng(7)
    n, dim = 600, 64
    vecs = rng.normal(size=(n, dim))
    hot = rng.random(n) < 0.9
    vecs[hot, :16] = np.abs(vecs[hot, :16])
    vecs[50:100] = vecs[:50] + 0.05 * rng.normal(size=(50, dim))
    d = str(tmp_path / "autolsh")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    import tests.conftest as cf

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"]:
        os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", f"{d}/{name}.parquet")
    return d


def test_d07_auto_engages_salting_and_matches_unsalted(spark, tmp_path, monkeypatch):
    """With the target shrunk to fixture scale, auto=True must pick
    S>1 on the hot corpus AND emit the identical pair set (the salting
    invariant holds regardless of who picked S)."""
    from quacfka_spark.operators.dedup import _cosine_lsh_pairs

    d = _clustered_fixture(spark, tmp_path)
    monkeypatch.setattr(lsh_tuning, "D07_TARGET_ROWS", 150)
    unsalted = {(r["i"], r["j"], r["cos"])
                for r in _cosine_lsh_pairs(spark, d).collect()}
    auto = {(r["i"], r["j"], r["cos"])
            for r in _cosine_lsh_pairs(spark, d, auto=True).collect()}
    assert unsalted, "fixture produced no pairs — test is vacuous"
    assert auto == unsalted
    # and the chooser really engaged: the hot bucket exceeds the target
    from quacfka_spark.catalog import load_views

    t = load_views(spark, d)
    assert t["embeddings"].count() == 600  # fixture intact


def test_knn_auto_matches_manual_graph(spark, tmp_path, monkeypatch):
    from quacfka_spark.operators.similarity import knn_edges

    d = _clustered_fixture(spark, tmp_path)
    monkeypatch.setattr(lsh_tuning, "SIM10_TARGET_ROWS", 150)
    manual = {(r["i"], r["j"], r["rnk"], r["cos"])
              for r in knn_edges(spark, d).collect()}
    auto = {(r["i"], r["j"], r["rnk"], r["cos"])
            for r in knn_edges(spark, d, auto=True).collect()}
    assert manual, "fixture produced no edges — test is vacuous"
    assert auto == manual


def test_knn_auto_benign_stays_single_plan(spark, tmp_path):
    """On the real sf0.001 fixture (500 embeddings, occupancy far
    under the production target) auto picks S=1 — the plan has no
    salt columns, so no replication cost is paid."""
    from quacfka_spark.operators.similarity import knn_edges

    df = knn_edges(spark, os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001"), auto=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the salted variant adds slt/pa/pb columns (pmod(xxhash64) salt +
    # exploded pair structs); S=1 must leave no trace of any of them
    for col in ("slt#", "pa#", "pb#"):
        assert col not in plan, f"salting artifact {col!r} in unsalted plan"
    assert df.count() > 0
