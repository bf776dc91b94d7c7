"""knn_edges / sim10 edge-case semantics the TPC-H-ish fixtures never
exercise: total-order tie-breaking inside a degenerate all-identical
bucket, k larger than the candidate set, and the documented LSH-miss
behavior (a pair sharing NO band is absent regardless of cosine).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quacfka_spark.catalog import TABLES
from quacfka_spark.operators.similarity import _SIM10_K, knn_edges

SF = "/root/testdata/sf0.001"
DIM = 64


def _mk_dir(tmp_path, vecs) -> str:
    """Probe-style dir: custom embeddings + symlinked fixture tables."""
    d = str(tmp_path / "knn")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in v] for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    for name in TABLES:
        if name == "embeddings":
            continue
        os.symlink(
            os.path.join(SF, f"{name}.parquet"),
            os.path.join(d, f"{name}.parquet"),
        )
    return d


def test_identical_vectors_tie_break_by_id(spark, tmp_path):
    """12 identical vectors: every cosine ties at 1.0, so ranking is
    decided purely by the injective (quantized cos, id) key — each
    vector's neighbors must be exactly the 5 smallest OTHER ids, in
    ascending order, and identically so in every bucket they collide
    in (cross-band merge must not double-count)."""
    n = 12
    vecs = [[1.0] * DIM] * n
    d = _mk_dir(tmp_path, vecs)
    rows = knn_edges(spark, d).orderBy("i", "rnk").collect()
    by_i = {}
    for r in rows:
        by_i.setdefault(r.i, []).append((r.rnk, r.j, r.cos))
    assert set(by_i) == set(range(n))
    for i, lst in by_i.items():
        expect = [j for j in range(n) if j != i][:_SIM10_K]
        assert [j for _, j, _ in lst] == expect, (i, lst)
        assert [rk for rk, _, _ in lst] == list(range(1, _SIM10_K + 1))
        assert all(c == 1.0 for _, _, c in lst)


def test_fewer_candidates_than_k(spark, tmp_path):
    """3 identical vectors: only 2 candidates each — ranks 1..2, no
    padding, no phantom rows."""
    vecs = [[0.5] * DIM] * 3
    d = _mk_dir(tmp_path, vecs)
    rows = knn_edges(spark, d).collect()
    assert len(rows) == 6  # 3 sources x 2 neighbors
    assert {(r.i, r.rnk) for r in rows} == {
        (i, rk) for i in range(3) for rk in (1, 2)
    }


def test_no_shared_band_means_no_edge(spark, tmp_path):
    """Documented LSH-miss semantics: vectors whose leading 16 dims
    (the band family) all differ in sign share NO bucket and therefore
    never pair — even though their tail dims agree and the true cosine
    is positive. This is the recall/cost knob (more bands would catch
    it), asserted so the contract stays visible."""
    a = [1.0] * 16 + [1.0] * (DIM - 16)
    b = [-1.0] * 16 + [1.0] * (DIM - 16)
    # a third vector colliding with `a` so the job emits something
    c = [1.0] * 16 + [0.5] * (DIM - 16)
    d = _mk_dir(tmp_path, [a, b, c])
    rows = knn_edges(spark, d).collect()
    pairs = {(r.i, r.j) for r in rows}
    assert (0, 1) not in pairs and (1, 0) not in pairs
    assert (0, 2) in pairs and (2, 0) in pairs
    # vector 1 is alone in its buckets -> no edges at all
    assert not any(r.i == 1 or r.j == 1 for r in rows)


@pytest.mark.parametrize("n", [1, 0])
def test_tiny_corpora(spark, tmp_path, n):
    """0 or 1 vectors: no candidates, empty edge list (m < 2 guard)."""
    vecs = [[1.0] * DIM] * n
    d = _mk_dir(tmp_path, vecs)
    assert knn_edges(spark, d).count() == 0


def _reference_banded_knn(vecs_f32, k):
    """Independent NumPy re-derivation of knn_edges' declared semantics:
    candidates = pairs sharing any (band, sig) bucket; final edges = each
    i's top-k candidates by (4dp-rounded cosine desc, j asc). Bucket-local
    pruning must be INVISIBLE here — that is the soundness claim under
    test (a neighbor cut from a bucket's local top-k is beaten there by k
    emitted candidates, so it can never enter the global top-k)."""
    import numpy as np

    from quacfka_spark.operators.similarity import _SIM10_BANDS, _SIM10_BITS

    mat = np.asarray(vecs_f32, dtype="float32").astype("float64")
    n = len(mat)
    sigs = [
        [
            tuple(mat[i, b * _SIM10_BITS : b * _SIM10_BITS + _SIM10_BITS] > 0)
            for b in range(_SIM10_BANDS)
        ]
        for i in range(n)
    ]
    cand = {
        (i, j)
        for i in range(n)
        for j in range(n)
        if i != j and any(sigs[i][b] == sigs[j][b] for b in range(_SIM10_BANDS))
    }
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = []
    for i in range(n):
        js = sorted(j for (a, j) in cand if a == i)
        if not js:
            continue
        cos = norm[js] @ norm[i]
        rounded = np.round(cos, 4)
        order = sorted(range(len(js)), key=lambda t: (-rounded[t], js[t]))
        for rnk, t in enumerate(order[:k], start=1):
            out.append((i, js[t], rnk, float(rounded[t])))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_randomized_equivalence_vs_reference(spark, tmp_path, seed):
    """Property check on random corpora (with exact-duplicate planting to
    force quantized-cosine ties): the distributed banded implementation
    must equal the direct per-candidate top-k reference EXACTLY on
    (i, j, rnk) and to 4dp on cos — i.e. bucket-local pruning, the
    cross-band MAX merge, and the injective int64 in-bucket sort key
    all collapse to the declared semantics."""
    import numpy as np

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((40, DIM)).astype("float32")
    # plant exact duplicates (cos == 1.0 ties -> j-asc tiebreak path)
    vecs[7] = vecs[5]
    vecs[13] = vecs[5]
    d = _mk_dir(tmp_path, vecs.tolist())
    got = sorted(
        (r.i, r.j, r.rnk, r.cos) for r in knn_edges(spark, d).collect()
    )
    want = sorted(_reference_banded_knn(vecs, _SIM10_K))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    assert all(abs(g[3] - w[3]) < 5e-5 for g, w in zip(got, want))


@pytest.mark.parametrize("salt", [2, 3])
def test_salted_equals_unsalted_on_clustered_corpus(spark, tmp_path, salt):
    """The top-k adaptation of d07's degenerate-bucket salting: on a
    clustered corpus (one dominant signature — every vector positive in
    the leading dims, so whole bands collapse into one hot bucket) the
    salted triangle decomposition must emit the IDENTICAL final edge
    set as the unsalted run — every neighbor meets its member in
    exactly one sub-bucket where it faces fewer competitors, so the
    union of local top-k picks covers the full-bucket picks and the
    merge window reduces both to the same graph."""
    import numpy as np

    rng = np.random.default_rng(11)
    n = 300
    base = rng.uniform(0.2, 1.0, size=DIM)  # all-positive: one hot sig
    vecs = base * rng.uniform(0.5, 1.5, size=(n, DIM))
    d = _mk_dir(tmp_path, [[float(x) for x in row] for row in vecs])

    plain = {
        (r.i, r.j, r.rnk, r.cos) for r in knn_edges(spark, d).collect()
    }
    salted = {
        (r.i, r.j, r.rnk, r.cos)
        for r in knn_edges(spark, d, salt_groups=salt).collect()
    }
    assert len(plain) >= n * _SIM10_K * 0.9  # the bucket really is hot
    assert salted == plain
