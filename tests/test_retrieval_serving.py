"""The composed serving example (examples/retrieval_serving.py): the
lexical + vector channels fuse and the MMR tail emits a deterministic,
well-formed top-k — the retrieval twin of test_training_pipeline."""

from __future__ import annotations

from examples.retrieval_serving import serve

SF = "/root/testdata/sf0.001"
TERMS = ("data", "model", "training")


def test_serve_shape_and_determinism(spark):
    a = serve(spark, SF, TERMS).collect()
    assert [r.rnk for r in a] == list(range(1, len(a) + 1))
    assert 1 <= len(a) <= 5
    ids = [r.vec_id for r in a]
    assert len(set(ids)) == len(ids)  # no repeats
    # rank 1 is the best fused candidate: shortlist-normalized rel 1.0,
    # and every rel lands in (0, 1]
    assert a[0].rel == 1.0
    assert all(0 < r.rel <= 1.0 for r in a)
    # integer fixed-point greedy -> bit-identical replay
    b = serve(spark, SF, TERMS).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
