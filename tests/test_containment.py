"""d14 fuzzy containment — semantics pins the oracle can't express:
the asymmetric short-doc-inside-long-doc case that symmetric Jaccard
(d02) provably misses, and directedness (containment holds src->dst
but not dst->src when lengths differ)."""

from __future__ import annotations

import os

from quacfka_spark.operators.dedup import (
    d02_ngram_jaccard,
    d14_fuzzy_containment,
)


def _mk_docs_dir(spark, tmp_path) -> str:
    words = [f"w{i}" for i in range(40)]
    short = " ".join(words[:12])  # 10 distinct 3-gram shingles
    long_doc = short + " " + " ".join(words[12:])  # contains ALL of them
    other = " ".join(f"z{i}" for i in range(30))
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(1, short, "s"), (2, long_doc, "s"), (3, other, "s")],
        "doc_id bigint, text string, source string",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    import tests.conftest as cf

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"]:
        os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", f"{d}/{name}.parquet")
    return d


def test_containment_catches_subset_jaccard_misses(spark, tmp_path):
    d = _mk_docs_dir(spark, tmp_path)
    cont = {
        (r.src, r.dst): r.containment
        for r in d14_fuzzy_containment(spark, d).collect()
    }
    # doc 1 is wholly inside doc 2: containment 1.0 in that direction
    assert cont == {(1, 2): 1.0}, cont
    # the reverse direction is NOT contained (doc 2 has ~4x the
    # shingles), and the unrelated doc never pairs
    assert (2, 1) not in cont and all(3 not in k for k in cont)
    # d02's symmetric Jaccard misses the pair entirely: 10 shared of
    # ~38 union shingles is far below its 0.8 threshold
    jac = d02_ngram_jaccard(spark, d).collect()
    assert jac == [], jac
