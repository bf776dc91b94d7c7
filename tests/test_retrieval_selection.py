"""Exact ground-truth tests for the retrieval/selection scorers (t16
BM25, t17 DSIR) against an INDEPENDENT pure-Python implementation.

The oracle-parity suite already checks both against DuckDB SQL, but the
SQL oracle is generated from the same formula constants — a shared
formula bug would pass it. Here the reference scores are computed from
scratch (hashlib md5, python floats, textbook Okapi/DSIR formulas) on a
synthetic corpus small enough to verify by hand, so the operator, the
oracle and this file form three independent derivations.
"""

from __future__ import annotations

import hashlib
import math
import os
import re

import pytest

import tests.conftest as cf
from quacfka_spark.operators.text import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _DSIR_BUCKETS,
    _DSIR_TARGET,
    t16_bm25_topk,
    t17_dsir_resample,
)

_OTHER_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
]

_CORPUS = [
    # (doc_id, text, source): srcs chosen so src0 is the DSIR target
    (0, "spark join window spark agg", "src0"),
    (1, "join window table scan", "src0"),
    (2, "the quick brown fox", "src1"),
    (3, "spark spark spark spark spark spark", "src1"),
    (4, "window Join SPARK mixed Case tokens", "src2"),
    (5, "no overlap here at all", "src2"),
    (6, "!!! ???", "src1"),  # no alnum grams at all
    (7, "join", "src2"),  # single token: no bigrams
    (8, "table scan agg filter value row", "src0"),
    (9, "spark window", "src1"),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("retrieval") / "sf")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in _CORPUS],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    for name in _OTHER_TABLES:
        os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", f"{d}/{name}.parquet")
    return d


def _py_bm25() -> dict[int, float]:
    """Independent Okapi BM25 (Robertson idf, ln(... + 1) flavor)."""
    toks = {i: [w for w in t.lower().split(" ") if w] for i, t, _ in _CORPUS}
    n = len(_CORPUS)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores: dict[int, float] = {}
    for i, tk in toks.items():
        s = 0.0
        matched = False
        for term in _BM25_TERMS:
            tf = tk.count(term)
            if tf:
                matched = True
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            dl = len(tk)
            s += idf * tf * (_BM25_K1 + 1) / (
                tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avgdl)
            )
        if matched:
            scores[i] = s
    return scores


def test_bm25_matches_independent_ground_truth(spark, corpus_dir):
    got = {r["doc_id"]: r["bm25"] for r in t16_bm25_topk(spark, corpus_dir).collect()}
    want = _py_bm25()
    assert set(got) == set(want)  # exactly the docs with any query term
    for i, s in want.items():
        assert got[i] == pytest.approx(s, abs=1e-6), i
    # ranking sanity: doc 3 is pure query-term spam but only one term;
    # doc 0 matches all three terms and must outrank it
    ranked = sorted(want, key=lambda i: (-want[i], i))
    assert ranked[0] == 0


def _py_grams(text: str) -> list[str]:
    toks = re.findall(r"[a-z0-9]+", text.lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % _DSIR_BUCKETS


def _py_dsir() -> dict[int, float]:
    """Independent DSIR: add-1-smoothed hashed-bucket log-likelihood
    ratio, weights rounded to 6dp exactly as both engines do."""
    buckets = {i: [_py_bucket(g) for g in _py_grams(t)] for i, t, _ in _CORPUS}
    target = {i for i, _, s in _CORPUS if s == _DSIR_TARGET}
    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    for i, bs in buckets.items():
        for b in bs:
            rc[b] = rc.get(b, 0) + 1
            if i in target:
                tc[b] = tc.get(b, 0) + 1
    r_tot, t_tot = sum(rc.values()), sum(tc.values())
    w = {
        b: round(
            math.log((tc.get(b, 0) + 1.0) / (t_tot + _DSIR_BUCKETS))
            - math.log((rc[b] + 1.0) / (r_tot + _DSIR_BUCKETS)),
            6,
        )
        for b in rc
    }
    return {i: sum(w[b] for b in bs) for i, bs in buckets.items()}


def test_dsir_matches_independent_ground_truth(spark, corpus_dir):
    rows = {r["doc_id"]: r for r in t17_dsir_resample(spark, corpus_dir).collect()}
    want = _py_dsir()
    assert set(rows) == {i for i, _, _ in _CORPUS}  # every doc scored
    for i, s in want.items():
        assert rows[i]["dsir_score"] == pytest.approx(s, abs=2e-6), i
        assert rows[i]["keep"] == (rows[i]["dsir_score"] > 0), i
    # the gram-less doc scores exactly 0 and is dropped
    assert rows[6]["dsir_score"] == 0.0 and rows[6]["keep"] is False
    # selection sanity: mean score of target-source docs must exceed the
    # raw mean (they ARE the target distribution)
    tgt = [want[i] for i, _, s in _CORPUS if s == _DSIR_TARGET]
    raw = list(want.values())
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)


def test_rrf_hybrid_matches_independent_ground_truth(spark, corpus_dir):
    """sim08's fusion, re-derived from scratch: exact cosine ranks from
    the fixture embeddings (numpy), BM25 ranks from the pure-Python
    scorer above, RRF = 1/(60+r) summed over the lists a doc appears
    in, top-10 by (score, doc_id)."""
    import numpy as np
    import pyarrow.parquet as pq

    from quacfka_spark.operators.similarity import (
        _QUERY_VEC_ID,
        _RRF_DEPTH,
        _RRF_K,
        sim08_rrf_hybrid,
    )

    tbl = pq.read_table(os.path.join(corpus_dir, "embeddings.parquet"))
    vec_ids = tbl["vec_id"].to_pylist()
    embs = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    q = embs[vec_ids.index(_QUERY_VEC_ID)]
    cos = embs @ q / (np.linalg.norm(embs, axis=1) * np.linalg.norm(q))
    vtop = sorted(
        ((round(float(c), 4), i) for i, c in zip(vec_ids, cos) if i != _QUERY_VEC_ID),
        key=lambda t: (-t[0], t[1]),
    )[:_RRF_DEPTH]
    vrank = {i: r + 1 for r, (_, i) in enumerate(vtop)}

    lex = sorted(_py_bm25().items(), key=lambda kv: (-kv[1], kv[0]))[:_RRF_DEPTH]
    lrank = {i: r + 1 for r, (i, _) in enumerate(lex)}

    want = {
        i: round(
            (1.0 / (_RRF_K + lrank[i]) if i in lrank else 0.0)
            + (1.0 / (_RRF_K + vrank[i]) if i in vrank else 0.0),
            6,
        )
        for i in set(lrank) | set(vrank)
    }
    top10 = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [(r["doc_id"], r["rrf"]) for r in sim08_rrf_hybrid(spark, corpus_dir).collect()]
    assert [i for i, _ in got] == [i for i, _ in top10]
    for (gi, gs), (wi, ws) in zip(got, top10):
        assert gs == pytest.approx(ws, abs=2e-6), (gi, gs, ws)
