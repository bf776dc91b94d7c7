"""Fixture-drift screen for ``events.ts``.

The driver's fixture generator has emitted ``ts`` as three different
physical types across rounds: parquet TIMESTAMP(NANOS), TIMESTAMP_NTZ
(timestamp[us], no tz) and TIMESTAMP (timestamp[us, tz=UTC]). Round 3's
only red correctness row was x03 breaking on the NTZ flavor. This module
rewrites the events table with ``ts`` as each flavor and asserts every
ts-consuming declared query still hash-matches its DuckDB oracle on the
rewritten fixture, so dtype drift is caught in-repo before the driver
sees it.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quacfka_spark.catalog import TABLES
from quacfka_spark.registry import QUERIES, get_queries

import tests.conftest as cf
from tests.parity import compare

get_queries()

# Every declared query whose plan consumes events.ts.
TS_QUERIES = (
    "x01_asof_join",
    "x03_range_band_join",
    "x04_time_rollup",
    "s01_tumbling_window",
    "s02_sliding_window",
    "s03_session_window",
    "q37_range_interval_frame",
    "q51_running_distinct",
    "x11_changelog_merge",
    "x12_gap_fill",
)

_FLAVORS = {
    "ntz": pa.timestamp("us"),            # TIMESTAMP_NTZ (round-3 drift)
    "ltz": pa.timestamp("us", tz="UTC"),  # TIMESTAMP (instant semantics)
}


@pytest.fixture(scope="module", params=sorted(_FLAVORS))
def drift_dir(request, tmp_path_factory):
    """Fixture dir identical to SMOKE_DIR except events.ts is recast."""
    dst = tmp_path_factory.mktemp(f"ts_{request.param}")
    for name in TABLES:
        if name != "events":
            os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", dst / f"{name}.parquet")
    tbl = pq.read_table(f"{cf.SMOKE_DIR}/events.parquet")
    idx = tbl.schema.get_field_index("ts")
    target = _FLAVORS[request.param]
    # Fixture values are microsecond-aligned (TESTDATA.md), so the cast
    # is lossless in every direction we exercise.
    recast = tbl.column(idx).cast(target)
    tbl = tbl.set_column(idx, pa.field("ts", target), recast)
    pq.write_table(tbl, dst / "events.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def duck_drift(drift_dir):
    con = cf.make_duck(drift_dir)
    # DuckDB reads timestamp[us, tz=UTC] as TIMESTAMPTZ, which renders
    # with a zone offset; normalize the oracle's view back to naive UTC
    # so both engines stringify/compare identically (Spark does the same
    # normalization in catalog.load_views under the pinned-UTC session).
    con.sql("SET TimeZone = 'UTC'")
    con.sql(
        "CREATE OR REPLACE VIEW events AS "
        "SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) "
        f"FROM '{drift_dir}/events.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", TS_QUERIES)
def test_ts_drift_parity(spark, drift_dir, duck_drift, name):
    q = QUERIES[name]
    df = q.fn(spark, drift_dir)
    assert q.oracle is not None
    problems = compare(df, duck_drift.sql(q.oracle))
    assert not problems, f"{name} on ts={os.path.basename(drift_dir)}: " + "; ".join(problems)


# ---------------------------------------------------------------------------
# embeddings drift screen: the same class of fixture regeneration that
# flipped events.ts could plausibly flip embedding to list<double> (or
# the list to large_list). The vector operators must hash-match their
# oracles on either flavor.

EMB_QUERIES = (
    "d05_embedding_cosine",
    "d07_cosine_lsh_pairs",
    "d10_semdedup",
    "sim01_bruteforce_topk",
    "sim02_lsh_topk",
)


@pytest.fixture(scope="module", params=["f64", "large_list"])
def emb_drift_dir(request, tmp_path_factory):
    dst = tmp_path_factory.mktemp(f"emb_{request.param}")
    for name in TABLES:
        if name != "embeddings":
            os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", dst / f"{name}.parquet")
    tbl = pq.read_table(f"{cf.SMOKE_DIR}/embeddings.parquet")
    idx = tbl.schema.get_field_index("embedding")
    if request.param == "f64":
        target = pa.list_(pa.float64())
    else:
        target = pa.large_list(pa.float32())
    recast = tbl.column(idx).cast(target)
    tbl = tbl.set_column(idx, pa.field("embedding", target), recast)
    pq.write_table(tbl, dst / "embeddings.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def duck_emb_drift(emb_drift_dir):
    con = cf.make_duck(emb_drift_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embedding_drift_parity(spark, emb_drift_dir, duck_emb_drift, name):
    q = QUERIES[name]
    df = q.fn(spark, emb_drift_dir)
    problems = compare(df, duck_emb_drift.sql(q.oracle))
    assert not problems, f"{name}: " + "; ".join(problems)


# ---------------------------------------------------------------------------
# documents drift screen: a regenerated fixture could plausibly surface
# text columns as large_string (arrow's 64-bit-offset flavor). The text
# operators must hash-match their oracles on that flavor too.

DOC_QUERIES = (
    "t01_token_count",
    "t04_fingerprint",
    "t08_decontaminate",
    "t09_chunk_split_builtin",
    "t10_pii_scrub",
    "t11_repetition_rules",
    "t12_sequence_pack",
    "t14_lm_perplexity",
    "d01_exact_dedup",
    "d03_minhash_lsh",
    "d09_chunk_freq_dedup",
)


@pytest.fixture(scope="module")
def doc_drift_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("doc_large_string")
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", dst / f"{name}.parquet")
    tbl = pq.read_table(f"{cf.SMOKE_DIR}/documents.parquet")
    schema = pa.schema(
        [
            pa.field(f.name, pa.large_string())
            if pa.types.is_string(f.type)
            else f
            for f in tbl.schema
        ]
    )
    pq.write_table(tbl.cast(schema), dst / "documents.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def duck_doc_drift(doc_drift_dir):
    con = cf.make_duck(doc_drift_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_documents_drift_parity(spark, doc_drift_dir, duck_doc_drift, name):
    q = QUERIES[name]
    df = q.fn(spark, doc_drift_dir)
    problems = compare(df, duck_doc_drift.sql(q.oracle))
    assert not problems, f"{name}: " + "; ".join(problems)


# ---------------------------------------------------------------------------
# orders drift screen: o_orderdate ships as timestamp[us] today; the
# natural drift is to date32. Extraction/window-order consumers must
# hash-match on either flavor.

ORD_QUERIES = ("q19_datetime_math", "q28_window_nav")


@pytest.fixture(scope="module")
def orders_drift_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("orders_date32")
    for name in TABLES:
        if name != "orders":
            os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", dst / f"{name}.parquet")
    tbl = pq.read_table(f"{cf.SMOKE_DIR}/orders.parquet")
    idx = tbl.schema.get_field_index("o_orderdate")
    recast = tbl.column(idx).cast(pa.date32())
    tbl = tbl.set_column(idx, pa.field("o_orderdate", pa.date32()), recast)
    pq.write_table(tbl, dst / "orders.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def duck_orders_drift(orders_drift_dir):
    con = cf.make_duck(orders_drift_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORD_QUERIES)
def test_orders_drift_parity(spark, orders_drift_dir, duck_orders_drift, name):
    q = QUERIES[name]
    problems = compare(q.fn(spark, orders_drift_dir), duck_orders_drift.sql(q.oracle))
    assert not problems, f"{name}: " + "; ".join(problems)


# ---------------------------------------------------------------------------
# punctuated-text drift screen: today's fixture text is pure lowercase
# alnum words — tokenizer mismatches between impl and oracle (\S+ vs
# [a-z0-9]+) are invisible on it. A regenerated fixture with punctuation
# or mixed case would surface them as hash mismatches at the driver gate.
# This rewrites documents.text with per-word punctuation + capitalization
# (alnum token stream PRESERVED, whitespace token stream changed) plus a
# few sub-3-token docs to exercise the short-doc shingle branches, and
# asserts every text/shingle consumer still matches its oracle.

PUNCT_QUERIES = (
    "t01_token_count",
    "t04_fingerprint",
    "t05_term_frequency",
    "t07_corpus_mix",
    "t08_decontaminate",
    "t09_chunk_split_builtin",
    "t10_pii_scrub",
    "t11_repetition_rules",
    "t12_sequence_pack",
    "t14_lm_perplexity",
    "d01_exact_dedup",
    "d02_ngram_jaccard",
    "d03_minhash_lsh",
    "d04_simhash",
    "d09_chunk_freq_dedup",
)

_PUNCT = [",", "!", ".", ";", "?"]


def _punctuate(doc_id: int, text: str) -> str:
    if doc_id % 17 == 0:
        return "Hi!"  # 1 alnum token — short-shingle branch
    if doc_id % 17 == 5:
        return "One, two."  # 2 alnum tokens
    if doc_id % 17 == 11:
        return "?!..."  # ZERO alnum tokens — the d09 phantom-chunk /
        # t11 NaN-vs-NULL mean-word-length trap
    words = text.split(" ")
    out = []
    for i, w in enumerate(words):
        if (doc_id + i) % 3 == 0:
            w = w.capitalize()
        if (doc_id + i) % 4 == 0:
            w = w + _PUNCT[(doc_id + i) % len(_PUNCT)]
        out.append(w)
    return " ".join(out)


@pytest.fixture(scope="module")
def punct_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("doc_punct")
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{cf.SMOKE_DIR}/{name}.parquet", dst / f"{name}.parquet")
    tbl = pq.read_table(f"{cf.SMOKE_DIR}/documents.parquet")
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    new_text = pa.array(
        [_punctuate(i, t) for i, t in zip(ids, texts)], type=pa.string()
    )
    idx = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(idx, pa.field("text", pa.string()), new_text)
    pq.write_table(tbl, dst / "documents.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def duck_punct(punct_dir):
    con = cf.make_duck(punct_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", PUNCT_QUERIES)
def test_punctuated_text_parity(spark, punct_dir, duck_punct, name):
    q = QUERIES[name]
    df = q.fn(spark, punct_dir)
    problems = compare(df, duck_punct.sql(q.oracle))
    assert not problems, f"{name}: " + "; ".join(problems)
