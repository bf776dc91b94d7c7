"""xxHash64-as-DuckDB-SQL (operators/xxh64_sql.py) — the d03p oracle's
foundation (round-9 verdict ask #2). Three layers, each bit-exact:

1. the pure-Python reference vs Spark's JVM ``F.xxhash64`` (the
   ground truth the oracle must reproduce), across the byte-length
   regimes that exercise every code path (empty, <8, 8-aligned,
   4-byte tail, 1-byte tails, 32-byte stripes, multi-stripe,
   multi-byte UTF-8) plus seeded and multi-argument chains;
2. the SQL emitters vs the Python reference on fuzzed strings and
   signed-long chains (incl. NULL skip semantics);
3. the assembled d03p oracle vs the Spark kernel on the smoke
   fixture (the registry parity suite re-checks this at sf0.001/0.01).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from quacfka_spark.operators import xxh64_sql as X
from tests.conftest import SMOKE_DIR
from tests.parity import compare

_M = (1 << 64) - 1

EDGE_STRS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdefg",
    "abcdefgh",
    "0123456789012345",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 40,
    "x" * 63,
    "x" * 64,
    "x" * 65,
    "x" * 100,
    "héllo wörld €uro",
    "日本語テキスト with a tail long enough to cross 32 bytes",
    "tok1 tok2 tok3",
]


def _fuzz_strs(n: int = 40, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    out = list(EDGE_STRS)
    for _ in range(n):
        ln = rng.randrange(0, 90)
        out.append(
            "".join(chr(rng.randrange(32, 0x2FF)) for _ in range(ln))
        )
    return out


def test_python_ref_matches_spark(spark):
    """The reference must be bit-identical to the engine it oracles:
    plain string hash (seed 42), int-literal-seeded string hash
    (hashInt chained as seed — the minhash family's shape), single
    long, and the two-long fold."""
    strs = _fuzz_strs()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "idx int, s string"
    )
    rows = df.select(
        "idx",
        "s",
        F.xxhash64("s").alias("h_str"),
        F.xxhash64(F.lit(7), F.col("s")).alias("h_seeded"),
        F.xxhash64(F.col("idx").cast("long") * 123456789 - 42).alias(
            "h_long"
        ),
        F.xxhash64(
            F.col("idx").cast("long"), (-F.col("idx")).cast("long")
        ).alias("h_2long"),
    ).collect()
    for r in rows:
        b = r.s.encode("utf-8")
        assert X.signed(X.hash_bytes(b, 42)) == r.h_str, repr(r.s)
        assert (
            X.signed(X.hash_bytes(b, X.hash_int(7, 42))) == r.h_seeded
        ), repr(r.s)
        assert (
            X.signed(X.hash_long((r.idx * 123456789 - 42) & _M, 42))
            == r.h_long
        )
        assert (
            X.signed(X.hash_long((-r.idx) & _M, X.hash_long(r.idx, 42)))
            == r.h_2long
        )


def test_sql_string_hash_matches_python_ref():
    """str_hash_ctes at the d03p seeds (hashInt(i, 42), i in 0..11)
    over fuzzed strings — every byte-path regime in one relation."""
    seeds = {i: X.hash_int(i, 42) for i in range(12)}
    con = duckdb.connect()
    con.execute("CREATE TABLE src(s VARCHAR)")
    con.executemany(
        "INSERT INTO src VALUES (?)", [(s,) for s in _fuzz_strs()]
    )
    ctes, out = X.str_hash_ctes("src", seeds)
    for s, i, hs in con.sql(
        f"WITH {ctes} SELECT s, i, hs FROM {out}"
    ).fetchall():
        assert hs == X.signed(X.hash_bytes(s.encode("utf-8"), seeds[i])), (
            repr(s),
            i,
        )


def test_sql_long_chain_matches_python_ref():
    """long_chain_stages vs the reference fold, including Spark's
    null semantics (a NULL argument leaves the running seed
    unchanged) and sign handling."""
    rng = random.Random(11)
    vals = [
        tuple(rng.randrange(-(2**63), 2**63) for _ in range(3))
        for _ in range(50)
    ]
    vals += [(None, 5, -7), (None, None, None), (0, 0, 0), (-1, -1, -1)]
    con = duckdb.connect()
    con.execute("CREATE TABLE lsrc(a BIGINT, b BIGINT, c BIGINT)")
    con.executemany("INSERT INTO lsrc VALUES (?,?,?)", vals)
    ctes, out = X.long_chain_stages("base", ["a", "b", "c"], "sig")
    rows = con.sql(
        f"WITH base AS (SELECT * FROM lsrc){ctes}"
        f" SELECT a, b, c, sig FROM {out}"
    ).fetchall()
    assert len(rows) == len(vals)
    for a, b, c, sig in rows:
        h = 42
        for v in (a, b, c):
            if v is not None:
                h = X.hash_long(v & _M, h)
        assert X.signed(h) == sig, (a, b, c)


def test_d03p_oracle_parity_smoke(spark, duck_smoke):
    """The assembled production-family oracle (seeded string hashes ->
    minhash folds -> hashLong band sigs -> banded candidates -> exact
    Jaccard) must match the Spark kernel row-for-row — the statement
    that retires d03p's rows-only status."""
    from quacfka_spark.operators.dedup import (
        _d03p_oracle,
        d03p_minhash_xxhash_pairs,
    )

    df = d03p_minhash_xxhash_pairs(spark, SMOKE_DIR)
    assert compare(df, duck_smoke.sql(_d03p_oracle())) == []


def test_d03p_pairs_match_md5_family_on_fixture(spark):
    """Regression form of the retired d03x statement: on the fixtures
    the two hash families' verified pair sets agree exactly (any gap
    is LSH recall on boundary pairs, empirically zero here)."""
    from quacfka_spark.operators.dedup import minhash_pairs

    xx = {
        (r.i, r.j)
        for r in minhash_pairs(spark, SMOKE_DIR, family="xxhash64").collect()
    }
    md5 = {(r.i, r.j) for r in minhash_pairs(spark, SMOKE_DIR).collect()}
    assert xx == md5
    assert xx, "smoke fixture should contain near-dup pairs"


@pytest.mark.parametrize("bad", ["", "x"])
def test_str_hash_handles_degenerate_relation(bad):
    """An empty relation (or a single degenerate string) must flow
    through every CTE stage without list/index errors."""
    con = duckdb.connect()
    con.execute("CREATE TABLE src(s VARCHAR)")
    if bad:
        con.execute("INSERT INTO src VALUES (?)", [bad])
    ctes, out = X.str_hash_ctes("src", {0: 42})
    rows = con.sql(f"WITH {ctes} SELECT s, i, hs FROM {out}").fetchall()
    assert len(rows) == (1 if bad else 0)
    if bad:
        assert rows[0][2] == X.signed(
            X.hash_bytes(bad.encode("utf-8"), 42)
        )
