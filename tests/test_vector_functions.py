"""Unit tests for the vector expression/UDF primitives.

cosine (codegen fold) and cosine_batch (Arrow pandas_udf) are two
implementations of the same math for different volume regimes; they must
agree to double precision on real vectors and share the same degenerate
conventions (zero-norm -> non-finite/NULL, never a fake 0.0 similarity).
cosine_batch is library surface for pre-materialized pair tables (d07's
verify moved to bucket-local numpy), so this file is its coverage.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from quacfka_spark.functions.vector import cosine, cosine_batch, dot, sign_bucket


def _pairs_df(spark):
    rows = [
        ([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        ([1.0, 2.0, -3.0], [-4.0, 0.5, 9.0]),
        ([0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),  # zero-norm left side
    ]
    return spark.createDataFrame(rows, "a array<double>, b array<double>")


def test_cosine_batch_matches_expression_cosine(spark):
    df = _pairs_df(spark)
    got = df.select(
        cosine("a", "b").alias("expr"),
        cosine_batch()(F.col("a"), F.col("b")).alias("batch"),
    ).collect()
    for r in got:
        if r["expr"] is None:
            # zero-norm: expression yields NULL, batch yields NaN — both
            # fail a >= threshold filter identically
            assert r["batch"] is None or math.isnan(r["batch"])
        else:
            assert abs(r["expr"] - r["batch"]) < 1e-12


def test_cosine_batch_on_fixture_embeddings(spark):
    from tests.conftest import SMOKE_DIR

    e = spark.read.parquet(f"{SMOKE_DIR}/embeddings.parquet").limit(50)
    pairs = (
        e.select(F.col("vec_id").alias("i"), F.col("embedding").cast("array<double>").alias("ea"))
        .crossJoin(
            e.select(F.col("vec_id").alias("j"), F.col("embedding").cast("array<double>").alias("eb"))
        )
        .filter(F.col("i") < F.col("j"))
    )
    got = pairs.select(
        cosine("ea", "eb").alias("expr"),
        cosine_batch()(F.col("ea"), F.col("eb")).alias("batch"),
    ).collect()
    assert len(got) == 50 * 49 // 2
    for r in got:
        assert abs(r["expr"] - r["batch"]) < 1e-9


def test_dot_and_sign_bucket_conventions(spark):
    df = spark.createDataFrame(
        [([1.0, -2.0, 3.0],), ([0.5],)], "a array<double>"
    )
    got = df.select(
        dot("a", "a").alias("d"),
        sign_bucket("a", n_bits=4).alias("sb"),
    ).collect()
    assert abs(got[0]["d"] - 14.0) < 1e-12
    assert got[0]["sb"] == "1010"
    # short vector: try_element_at past the end -> '0', like DuckDB NULL
    assert got[1]["sb"] == "1000"


def test_quantize_q4_three_faces_agree(spark):
    """The repo-wide fixed-point rule (round-7 verdict ask #3) has three
    faces — numpy kernel, Catalyst expression, DuckDB oracle SQL — that
    must agree EXACTLY, including the negative half-boundary cases where
    floor(x*1e4 + 0.5) (the retired convention) rounds the other way."""
    import duckdb
    import numpy as np

    from quacfka_spark.functions.vector import (
        quantize_q4,
        quantize_q4_col,
        quantize_q4_sql,
    )

    vals = [
        0.0, 0.00005, -0.00005, 0.00015, -0.00015, 0.12345, -0.12345,
        1.0, -1.0, -2.0, 0.99995, -0.99995, 0.7071067811865476,
    ]
    npq = list(quantize_q4(np.array(vals)))
    spq = [
        r["q"]
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(quantize_q4_col(F.col("x")).alias("q"))
        .collect()
    ]
    con = duckdb.connect()
    dkq = [
        con.sql(
            f"SELECT {quantize_q4_sql('x')} FROM "
            f"(SELECT CAST({v!r} AS DOUBLE) AS x)"
        ).fetchone()[0]
        for v in vals
    ]
    assert npq == spq == dkq
    # and the retired convention REALLY disagrees on a negative half
    # boundary (guards against someone 'simplifying' back to it)
    assert int(np.floor(-0.00005 * 1e4 + 0.5)) != npq[2]


def test_cosine_prep_int8_sgemm_is_exact():
    """The int8 verify path's exactness claim (arrowkit.cosine_prep):
    int8 dot products are integers < 2^24, so the float32 SGEMM result
    cast to float64 equals the all-float64 computation BIT FOR BIT —
    the property that makes d07q exact-oracle-checkable while running
    the cheaper matmul."""
    import numpy as np

    from quacfka_spark.operators.arrowkit import cosine_block, cosine_prep

    rng = np.random.default_rng(3)
    q = rng.integers(-127, 128, size=(300, 64)).astype(np.int8)
    m32, norms = cosine_prep(q)
    assert m32.dtype == np.float32 and norms.dtype == np.float64
    got = cosine_block(m32, norms, m32, norms, 0, 300)
    q64 = q.astype(np.float64)
    n64 = np.sqrt((q64 ** 2).sum(axis=1))
    with np.errstate(invalid="ignore", divide="ignore"):
        want = (q64 @ q64.T) / (n64[:, None] * n64[None, :])
    assert got.dtype == np.float64
    assert np.array_equal(got, want)  # bit-exact, not allclose


def test_cosine_prep_int8_wide_dim_falls_back_to_float64():
    """The float32-SGEMM shortcut's precondition (dim * 127^2 < 2^24,
    dim <= 1040) is ENFORCED (r11 advisor): at production embedding
    dims (1536) float32 partial sums would round and silently break
    d07q's bit-exact oracle parity, so cosine_prep must widen to
    float64 there — and the DGEMM result must still be bit-exact
    (int dots < 2^53)."""
    import numpy as np

    from quacfka_spark.operators.arrowkit import cosine_block, cosine_prep

    rng = np.random.default_rng(5)
    dim = 1536
    assert dim * 127**2 >= 2**24  # the dim the advisor named
    q = rng.integers(-127, 128, size=(50, dim)).astype(np.int8)
    prep, norms = cosine_prep(q)
    assert prep.dtype == np.float64  # fallback engaged
    got = cosine_block(prep, norms, prep, norms, 0, 50)
    q64 = q.astype(np.float64)
    n64 = np.sqrt((q64 ** 2).sum(axis=1))
    with np.errstate(invalid="ignore", divide="ignore"):
        want = (q64 @ q64.T) / (n64[:, None] * n64[None, :])
    assert np.array_equal(got, want)
    # and the boundary itself: dim 1040 is the last float32-eligible dim
    assert 1040 * 127**2 < 2**24 and 1041 * 127**2 >= 2**24
    small = rng.integers(-127, 128, size=(4, 1040)).astype(np.int8)
    assert cosine_prep(small)[0].dtype == np.float32


def test_cosine_prep_float_path_unchanged():
    """The float path must reproduce the historical normalize-then-
    matmul arithmetic exactly (existing d05/d07 oracle hashes depend
    on it), including NaN rows for zero-norm vectors."""
    import numpy as np

    from quacfka_spark.operators.arrowkit import cosine_block, cosine_prep

    rng = np.random.default_rng(4)
    m = rng.normal(size=(64, 16)).astype(np.float32)
    m[7] = 0.0  # zero-norm row -> NaN cosine, callers' masks drop it
    prep, norms = cosine_prep(m)
    assert norms is None
    got = cosine_block(prep, None, prep, None, 0, 64)
    m64 = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        legacy = m64 / np.linalg.norm(m64, axis=1, keepdims=True)
    want = legacy[0:64] @ legacy.T
    assert np.array_equal(
        np.nan_to_num(got, nan=-9.0), np.nan_to_num(want, nan=-9.0)
    )
    assert np.isnan(got[7]).all()


def test_quantize_int8_three_faces_agree(spark):
    """The int8 verify payload's three faces — numpy
    (quantize_int8, the production mapInArrow path), Catalyst
    (quantize_int8_col, the reference transform), DuckDB (the d07q /
    sim10q oracle's list comprehension) — must be bit-identical on the
    fixture embeddings: all three run the same float64 arithmetic and
    the same sign*floor(abs+0.5) tie CONSTRUCTION (not merely the same
    half-away-from-zero convention — library round()s implement that
    convention via decimal/libm paths that can disagree with the floor
    construction one ulp below a .5 boundary; r12 advisor), so a
    drift in any face flips oracle hashes."""
    import duckdb
    import numpy as np

    from pyspark.sql import functions as F

    from quacfka_spark.functions.vector import (
        quantize_int8,
        quantize_int8_col,
        with_int8_embedding,
    )

    src = "/root/testdata/sf0.001/embeddings.parquet"
    df = spark.read.parquet(src).filter(F.col("embedding").isNotNull())
    # production face (mapInArrow)
    prod = {
        r["vec_id"]: r["q8"]
        for r in with_int8_embedding(df).select("vec_id", "q8").collect()
    }
    # Catalyst reference face
    cat = {
        r["vec_id"]: r["q"]
        for r in df.select(
            "vec_id", quantize_int8_col("embedding").alias("q")
        ).collect()
    }
    # oracle face (the d07q/sim10q SQL, verbatim semantics)
    con = duckdb.connect()
    duck = {
        vid: q
        for vid, q in con.sql(
            f"""
            WITH e AS (SELECT * FROM '{src}' WHERE embedding IS NOT NULL),
            nrm AS (SELECT vec_id,
                sqrt(list_sum([CAST(x AS DOUBLE) * x for x in embedding]))
                  AS nv FROM e)
            SELECT e.vec_id,
                [CAST(SIGN(CAST(x AS DOUBLE) * 127.0 /
                       (CASE WHEN n.nv > 0 THEN n.nv ELSE 1.0 END))
                      * FLOOR(ABS(CAST(x AS DOUBLE) * 127.0 /
                          (CASE WHEN n.nv > 0 THEN n.nv ELSE 1.0 END))
                          + 0.5) AS TINYINT)
                 for x in e.embedding]
            FROM e JOIN nrm n ON n.vec_id = e.vec_id
            """
        ).fetchall()
    }
    assert prod and set(prod) == set(cat) == set(duck)
    for vid in prod:
        assert list(prod[vid]) == list(cat[vid]) == list(duck[vid]), vid
    # numpy face directly, zero-norm row -> all zeros
    z = quantize_int8(np.array([[0.0, 0.0], [3.0, 4.0]]))
    assert z.dtype == np.int8
    assert z[0].tolist() == [0, 0]
    assert z[1].tolist() == [76, 102]  # round(127*3/5)=76.2->76, 101.6->102
