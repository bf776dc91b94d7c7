"""Deduplication operators over the ``documents`` table.

North-star LLM-data-pipeline surface: exact dedup, n-gram Jaccard
near-dup, MinHash+LSH, SimHash, and embedding-cosine near-dup. The
reference has no dedup (its dedup story was "write SQL against the
DuckDB files", /root/reference/duck.go:49-52); these are first-class
distributed operators here.

Scale design (100 TB):
- Exact dedup is a hash group-by on a digest — one shuffle on md5(text),
  never on the full text bytes.
- Per-doc signatures (minhash, simhash, fingerprints) are computed as
  *array folds inside one projection* — zero shuffles, zero explodes —
  so signature generation is scan-bound.
- The only quadratic danger is candidate-pair generation. d02 (exact
  shingle join) is the small-scale/oracle baseline; d03 (MinHash LSH
  banding) is the scale path: the shuffle key is the band signature, so
  join fan-out is bounded by bucket size, and the exact Jaccard verify
  runs only on candidate pairs.
- Portable hashing is md5-seeded (oracle-checkable): minhash runs ONE
  md5 per shingle and derives its 12 functions as affine maps of the
  32-bit base hash (see _MH_A/_MH_B). At production scale swap
  ``xxhash64`` (d03p/d03x) — same shapes, cheaper still per shingle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.functions.text import norm_tokens, shingles
from quacfka_spark.plans.spread import spread_for_cpu
from quacfka_spark.registry import query

# DuckDB expression fragments for the shared oracle CTEs.
_ORACLE_TOKS = (
    "SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents"
)
_ORACLE_SHINGLES = """
    SELECT doc_id,
           CASE WHEN len(tk) >= 3
                THEN list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                    for i in generate_series(1, len(tk)-2)])
                -- COALESCE: DuckDB array_to_string([]) is NULL while
                -- Spark concat_ws of an empty array is '' — a
                -- zero-token doc's single whole-doc shingle must be ''
                -- in both engines (empty docs pair with each other,
                -- the short-doc dedup convention)
                ELSE [COALESCE(array_to_string(tk, ' '), '')] END AS shs
    FROM toks
"""


def _norm_tokens() -> F.Column:
    return norm_tokens("text")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Fan a CPU-heavy expression stage out to full core count when (and
    only when) the scan behind it is under-split — single-file fixtures
    run the whole shingle/hash pipeline on 1 of N cores otherwise, while
    an already-parallel scan (many files) skips the exchange entirely.
    See plans/spread.py for the decision rule."""
    return spread_for_cpu(df)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    # Materialize the token array in its own projection BEFORE shingling:
    # the gram lambda references its input ~3n times via element_at, and
    # Catalyst inlines (rather than CSEs) an expression argument, so
    # passing the regexp tokenizer directly would re-run the regex per
    # element_at (~300x per doc — measured 8s/500 docs vs <1s split).
    # CollapseProject keeps the stages separate because the tokenizer is
    # non-cheap and multiply-referenced.
    toks = _spread(spark, t["documents"]).select(
        "doc_id", _norm_tokens().alias("tk")
    )
    return toks.select("doc_id", shingles(F.col("tk")).alias("shs"))


# --------------------------------------------------------------------------
@query(
    "d01_exact_dedup",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
    FROM documents GROUP BY source ORDER BY source
    """,
    doc="Exact dedup accounting per source: group-by on md5(text) digest. "
    "At 100 TB the shuffle carries 16-byte digests, not document bytes.",
)
def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    return (
        t["documents"]
        .select("source", F.md5("text").alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_dupes"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
@query(
    "d02_ngram_jaccard",
    oracle=f"""
    WITH toks AS ({_ORACLE_TOKS}),
    sh AS ({_ORACLE_SHINGLES}),
    ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    n AS (SELECT doc_id, len(shs) AS n FROM sh),
    common AS (
      SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT c.i, c.j, ROUND(c.c * 1.0 / (na.n + nb.n - c.c), 4) AS jaccard
    FROM common c JOIN n na ON na.doc_id = c.i JOIN n nb ON nb.doc_id = c.j
    WHERE c.c * 1.0 / (na.n + nb.n - c.c) >= 0.8
    ORDER BY i, j
    """,
    doc="Exact word-3-gram Jaccard near-dup pairs (threshold 0.8): "
    "explode shingles -> self-join on shingle -> pair-count -> Jaccard. "
    "The shingle join is the textbook exact baseline; d03 is the LSH "
    "path that bounds its fan-out at scale.",
)
def d02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir)
    # explode_outer: shs is never empty (short docs get a 1-element
    # array), and inner explode would infer a size(shs)>0 filter that
    # pushes the whole shingle tree below the repartition (see d03).
    ex = sh.select(
        "doc_id", F.size("shs").alias("n"), F.explode_outer("shs").alias("s")
    )
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            F.col("a.n").alias("n_i"),
            F.col("b.n").alias("n_j"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c") / (F.col("n_i") + F.col("n_j") - F.col("c"))
    return (
        common.filter(jac >= 0.8)
        .select("i", "j", F.round(jac, 4).alias("jaccard"))
        .orderBy("i", "j")
    )


# --------------------------------------------------------------------------
_MINHASH_N = 12  # hash functions
_BAND_SIZE = 3  # rows per band -> 4 bands
# Universal-hash family over ONE 32-bit base hash per shingle:
# h_i(x) = (A_i * x + B_i) mod p, p = 2^31-1 (Mersenne prime), A_i/B_i
# fixed 30-bit constants. This is the classical minhash construction
# (Broder 1997; Carter–Wegman universal hashing): md5 runs ONCE per
# shingle (x = its first 8 hex digits), and the 12 modular-affine maps
# are near-independent permutations of x-space — unlike naive linear
# combos h1 + i*h2, which are monotone in i (one small-h shingle then
# minimizes many seeds at once; measured 92% pair agreement vs the
# xxhash64 family, vs 100% for this construction). Max intermediate
# A_i * x < 2^30 * 2^32 = 2^62 — no bigint overflow under ANSI mode.
_MH_PRIME = 2_147_483_647
_MH_A = [
    787_262_135, 611_373_529, 109_232_147, 974_668_621,
    317_556_199, 841_909_313, 463_187_705, 255_470_339,
    682_341_931, 150_923_777, 928_736_003, 539_614_841,
]
_MH_B = [
    357_913_941, 715_827_883, 178_956_971, 894_784_853,
    447_392_427, 223_696_213, 596_523_235, 298_261_617,
    774_541_003, 387_270_501, 943_635_251, 471_817_625,
]


def _minhash_cols(family: str = "md5") -> list[F.Column]:
    """12 minhashes, each an array fold over the shingle array — computed
    in one projection, no explode, no shuffle.

    ``family="md5"`` is the portable oracle-checkable family: the
    Broder-style affine construction over ONE 32-bit base hash per
    shingle — ``h_i(x) = (A_i*x + B_i) mod p`` with the fixed _MH_A/_MH_B
    constants and p = _MH_PRIME (see the constants comment above for why
    affine-mod, not naive linear combos) — which cuts digest work 12x vs
    an md5 per seed while staying bit-identical in DuckDB
    (``('0x' || substr(md5(s), 1, 8))::BIGINT`` == Spark
    ``conv(substring(md5(s), 1, 8), 16, 10)``).
    ``family="xxhash64"`` is the production swap the module docstring
    promises (seeded native 64-bit hash, no hex-string materialization —
    same operator shape, cheaper still per shingle).

    The caller must provide the ``hx`` base-hash array column for the
    md5 family (from :func:`_minhash_base`) so the digest computes once.
    """
    # One F.expr per minhash (the vector.py build-time rationale: the
    # composed transform-lambda form cost ~35 py4j round trips per
    # minhash x 12; the parsed tree is identical). Seeds/constants are
    # Python ints interpolated into the SQL text — the two-parameter
    # lambda trap of the old Column form cannot arise here.
    def mh(i: int) -> F.Column:
        if family == "xxhash64":
            return F.expr(
                f"array_min(transform(shs, s -> xxhash64({i}, s)))"
            )
        return F.expr(
            f"array_min(transform(hx, x -> ({_MH_A[i]} * x + {_MH_B[i]})"
            f" % {_MH_PRIME}))"
        )

    return [mh(i).alias(f"mh{i}") for i in range(_MINHASH_N)]


def _minhash_base(sh: DataFrame) -> DataFrame:
    """(doc_id, shs, hx): the per-shingle 32-bit base hash (md5 computed
    ONCE, first 8 hex digits as bigint), materialized in its own
    projection so CollapseProject cannot inline the digest into all 12
    minhash folds (md5 is non-cheap, so Catalyst keeps the boundary)."""
    hx = F.expr(
        "transform(shs, s ->"
        " CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT))"
    )
    return sh.select("doc_id", "shs", hx.alias("hx"))


# Shared by d03 (pairs) and d06 (clusters-over-pairs): the full MinHash
# chain replicated in DuckDB SQL.
_D03_ORACLE = f"""
    WITH toks AS ({_ORACLE_TOKS}),
    sh AS ({_ORACLE_SHINGLES}),
    hh AS (
      SELECT doc_id, shs,
             [('0x' || substr(md5(s), 1, 8))::BIGINT FOR s IN shs] AS hx
      FROM sh),
    ab AS (SELECT * FROM (VALUES {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(zip(_MH_A, _MH_B)))}) t(i, a, b)),
    mh AS (
      SELECT doc_id, ab.i,
             list_aggregate(
               list_transform(hx, x -> (ab.a * x + ab.b) % {_MH_PRIME}),
               'min') AS m
      FROM hh, ab),
    bands AS (
      SELECT doc_id, i // {_BAND_SIZE} AS band,
             md5(string_agg(CAST(m AS VARCHAR), '|' ORDER BY i)) AS sig
      FROM mh GROUP BY doc_id, i // {_BAND_SIZE}),
    cand AS (
      SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    n AS (SELECT doc_id, len(shs) AS n FROM sh),
    common AS (
      SELECT c.i, c.j, COUNT(*) AS c
      FROM cand c JOIN ex a ON a.doc_id = c.i
                  JOIN ex b ON b.doc_id = c.j AND b.s = a.s
      GROUP BY c.i, c.j)
    SELECT c.i, c.j, ROUND(c.c * 1.0 / (na.n + nb.n - c.c), 4) AS jaccard
    FROM common c JOIN n na ON na.doc_id = c.i JOIN n nb ON nb.doc_id = c.j
    WHERE c.c * 1.0 / (na.n + nb.n - c.c) >= 0.7
    ORDER BY i, j
    """


@query(
    "d03_minhash_lsh",
    oracle=_D03_ORACLE,
    doc="MinHash+LSH near-dup: 12 universal-hash minhashes (one md5 per "
    "shingle -> 32-bit base hash -> (A_i*x+B_i) mod p affine maps, "
    "Broder-style) as array folds (no shuffle), banded 3-wide into 4 "
    "LSH signatures, bucket self-join "
    "on (band, sig) for candidates, exact Jaccard verify on candidates "
    "via array_intersect (threshold 0.7). The shingle array rides along "
    "through the band shuffle, so the whole plan is ONE exchange "
    "(reused by both self-join sides — the shingle/minhash subtree "
    "computes once) plus the candidate group-by. At extreme doc sizes "
    "you would shuffle doc_ids only and re-join for shingles; carrying "
    "the ~KB shingle set is the standard minhash-dedup layout.",
)
def d03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        minhash_pairs(spark, sf_dir)
        .select("i", "j", F.round(F.col("_j"), 4).alias("jaccard"))
        .orderBy("i", "j")
    )


def _minhash_bands(
    spark: SparkSession, sf_dir: str, family: str = "md5"
) -> DataFrame:
    """The exploded (doc_id, shs, band, sig) band frame — minhash_pairs'
    shuffle input, shared with d03g (the ingest near-dup gate
    certification, which applies the gate's >=min_bands pair policy
    over the same bands instead of any-band + Jaccard verify)."""
    sh = _doc_shingles(spark, sf_dir)
    if family == "md5":
        sh = _minhash_base(sh)
    sigs = sh.select("doc_id", "shs", *_minhash_cols(family))
    n_bands = _MINHASH_N // _BAND_SIZE
    if family == "xxhash64":
        # band signature = one native hash over the 3 bigint minhashes —
        # no hex concat, the band shuffle key is 8 bytes not 32.
        band_sigs = [
            F.xxhash64(
                *[F.col(f"mh{b * _BAND_SIZE + k}") for k in range(_BAND_SIZE)]
            ).alias(f"band{b}")
            for b in range(n_bands)
        ]
    else:
        # explicit string cast: the minhashes are bigint now, and the
        # oracle's string_agg(CAST(m AS VARCHAR)) renders them the same
        band_sigs = [
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{b * _BAND_SIZE + k}").cast("string")
                        for k in range(_BAND_SIZE)
                    ],
                )
            ).alias(f"band{b}")
            for b in range(n_bands)
        ]
    # (doc_id, shs, band, sig) via posexplode of the band-signature array;
    # both self-join sides shuffle on (band, sig) -> one reused exchange.
    # posexplode_OUTER, not posexplode: bs always has exactly n_bands
    # elements so they are equivalent, but an inner Generate makes
    # InferFiltersFromGenerate add `size(bs) > 0`, which pushes below the
    # repartition with the ENTIRE tokenize->shingle->minhash->band tree
    # inlined — the whole pipeline then runs twice, once on the single
    # pre-shuffle scan task (measured 10s of the 14s total at sf0.001).
    return (
        sigs.select("doc_id", "shs", F.array(*band_sigs).alias("bs"))
        .select("doc_id", "shs", F.posexplode_outer("bs").alias("band", "sig"))
    )


def minhash_pairs(
    spark: SparkSession, sf_dir: str, family: str = "md5"
) -> DataFrame:
    """Jaccard-verified LSH candidate pairs (i, j, _j) — the shared core
    of d03 (reported pairs), d06 (duplicate clusters) and d03x (the
    xxhash64 production variant). Public API: composed pipelines (see
    examples/training_data_pipeline.py) consume the pair stream directly
    and feed it to ``label_propagate``."""
    bands = _minhash_bands(spark, sf_dir, family)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        # a pair colliding in multiple bands appears up to 4x; the
        # group-by dedupes it (shs is functionally dependent on doc_id)
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.first("a.shs").alias("shs_i"), F.first("b.shs").alias("shs_j"))
    )
    common = F.size(F.array_intersect("shs_i", "shs_j"))
    # try_divide, not /: two empty shingle sets would score 0/0 = NaN,
    # and Spark's NaN ordering makes NaN >= 0.7 TRUE — try_divide yields
    # NULL instead, which the filter drops. Unreachable today only
    # because shingles(short_empty=False) never returns an empty array
    # (functions/text.py: a sub-n-token doc gets its whole token string,
    # '' for zero tokens) — a non-local invariant this guard removes the
    # dependence on.
    jac = F.try_divide(common, F.size("shs_i") + F.size("shs_j") - common)
    return cand.select("i", "j", jac.alias("_j")).filter(F.col("_j") >= 0.7)


# --------------------------------------------------------------------------
def _d03p_oracle() -> str:
    """The xxhash64 MinHash chain replicated in DuckDB SQL — the
    round-9 verdict's carried ask #2. xxHash64 is a public
    deterministic spec with only fold-shaped loops, so it renders as
    list_reduce folds over HUGEINT arithmetic (operators/xxh64_sql.py,
    fuzz-proven bit-identical to Spark's JVM implementation). Spark's
    ``xxhash64(lit(i), s)`` chains hashInt(i, 42) into the string
    hash's seed — a constant per i, folded at SQL-build time; the
    band signature ``xxhash64(mh0, mh1, mh2)`` is the hashLong chain
    (long_chain_stages). Docs whose shingle set is EMPTY are excluded
    from the band CTE (they produce no ``ex`` rows, so the ``mh`` join
    drops them). Exclusion is parity-safe because no such doc exists on
    EITHER side: ``shingles(short_empty=False)`` always yields at least
    one shingle (a sub-n-token doc gets its whole token string, '' for
    zero tokens — functions/text.py), and the oracle's shingle CTE
    mirrors that with its COALESCE-to-'' branch. The Spark verify is
    additionally guarded with try_divide so a hypothetical
    empty-vs-empty pair would score NULL, never NaN >= 0.7."""
    return f"""
    WITH {_d03p_band_ctes()},
    cand AS (
      SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    {_D03P_VERIFY_CTES}
    SELECT c.i, c.j, ROUND(c.c * 1.0 / (na.n + nb.n - c.c), 4) AS jaccard
    FROM common c JOIN n na ON na.doc_id = c.i JOIN n nb ON nb.doc_id = c.j
    WHERE c.c * 1.0 / (na.n + nb.n - c.c) >= 0.7
    ORDER BY i, j
    """


def _d03p_band_ctes() -> str:
    """The shared xxHash64 CTE chain up through the banded
    (doc_id, band, sig) relation — d03p's oracle prefix, reused by
    d03g (the ingest near-dup gate certification, which applies a
    different PAIR POLICY over the same bands)."""
    from quacfka_spark.operators.xxh64_sql import (
        hash_int,
        long_chain_stages,
        str_hash_ctes,
    )

    seeds = {i: hash_int(i, 42) for i in range(_MINHASH_N)}
    str_ctes, str_out = str_hash_ctes("xd", seeds, "xx")
    long_ctes, long_out = long_chain_stages(
        "mhp", ["m0", "m1", "m2"], "sig", "xl"
    )
    return f"""toks AS ({_ORACLE_TOKS}),
    sh AS ({_ORACLE_SHINGLES}),
    ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    xd AS (SELECT DISTINCT s FROM ex),
    {str_ctes},
    mh AS (
      SELECT e.doc_id, x.i, MIN(x.hs) AS m
      FROM ex e JOIN {str_out} x ON x.s = e.s
      GROUP BY e.doc_id, x.i),
    mhp AS (
      SELECT doc_id, i // {_BAND_SIZE} AS band,
        MAX(CASE WHEN i % {_BAND_SIZE} = 0 THEN m END) AS m0,
        MAX(CASE WHEN i % {_BAND_SIZE} = 1 THEN m END) AS m1,
        MAX(CASE WHEN i % {_BAND_SIZE} = 2 THEN m END) AS m2
      FROM mh GROUP BY doc_id, i // {_BAND_SIZE}){long_ctes},
    bands AS (SELECT doc_id, band, sig FROM {long_out})"""


# Jaccard verify over ``cand`` (i, j) — the tail both d03p and d03g's
# truth side share. Expects the ``_d03p_band_ctes`` prefix in scope.
_D03P_VERIFY_CTES = """n AS (SELECT doc_id, len(shs) AS n FROM sh),
    common AS (
      SELECT c.i, c.j, COUNT(*) AS c
      FROM cand c JOIN ex a ON a.doc_id = c.i
                  JOIN ex b ON b.doc_id = c.j AND b.s = a.s
      GROUP BY c.i, c.j)"""


@query(
    "d03p_minhash_xxhash_pairs",
    oracle=_d03p_oracle(),
    doc="d03's production hash family: MinHash+LSH with seeded xxhash64 "
    "instead of md5 — identical plan shape (signature folds in one "
    "projection, one reused band exchange, Jaccard verify on candidates "
    "only) but native 64-bit hashes end to end: no hex strings "
    "materialize and the band shuffle key is 8 bytes, which is why this "
    "is the 100 TB configuration. Oracle-checked since round 10: the "
    "public xxHash64 spec is replicated as DuckDB SQL folds "
    "(operators/xxh64_sql.py), so the ENTIRE production chain — seeded "
    "per-shingle hashes, minhash folds, hashLong band signatures, "
    "banded candidates, exact Jaccard verify — hash-matches engine-vs-"
    "oracle like every other dedup key. d03x_minhash_xxhash remains as "
    "the cross-family agreement regression gate.",
)
def d03p_minhash_xxhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        minhash_pairs(spark, sf_dir, family="xxhash64")
        .select("i", "j", F.round(F.col("_j"), 4).alias("jaccard"))
        .orderBy("i", "j")
    )


@query(
    "d03x_minhash_xxhash",
    oracle="SELECT CAST(1 AS INTEGER) AS ok",
    doc="Cross-family agreement gate for the xxhash64 production "
    "family: both families' Jaccard-VERIFIED pair sets (threshold 0.7) "
    "must agree to >= 95% set-Jaccard. Verify-stage precision is exact "
    "in both (candidates are re-scored with true Jaccard), so any "
    "disagreement is LSH recall on boundary pairs — bounded here, and "
    "empirically zero on the fixtures. RETIRED from load-bearing duty "
    "in round 10: d03p now carries its own exact oracle (the xxHash64 "
    "spec replicated as DuckDB SQL, operators/xxh64_sql.py), so this "
    "key survives as the regression check that the two hash families "
    "keep finding the same near-dups.",
)
def d03x_minhash_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One union-with-marker aggregation, NOT intersect + union.distinct:
    # the latter embedded each family's full band-join + Jaccard-verify
    # pipeline under TWO consumers, so every minhash pipeline executed
    # twice per check. Here each pipeline is evaluated once; a pair's
    # family membership count then yields both the union size (all
    # distinct pairs) and the intersection size (pairs seen by both
    # families) from a single group-by.
    md5_pairs = minhash_pairs(spark, sf_dir).select(
        "i", "j", F.lit("md5").alias("fam")
    )
    xx_pairs = minhash_pairs(spark, sf_dir, family="xxhash64").select(
        "i", "j", F.lit("xx").alias("fam")
    )
    per_pair = (
        md5_pairs.unionByName(xx_pairs)
        .groupBy("i", "j")
        .agg(F.count_distinct("fam").alias("fams"))
    )
    agg = per_pair.agg(
        F.count(F.lit(1)).alias("n_union"),
        # coalesce: SUM over an empty relation is NULL, and a corpus
        # where neither family finds a verified pair must read as
        # perfect agreement (0,0 -> ok=1), not ok=NULL
        F.coalesce(
            F.sum((F.col("fams") == 2).cast("int")), F.lit(0)
        ).alias("n_inter"),
    )
    ok = ((F.col("n_union") - F.col("n_inter")) <= 0.05 * F.col("n_union")).cast(
        "int"
    )
    return agg.select(ok.alias("ok"))


# --------------------------------------------------------------------------
# The ingest near-dup gate's pair policy (streaming/pipeline.py
# neardup_min_bands default): drop on >= 2 shared band keys, no verify.
_D03G_MIN_BANDS = 2
_D03G_PRECISION_GATE = 0.95
_D03G_RECALL_GATE = 0.85


def _d03g_oracle() -> str:
    return f"""
    WITH {_d03p_band_ctes()},
    gate AS (
      SELECT a.doc_id AS i, b.doc_id AS j
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.band) >= {_D03G_MIN_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    uh AS (
      SELECT a.doc_id
      FROM bands a JOIN bands o
        ON a.band = o.band AND a.sig = o.sig AND o.doc_id <> a.doc_id
      GROUP BY 1
      HAVING COUNT(DISTINCT a.band) >= {_D03G_MIN_BANDS}),
    gd AS (SELECT i AS doc_id FROM gate UNION SELECT j AS doc_id FROM gate),
    uo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_union_only
      FROM uh LEFT JOIN gd ON uh.doc_id = gd.doc_id
      WHERE gd.doc_id IS NULL),
    {_D03P_VERIFY_CTES},
    ver AS (
      SELECT c.i, c.j FROM common c
      JOIN n na ON na.doc_id = c.i JOIN n nb ON nb.doc_id = c.j
      WHERE c.c * 1.0 / (na.n + nb.n - c.c) >= 0.7),
    u AS (
      SELECT i, j, 1 AS in_g, 0 AS in_v FROM gate
      UNION ALL
      SELECT i, j, 0 AS in_g, 1 AS in_v FROM ver),
    per AS (
      SELECT i, j, MAX(in_g) AS in_g, MAX(in_v) AS in_v
      FROM u GROUP BY i, j),
    agg AS (
      SELECT CAST(COALESCE(SUM(in_g), 0) AS BIGINT) AS n_gate,
             CAST(COALESCE(SUM(in_v), 0) AS BIGINT) AS n_verified,
             CAST(COALESCE(SUM(in_g * in_v), 0) AS BIGINT) AS n_common
      FROM per)
    SELECT n_gate, n_verified, n_common, n_union_only,
           ROUND(CAST(n_common AS DOUBLE) / NULLIF(n_gate, 0), 4)
             AS precision,
           ROUND(CAST(n_common AS DOUBLE) / NULLIF(n_verified, 0), 4)
             AS recall,
           CAST(CASE WHEN (n_gate = 0
                           OR n_common >= {_D03G_PRECISION_GATE} * n_gate)
                      AND (n_verified = 0
                           OR n_common >= {_D03G_RECALL_GATE} * n_verified)
                     THEN 1 ELSE 0 END AS INTEGER) AS ok
    FROM agg CROSS JOIN uo
    """


@query(
    "d03g_neardup_gate_quality",
    oracle=_d03g_oracle(),
    doc="Certification for the INGEST-TIME near-dup gate (r10 verdict "
    "#3): the sink-level neardup_col policy (streaming/pipeline.py — "
    "d03p's 12-minhash/4-band xxhash64 family, drop on >= 2 shared "
    "band keys, NO Jaccard verify because the ledger never stores "
    "historical text) replayed in batch over the documents corpus and "
    "scored against d03p's VERIFIED pairs as truth. Gates: precision "
    ">= 0.95 (a dropped row must near-certainly be a true near-dup — "
    "false drops destroy data) and recall >= 0.85 (the min_bands=2 "
    "trade's cost: a verified pair colliding in only one band passes "
    "the gate). Measured: precision 1.0 at ALL three SFs, recall "
    "0.9286/0.96/1.0 at sf0.001/0.01/0.1 — consistent with the bench "
    "note this key replaces as evidence (INGEST_NEARDUP.json: 97.7% "
    "variant-drop at the sink). Value-hashed counts + 4dp metrics + "
    "gate flag, the d07x certification shape; pair policy and band "
    "family are the PRODUCTION constants, so a gate or family "
    "regression flips the driver hash. SCOPE (r11 advisor): the batch "
    "replica gates on >= min_bands shared bands with a SINGLE partner, "
    "while the production gate counts distinct band hits against the "
    "UNION ledger of all prior docs — a row colliding in one band each "
    "with two different partners is union-dropped but pairwise-"
    "invisible. n_union_only measures that residue (union-dropped docs "
    "absent from every gate pair): 0 at ALL three SFs, so the pairwise "
    "precision/recall certify the deployed semantics exactly on these "
    "corpora, and the column flips the hash if a corpus where the "
    "approximation bites ever appears.",
)
def d03g_neardup_gate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _minhash_bands(spark, sf_dir, family="xxhash64").select(
        "doc_id", "band", "sig"
    )
    a, b = bands.alias("a"), bands.alias("b")
    gate = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count_distinct(F.col("a.band")).alias("nb"))
        .filter(F.col("nb") >= _D03G_MIN_BANDS)
        .select("i", "j", F.lit(1).alias("in_g"), F.lit(0).alias("in_v"))
    )
    # union-ledger semantics delta (r11 advisor): production's
    # _neardup_against_history counts distinct band hits against the
    # UNION of all prior docs' band keys — a row colliding in one band
    # each with TWO DIFFERENT partners is dropped in production yet has
    # no single pairwise partner with >= min_bands shared bands, so it
    # never enters the pairwise gate set above. n_union_only measures
    # exactly that residue (union-dropped docs absent from every gate
    # pair), making the certification's pairwise-replica scope a
    # measured quantity instead of an approximation note.
    union_hits = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.count_distinct(F.col("a.band")).alias("uh"))
        .filter(F.col("uh") >= _D03G_MIN_BANDS)
        .select("doc_id")
    )
    ver = minhash_pairs(spark, sf_dir, family="xxhash64").select(
        "i", "j", F.lit(0).alias("in_g"), F.lit(1).alias("in_v")
    )
    per = (
        gate.unionByName(ver)
        .groupBy("i", "j")
        .agg(F.max("in_g").alias("in_g"), F.max("in_v").alias("in_v"))
    )
    gated_docs = (
        gate.select(F.col("i").alias("doc_id"))
        .unionByName(gate.select(F.col("j").alias("doc_id")))
        .distinct()
    )
    union_only = union_hits.join(gated_docs, "doc_id", "left_anti").agg(
        F.count("*").cast("long").alias("n_union_only")
    )
    agg = per.agg(
        F.coalesce(F.sum("in_g"), F.lit(0)).cast("long").alias("n_gate"),
        F.coalesce(F.sum("in_v"), F.lit(0)).cast("long").alias("n_verified"),
        F.coalesce(F.sum(F.col("in_g") * F.col("in_v")), F.lit(0))
        .cast("long")
        .alias("n_common"),
    ).crossJoin(union_only)
    precision = F.round(
        F.try_divide(
            F.col("n_common").cast("double"),
            F.nullif(F.col("n_gate"), F.lit(0)).cast("double"),
        ),
        4,
    )
    recall = F.round(
        F.try_divide(
            F.col("n_common").cast("double"),
            F.nullif(F.col("n_verified"), F.lit(0)).cast("double"),
        ),
        4,
    )
    ok = (
        F.when(
            (
                (F.col("n_gate") == 0)
                | (
                    F.col("n_common")
                    >= F.lit(_D03G_PRECISION_GATE) * F.col("n_gate")
                )
            )
            & (
                (F.col("n_verified") == 0)
                | (
                    F.col("n_common")
                    >= F.lit(_D03G_RECALL_GATE) * F.col("n_verified")
                )
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    return agg.select(
        "n_gate", "n_verified", "n_common", "n_union_only",
        precision.alias("precision"), recall.alias("recall"),
        ok.alias("ok"),
    )


# --------------------------------------------------------------------------
_SIMHASH_BITS = 16


def _simhash_oracle() -> str:
    # One signed-sum term per bit, folded over the per-token md5 list.
    terms = []
    for b in range(_SIMHASH_BITS):
        digit = f"substr(h, {1 + b // 4}, 1)"
        bit = f"(((instr('0123456789abcdef', {digit}) - 1) >> {b % 4}) & 1)"
        terms.append(
            f"CASE WHEN list_sum(list_transform(hs, h -> {bit} * 2 - 1)) > 0 "
            f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        )
    total = " + ".join(terms)
    return f"""
    WITH toks AS ({_ORACLE_TOKS}),
    hs AS (SELECT doc_id, list_transform(tk, t -> md5(t)) AS hs FROM toks)
    SELECT doc_id, CAST({total} AS BIGINT) AS simhash
    FROM hs ORDER BY doc_id
    """


@query(
    "d04_simhash",
    oracle=_simhash_oracle(),
    doc="16-bit SimHash signatures: per-token md5, per-bit signed vote "
    "(+1/-1 weighted by occurrence), majority bit -> signature. Computed "
    "as 16 array folds in a single projection — scan-bound, no shuffle; "
    "near-dup candidates then bucket on the signature (or on rotated "
    "bit-blocks for Hamming<=k) instead of any pairwise pass.",
)
def d04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_views(spark, sf_dir)
    hs = _spread(spark, t["documents"]).select(
        "doc_id", F.transform(_norm_tokens(), lambda tok: F.md5(tok)).alias("hs")
    )

    def bit_sum(b: int) -> F.Column:
        return F.aggregate(
            F.transform(
                F.col("hs"),
                lambda h: (
                    F.shiftright(
                        F.position(F.substring(h, 1 + b // 4, 1), F.lit("0123456789abcdef"))
                        - 1,
                        b % 4,
                    ).bitwiseAND(F.lit(1))
                    * 2
                    - 1
                ),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )

    simhash = None
    for b in range(_SIMHASH_BITS):
        term = F.when(bit_sum(b) > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        simhash = term if simhash is None else simhash + term
    return hs.select("doc_id", simhash.cast("bigint").alias("simhash")).orderBy("doc_id")


# --------------------------------------------------------------------------
_D05_THRESHOLD = 0.35
_D05_TARGET_BLOCK = 4096  # vectors per block: bounds per-task memory
_D05_MAX_BLOCKS = 256


@query(
    "d05_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS i, b.vec_id AS j,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= {_D05_THRESHOLD}
    ORDER BY i, j
    """,
    doc="Embedding-cosine near-dup pairs (threshold 0.35), EXACT blocked "
    "all-pairs — the oracle baseline that d07's LSH prefilter is "
    "measured against (the d02/d03 pairing, for vectors). Vectors hash "
    "into B = ceil(N/4096) blocks; each vector row replicates to the B "
    "block-pairs it participates in (narrow rows — one vector each, "
    "never a collected block in a single Spark row, so nothing "
    "approaches the 2 GB row limit at any N); each (pa, pb) group then "
    "computes its block-vs-block cosine matrix with vectorized numpy "
    "inside applyInArrow (zero-copy matrix build, float32 exchange; "
    "see arrowkit), where group memory is bounded by 2 blocks "
    "regardless of table size. Shuffle volume is N*B rows — inherently "
    "quadratic in N like any exact all-pairs; at 100 TB run d07 "
    "(sign-LSH candidate prefilter, same verify math) instead.",
)
def d05_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    import os

    from quacfka_spark.catalog import parquet_num_rows

    t = load_views(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    # planning-time scalar to pick B so blocks hold ~_D05_TARGET_BLOCK
    # vectors independent of N: read straight from the parquet footer
    # (zero Spark jobs); fall back to the metadata-only count job only
    # when pyarrow can't see the path. B affects block assignment, never
    # the emitted pair set.
    n = parquet_num_rows(os.path.join(sf_dir, "embeddings.parquet"))
    if n is None:
        n = e.count()
    n_blocks = min(_D05_MAX_BLOCKS, max(4, -(-n // _D05_TARGET_BLOCK)))
    ev = e.select(
        "vec_id", "embedding",
        F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).alias("b"),
    )
    # replicate each vector to every block-pair involving its block:
    # pair (b, y) normalized to (min, max) — each of the B pairs per
    # vector is distinct, so no dedup pass is needed
    pair_structs = [
        F.struct(
            F.least(F.col("b"), F.lit(y)).alias("pa"),
            F.greatest(F.col("b"), F.lit(y)).alias("pb"),
        )
        for y in range(n_blocks)
    ]
    rep = ev.select(
        "vec_id", "embedding", "b",
        F.explode(F.array(*pair_structs)).alias("p"),
    ).select("vec_id", "embedding", "b", F.col("p.pa"), F.col("p.pb"))

    def block_pair(key, tbl):
        import numpy as np

        from quacfka_spark.operators.arrowkit import (
            list_matrix, np_col, pairs_table,
        )

        # applyInArrow keys are pyarrow scalars -> unwrap to Python
        ba, bb = (x.as_py() for x in key)

        ids_all = np_col(tbl, "vec_id")
        mat_all = list_matrix(tbl, "embedding")
        # out-of-place: zero-copy matrices are read-only on f64 input
        mat_all = mat_all / np.linalg.norm(mat_all, axis=1, keepdims=True)

        if ba == bb:
            if len(ids_all) == 0:
                return pairs_table()
            ids_x = ids_y = ids_all
            cos = mat_all @ mat_all.T
            # diagonal block holds both (u,v) and (v,u): keep u<v
            cos = np.where(ids_x[:, None] < ids_x[None, :], cos, -2.0)
        else:
            blk = np_col(tbl, "b")
            xm, ym = blk == ba, blk == bb
            if not xm.any() or not ym.any():
                return pairs_table()
            ids_x, ids_y = ids_all[xm], ids_all[ym]
            cos = mat_all[xm] @ mat_all[ym].T
        ii, jj = np.nonzero(cos >= _D05_THRESHOLD)
        u, v = ids_x[ii], ids_y[jj]
        return pairs_table(np.minimum(u, v), np.maximum(u, v), cos[ii, jj])

    # Round in the outer plan with F.round (HALF_UP) — not np.round
    # (half-to-even) inside block_pair — so d05, d07, and the DuckDB
    # oracle's ROUND all share one rounding mode on boundary cosines.
    return (
        rep.groupBy("pa", "pb")
        .applyInArrow(block_pair, schema="i bigint, j bigint, cos double")
        .select("i", "j", F.round("cos", 4).alias("cos"))
        .orderBy("i", "j")
    )


# --------------------------------------------------------------------------
_D07_BANDS = 4
_D07_BITS = 4  # sign bits per band -> 16 leading dims feed the bands
_D07_CHUNK = 1024  # cosine-matrix row chunk inside a bucket verify task


def _d07_oracle(bits: int = _D07_BITS, bands: int = _D07_BANDS) -> str:
    from quacfka_spark.operators.lsh_tuning import sign_band_sql

    bands_sql = sign_band_sql(bits, bands)
    return f"""
    WITH bands AS ({bands_sql}),
    cand AS (
      SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
    v AS (
      SELECT c.i, c.j,
             list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                    CAST(y.embedding AS DOUBLE[])) AS c
      FROM cand c JOIN embeddings x ON x.vec_id = c.i
                  JOIN embeddings y ON y.vec_id = c.j)
    SELECT i, j, ROUND(c, 4) AS cos FROM v WHERE c >= {_D05_THRESHOLD}
    ORDER BY i, j
    """


@query(
    "d07_cosine_lsh_pairs",
    oracle=_d07_oracle(),
    doc="Embedding near-dup pairs with a sign-LSH candidate prefilter — "
    "the 100 TB path that d05 (exact all-pairs) is the oracle baseline "
    "for, mirroring the d02/d03 text pairing. Each vector derives 4 "
    "band signatures (4 sign bits per band, axis-aligned projections — "
    "deterministic across engines, no shared RNG); pairs colliding on "
    "ANY band are verified by exact cosine, bucket-locally: one shuffle "
    "on (band, sig) with the vector riding (N x BANDS rows total — "
    "independent of how many candidates the buckets imply), then a "
    "chunked numpy matmul per bucket inside applyInArrow, with the "
    "min-band trick replacing a DISTINCT for pairs that collide in "
    "several buckets (see _cosine_lsh_pairs). No join, no candidate-"
    "pair materialization, no all-pairs stage anywhere. Recall vs d05 "
    "is tunable via bands x bits (more bands = higher recall, more "
    "verify work); the oracle replicates the same deterministic bands, "
    "so correctness is exact-parity on the prefiltered set.",
)
def d07_cosine_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cosine_lsh_pairs(spark, sf_dir).orderBy("i", "j")


@query(
    "d07w_lsh_wideband_pairs",
    oracle=_d07_oracle(bits=6),
    doc="d07 at a NON-DEFAULT band width (6 sign bits per band -> 64 "
    "buckets/band, leading 24 dims): the oracle-checked face of the "
    "occupancy-adaptive width knob (round-8 verdict #1). Band width "
    "is what bounds benign bucket occupancy (~N/2^bits) as the corpus "
    "grows — salting alone caps at MAX_SALT and turns quadratic past "
    "~4-8M vectors at the fixed 4-bit width. Width changes the "
    "candidate set (stricter collision filter), so unlike the salt "
    "knob this key has its OWN width-matched oracle "
    "(_d07_oracle(bits=6) mirrors the same 6-bit x 4-band (6x4) "
    "deterministic band "
    "family) proving exact Spark/DuckDB parity away from the 4x4 "
    "default — i.e. the adaptive path stays oracle-checkable at "
    "whatever width the chooser lands on. Recall-vs-width is measured "
    "on the clustered probe corpus in SCALE_PROBE_BITS_*.json; "
    "auto_bits picks the width at run time (lsh_tuning."
    "choose_band_bits_measured).",
)
def d07w_lsh_wideband_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cosine_lsh_pairs(spark, sf_dir, bits=6).orderBy("i", "j")


def _d07q_oracle() -> str:
    """d07's band family with the int8-quantized verify payload
    replicated in DuckDB: same deterministic sign bands (identical
    candidate set), vectors re-quantized to round(127 * x / ||v||) as
    DOUBLE lists (integer-valued, so every dot product and partial sum
    is exact in float64 — the same exactness argument that lets the
    Spark kernel run float32 SGEMM, arrowkit.cosine_prep), cosine and
    threshold on the quantized values."""
    from quacfka_spark.operators.lsh_tuning import sign_band_sql

    bands_sql = sign_band_sql(
        _D07_BITS, _D07_BANDS, where=" WHERE embedding IS NOT NULL"
    )
    return f"""
    WITH bands AS ({bands_sql}),
    cand AS (
      SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
    nrm AS (
      SELECT vec_id,
             sqrt(list_sum([CAST(x AS DOUBLE) * x for x in embedding]))
               AS nv
      FROM embeddings WHERE embedding IS NOT NULL),
    q AS (
      -- sign*floor(abs+0.5), NOT round(): the shared tie construction
      -- of all three int8 faces (functions/vector.quantize_int8 — a
      -- library round can disagree one ulp below a .5 boundary)
      SELECT e.vec_id,
             [SIGN(CAST(x AS DOUBLE) * 127.0 /
                   (CASE WHEN n.nv > 0 THEN n.nv ELSE 1.0 END))
              * FLOOR(ABS(CAST(x AS DOUBLE) * 127.0 /
                      (CASE WHEN n.nv > 0 THEN n.nv ELSE 1.0 END))
                      + 0.5)
              for x in e.embedding] AS qe
      FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id
      WHERE e.embedding IS NOT NULL),
    v AS (
      SELECT c.i, c.j, list_cosine_similarity(x.qe, y.qe) AS c
      FROM cand c JOIN q x ON x.vec_id = c.i
                  JOIN q y ON y.vec_id = c.j)
    SELECT i, j, ROUND(c, 4) AS cos FROM v WHERE c >= {_D05_THRESHOLD}
    ORDER BY i, j
    """


@query(
    "d07q_int8_verify_pairs",
    oracle=_d07q_oracle(),
    doc="d07 with the int8-quantized verify payload (r10 verdict #2): "
    "the band exchange ships round(127 * x / ||v||) as array<tinyint> "
    "— 4x fewer payload bytes per banded replica, which is what turned "
    "the 4.5M-vector S=16 salted engagement exchange from ~115 GB of "
    "shuffle scratch (the float32 row that died on disk, "
    "SCALE_PROBE_D07_AUTO_5M.json) into a COMPLETED single-VM run: "
    "8361 s, 10.63B verified pairs, 20.3 GB measured exchange "
    "(SCALE_PROBE_D07_INT8_5M.json, r11). "
    "Band signatures still hash the ORIGINAL float32 signs, so the "
    "candidate set is identical to d07's; the verify cosine moves by "
    "O(1/127) per component, and the oracle replicates the exact same "
    "quantization in SQL — full engine-vs-oracle hash parity, not an "
    "accuracy gate. In-kernel the int8 path is FASTER than float: "
    "integer dots < 2^24 are exact in float32 SGEMM "
    "(arrowkit.cosine_prep), so halving the exchange also halves the "
    "matmul width with zero additional error.",
)
def d07q_int8_verify_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cosine_lsh_pairs(spark, sf_dir, verify_payload="int8").orderBy(
        "i", "j"
    )


# a flip farther than this from the verify threshold is NOT explainable
# by quantization error (|delta cos| <= ~2*sqrt(dim)/127 ~ 0.008 at the
# fixture dim 64; measured max flip distance 0.0073 across all three SFs)
_D07QX_BOUNDARY = 0.01


@query(
    "d07qx_int8_agreement",
    oracle=f"""
    WITH f32 AS (
      {_d07_oracle().replace("ORDER BY i, j", "")}),
    q8 AS (
      {_d07q_oracle().replace("ORDER BY i, j", "")}),
    u AS (
      SELECT i, j, cos, 1 AS in_f, 0 AS in_q FROM f32
      UNION ALL
      SELECT i, j, cos, 0 AS in_f, 1 AS in_q FROM q8),
    per AS (
      SELECT i, j, MAX(in_f) AS in_f, MAX(in_q) AS in_q,
             MAX(cos) AS cosm
      FROM u GROUP BY i, j),
    agg AS (
      SELECT CAST(COALESCE(SUM(in_f), 0) AS BIGINT) AS n_f32,
             CAST(COALESCE(SUM(in_q), 0) AS BIGINT) AS n_int8,
             CAST(COALESCE(SUM(in_f * in_q), 0) AS BIGINT) AS n_common,
             CAST(COUNT(*) AS BIGINT) AS n_union,
             CAST(COALESCE(SUM(CASE WHEN in_f + in_q = 1
                  AND cosm >= {_D05_THRESHOLD} + {_D07QX_BOUNDARY}
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS far_flips
      FROM per)
    SELECT n_f32, n_int8, n_common,
           ROUND(CAST(n_common AS DOUBLE) / NULLIF(n_union, 0), 4)
             AS agreement,
           far_flips,
           CAST(CASE WHEN far_flips = 0 THEN 1 ELSE 0 END AS INTEGER)
             AS ok
    FROM agg
    """,
    doc="Certification gate for the int8 verify payload: the float32 "
    "and int8 pair sets share one candidate set (identical bands), so "
    "every disagreement must be a verify-BOUNDARY pair — one whose "
    "surviving side's cosine sits within the quantization error "
    "(|delta| <= ~2*sqrt(dim)/127, ~0.008 at dim 64) of the 0.35 "
    "threshold. The gate is far_flips == 0: no pair in exactly one "
    "set may carry a cosine beyond threshold + 0.01 (measured max "
    "flip distance 0.0073 at all three SFs). Set agreement rides as "
    "context (0.94-0.96 on fixtures — a corpus-density property, how "
    "many true cosines crowd the threshold, NOT a quantizer property, "
    "so it is reported, not gated). Both sides are driver-hashed "
    "against their own exact oracles (d07, d07q); this key pins their "
    "RELATIONSHIP so a quantizer regression that moves cosines beyond "
    "the theory bound flips a hash even if each side stays internally "
    "consistent.",
)
def d07qx_int8_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    f32 = _cosine_lsh_pairs(spark, sf_dir).select(
        "i", "j", "cos", F.lit(1).alias("in_f"), F.lit(0).alias("in_q")
    )
    q8 = _cosine_lsh_pairs(spark, sf_dir, verify_payload="int8").select(
        "i", "j", "cos", F.lit(0).alias("in_f"), F.lit(1).alias("in_q")
    )
    per = (
        f32.unionByName(q8)
        .groupBy("i", "j")
        .agg(
            F.max("in_f").alias("in_f"),
            F.max("in_q").alias("in_q"),
            F.max("cos").alias("cosm"),
        )
    )
    far = F.when(
        (F.col("in_f") + F.col("in_q") == 1)
        & (F.col("cosm") >= F.lit(_D05_THRESHOLD + _D07QX_BOUNDARY)),
        F.lit(1),
    ).otherwise(F.lit(0))
    agg = per.agg(
        F.coalesce(F.sum("in_f"), F.lit(0)).cast("long").alias("n_f32"),
        F.coalesce(F.sum("in_q"), F.lit(0)).cast("long").alias("n_int8"),
        F.coalesce(F.sum(F.col("in_f") * F.col("in_q")), F.lit(0))
        .cast("long")
        .alias("n_common"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.coalesce(F.sum(far), F.lit(0)).cast("long").alias("far_flips"),
    )
    agreement = F.round(
        F.try_divide(
            F.col("n_common").cast("double"),
            F.nullif(F.col("n_union"), F.lit(0)).cast("double"),
        ),
        4,
    )
    ok = (
        F.when(F.col("far_flips") == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
    )
    return agg.select(
        "n_f32", "n_int8", "n_common",
        agreement.alias("agreement"), "far_flips", ok.alias("ok"),
    )


def _cosine_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    salt_buckets: int = 1,
    *,
    auto: bool = False,
    bits: int = _D07_BITS,
    bands: int = _D07_BANDS,
    auto_bits: bool = False,
    auto_bands: bool = False,
    verify_payload: str = "float32",
) -> DataFrame:
    """Unordered verified near-dup pairs (i, j, cos) — shared by d07
    (reported pairs) and d08 (keep-list clustering).

    Bucket-local verify: vectors ride the band shuffle (each vector is
    exchanged exactly BANDS times), then every (band, sig) bucket
    verifies its own pairs with one vectorized numpy matmul inside
    applyInArrow. This replaces the earlier narrow-row design (band
    self-join -> DISTINCT -> two vector join-backs -> Arrow cosine UDF)
    after profiling at sf0.1 showed candidate precision of ~0.4% at the
    0.35 threshold: the join materialized ~500k candidate pair rows, a
    455k-row DISTINCT hash-agg, and a ~0.5 GB Arrow transfer to verify
    down to ~2k surviving pairs. Here shuffle volume is N x BANDS rows
    (vector payload included) REGARDLESS of candidate count — the
    quadratic term never leaves the bucket's numpy matrices, and it is
    chunked (_D07_CHUNK rows of the cosine matrix at a time) so task
    memory stays O(bucket x chunk), not O(bucket^2).

    Pairs colliding in several buckets are deduplicated with the
    min-band trick instead of a DISTINCT: the full signature array rides
    along, and a pair is emitted only by the FIRST band on which its
    signatures agree — no second shuffle anywhere.

    Degenerate buckets (a signature shared by a large fraction of the
    corpus) are the classic LSH skew risk and the single-task ceiling:
    a bucket holding p·N vectors does (p·N)^2 cosine work in ONE task
    while every other task idles. ``salt_buckets=S`` is the production
    mitigation: each vector draws a deterministic salt (xxhash64 of its
    id mod S) and replicates to the S salt-PAIR sub-buckets it
    participates in — the d05 triangle decomposition applied inside a
    bucket. Every unordered pair lives in exactly ONE (band, sig,
    pa<=pb) sub-bucket (its two salts are fixed), so the pair set and
    the min-band dedup are IDENTICAL to the unsalted plan (engine test
    asserts set equality) while the per-task cosine work drops to
    ~(bucket/S)^2 and the S(S+1)/2 sub-tasks spread across the
    cluster. Cost: each banded row is exchanged S times instead of
    once — pay it when a corpus is known to produce dominant
    signatures (the scale probe's clustered generator is exactly such
    a corpus), keep S=1 otherwise.

    ``auto=True`` replaces the manual pick with the occupancy-driven
    chooser (operators/lsh_tuning.py): one cheap (band, sig) count agg
    sets S = ceil(max_occupancy / 17100). The target is the MEASURED
    optimum, reflecting that d07's total verify work is
    salt-invariant, so the smallest adequately-spread S wins: probes
    show S=2 tying the manual salt-4 at 250k vectors (23.4 s vs
    23.5 s) and S=4 measured-best at 1M (339.7 s, where a tighter
    target's S=14 paid 410.7 s in 14x band replication) — identical
    pair sets throughout. Hot corpora salt themselves; benign corpora
    stay on the replication-free S=1 plan. Output is identical either
    way (the engine-tested salting invariant); auto only picks WHICH
    identical-output plan runs.

    ``bits``/``bands`` parameterize the band family's width and count
    (default: the registered 4x4). Width is the occupancy knob that
    salting is NOT: with B sign bits per band even a benign corpus
    packs ~N/2^B vectors into its hottest bucket, so fixed B=4 +
    MAX_SALT=16 turns quadratic past ~4-8M vectors (round-8 verdict
    #1). ``auto_bits=True`` engages the occupancy-adaptive chooser
    (lsh_tuning.choose_band_bits_measured), SALT-FIRST: width widens
    only when the hottest bucket exceeds target * MAX_SALT — i.e.
    where salting (which is recall-free) saturates, ~4.4M benign
    vectors at the 4-bit floor — via an analytic first guess from
    the corpus count, then measured escalation only while a
    (band, sig) agg shows the hottest bucket actually splitting;
    residual hot mass is near-identical vectors (sign bits can't
    split them) and falls to the salt knob, whose measured occupancy
    is reused without a second agg. UNLIKE salt, width changes the
    CANDIDATE SET (a stricter collision filter -> recall trade,
    measured in SCALE_PROBE_BITS_*.json); every emitted pair is
    still exact-verified, so precision stays 1.0 at any width and
    the width-parameterized oracle (_d07_oracle(bits, bands)) checks
    exact parity at non-default widths (the d07w registered key).
    ``auto_bands=True`` (only meaningful with auto_bits) recovers the
    candidate recall a forced widening costs: when the chooser widens
    past the configured floor, the band count is raised to the
    analytic bands_for_recall match (1-(1-p^B)^L held at the floor
    family's level, p taken at the verify threshold — the
    conservative Charikar sign-LSH model), paying linear shuffle
    replication instead of quadratic verify; capped at dim // bits.

    Measured AT the engagement point (r10): at the true 4.5M notch,
    occupancy 288,414 > the 273,600 salt budget, measured chooser
    escalation to 5 bits, and a 1-in-32-stratum recall certification
    at the chosen width (SCALE_PROBE_D07_AUTO_5M.json: baseline
    0.4879 / unrecovered 0.3314 / 5x7-recovered 0.5072 — ABOVE the
    baseline); full three-row wall comparison at a disk-feasible
    scaled notch (SCALE_PROBE_D07_AUTO_SCALED.json: salt-capped fixed
    width 645.8 s vs auto_bits 160.4 s vs auto_bits+auto_bands
    365.3 s with MORE verified pairs than the fixed plan, 703.2M vs
    675.6M; emitted-pair ratios reproduce the stratum recall ratios
    to 3 decimals). The same artifacts record why the true-notch
    salted full row could not run on one VM with the float payload:
    the S=16 band exchange carries the embedding on every replica
    (~115 GB of shuffle scratch at 4.5M) — a per-executor disk
    provision at cluster scale, not a memory bound.

    ``verify_payload="int8"`` is the footprint answer (r10 verdict
    #2): the band exchange ships an int8 quantization of the
    NORMALIZED vector (q = round(127 * x / ||v||), array<tinyint> —
    4x fewer payload bytes per banded replica) while the band
    signatures stay sign-of-float32, so the CANDIDATE SET is
    identical to the float plan; only the verify cosine moves, by
    O(1/127) per component at the threshold boundary. The verify
    itself gets FASTER, not approximate-er, in-kernel: int8 dots are
    integers < 2^24, exact in float32 SGEMM whatever the summation
    order (arrowkit.cosine_prep), and the normalize-after matches
    DuckDB's list_cosine_similarity op for op — so the quantized key
    (d07q) hash-matches an exact DuckDB oracle replicating the same
    quantization, and d07qx gates its pair-set agreement against the
    float family. Keep float32 (default) when the 4dp cosine values
    must match d05/d07's; ship int8 when the salted exchange is the
    binding constraint. MEASURED at the true notch (r11,
    SCALE_PROBE_D07_INT8_5M.json): the 4.5M S=16 salt-capped row that
    died on float completes with int8 — 8361 s wall, 10.63B verified
    pairs, band-exchange shuffle write 20.3 GB (REST-API-measured; a
    5x+ reduction vs the >100 GB float death) — i.e. the production-
    constant engagement mechanism now has full-kernel walls at its
    own scale, not only at the T-scaled replica. The full three-row
    family completed there: auto_bits 5362 s / 7.22B pairs (the
    emitted-pair ratio 0.679 reproduces the stratum-recall
    certification to 3 decimals) and auto_bits+auto_bands 4876 s /
    11.05B pairs = 1.039x the salt-capped count (1.041 predicted —
    recall recovered ABOVE the 4-bit baseline). The recovery wall
    undercutting autobits despite 1.53x the pairs is attributed to
    host-window contention across the multi-hour runs (the artifact's
    wall_inversion note); the cross-row recall ratios are the
    window-independent statistic.
    """
    from quacfka_spark.operators.lsh_tuning import (
        D07_TARGET_ROWS,
        MAX_SALT,
        salt_for_occupancy,
        sign_band_cols,
    )

    t = load_views(spark, sf_dir)
    # NULL embeddings can never verify (oracle: list_cosine_similarity
    # with a NULL side is NULL -> WHERE false), and a null row only ever
    # pairs with itself — dropping them pre-shuffle is output-equivalent
    # and keeps the pandas matrix rectangular.
    # No cast to double: the band exchange moves parquet float32 (half
    # the bytes); the kernel widens AFTER the shuffle — bit-exact.
    e = t["embeddings"].filter(F.col("embedding").isNotNull())

    def _banded_from(frame, ship, b_: int) -> DataFrame:
        # sigs come from the ORIGINAL float32 vector (identical
        # candidate set at any payload); the shipped column keeps the
        # name "embedding" so both verify kernels and the salted
        # replication below are payload-agnostic
        return frame.select(
            "vec_id",
            ship.alias("__emb"),
            F.array(*sign_band_cols(b_, bands)).alias("sigs"),
        ).withColumnRenamed("__emb", "embedding").select(
            "vec_id", "embedding", "sigs",
            F.posexplode_outer(F.col("sigs")).alias("band", "sig"),
        )

    def _banded(b_: int) -> DataFrame:
        # CHOOSER face: always the float payload. mapInArrow is a
        # column-pruning barrier, so banding a quantized frame here
        # would make every narrow chooser agg (occupancy counts, the
        # n/dim agg) pay a full quantization pass it doesn't need
        # (r12 advisor); the quantizer applies only to the final
        # banded frame below. Chooser results are payload-invariant
        # by construction — occupancy depends only on the sigs, which
        # hash the float column under either payload.
        return _banded_from(e, F.col("embedding"), b_)

    occ = None
    if auto_bits:
        from quacfka_spark.operators.lsh_tuning import (
            bands_for_recall,
            choose_band_bits_measured,
        )

        # one narrow agg: corpus count + embedding dim (the width cap)
        n_vecs, dim = e.agg(
            F.count(F.lit(1)), F.min(F.size("embedding"))
        ).first()
        if n_vecs and dim:
            base_bits, base_bands = bits, bands
            # min_bits=bits: a caller-configured width is the FLOOR —
            # the chooser may widen past it but never narrows below
            # the occupancy bound the caller asked for.
            # max_salt mirrors the salt plan that ACTUALLY runs
            # (advisor r9): with auto salting the full MAX_SALT
            # spreading budget is real, but a manual/disabled salt
            # (auto=False) leaves hot buckets unsalted at whatever S
            # the caller fixed — the width budget must reflect that,
            # or buckets inside the phantom salt budget stay unsplit
            # AND unsalted (single-task occ^2 verify work).
            bits, occ = choose_band_bits_measured(
                _banded,
                int(n_vecs),
                dim=int(dim),
                bands=bands,
                target_rows=D07_TARGET_ROWS,
                min_bits=bits,
                max_salt=MAX_SALT if auto else max(1, int(salt_buckets)),
            )
            if auto_bands and bits > base_bits:
                # width engaged -> recover candidate recall with more
                # bands (linear shuffle cost instead of quadratic
                # verify; lsh_tuning.bands_for_recall)
                bands = bands_for_recall(
                    bits,
                    dim=int(dim),
                    threshold=_D05_THRESHOLD,
                    base_bits=base_bits,
                    base_bands=base_bands,
                )
                if bands != base_bands:
                    # the added bands hash DIFFERENT dims, so the hot
                    # bucket of the widened family can exceed what was
                    # measured over the base bands (a sign-skewed tail
                    # dim packs a near-constant band) — drop the stale
                    # measurement and let the salt chooser re-measure
                    # the family that actually runs
                    occ = None

    if verify_payload == "int8":
        # one vectorized Arrow pass appends q8 = round(127*x/||v||)
        # tinyints BEFORE banding (functions/vector.with_int8_embedding
        # — the pure-Catalyst transform re-evaluated the norm fold per
        # element and per banded replica, ~10-40x this wall; values
        # bit-identical, r12). Applied ONLY to the final banded frame,
        # after the width chooser and invisible to the salt chooser
        # below (r12 advisor: keep the choosers' cheap-narrow-agg
        # contract — occupancy is payload-invariant since sigs hash
        # the float column either way). Zero-norm vectors quantize to
        # zeros and can never verify, exactly like their float
        # NaN-cosine behavior.
        from quacfka_spark.functions.vector import with_int8_embedding

        banded = _banded_from(with_int8_embedding(e), F.col("q8"), bits)
    else:
        banded = _banded(bits)

    def bucket_verify(key, tbl):
        import numpy as np

        from quacfka_spark.operators.arrowkit import (
            cosine_block, cosine_prep, list_matrix, np_col, pairs_table,
            str_matrix,
        )

        band = key[0].as_py()  # applyInArrow keys are pyarrow scalars
        m = len(tbl)
        if m < 2:
            return pairs_table()
        ids = np_col(tbl, "vec_id")
        # dtype=None keeps the stored payload (float32 default, int8
        # quantized); cosine_prep normalizes floats up front / keeps
        # int8 for the exact-SGEMM path — see arrowkit
        mat, nrms = cosine_prep(list_matrix(tbl, "embedding", dtype=None))
        # m x BANDS of '0101' strings; band-0 buckets never consult it
        # (every band-0 collision is by definition the first), so skip
        # the bucket-sized string conversion there
        sigm = str_matrix(tbl, "sigs") if band > 0 else None
        oi, oj, oc = [], [], []
        for lo in range(0, m, _D07_CHUNK):
            hi = min(lo + _D07_CHUNK, m)
            with np.errstate(invalid="ignore"):
                cos = cosine_block(mat, nrms, mat, nrms, lo, hi)
                keep = cos >= _D05_THRESHOLD  # NaN (zero-norm) -> False
            keep &= ids[lo:hi, None] < ids[None, :]
            ii, jj = np.nonzero(keep)
            if not len(ii):
                continue
            # min-band dedup: emit only if no EARLIER band already
            # collided for this pair (argmax finds the first agreeing
            # band; equality at `band` holds by bucket construction).
            # Computed on the threshold survivors only — n_pairs x BANDS,
            # never the chunk x m x BANDS tensor.
            if band > 0:
                eq = sigm[lo + ii, :] == sigm[jj, :]
                first = eq.argmax(axis=1) == band
                ii, jj = ii[first], jj[first]
                if not len(ii):
                    continue
            oi.append(ids[lo + ii])
            oj.append(ids[jj])
            oc.append(cos[ii, jj])
        if not oi:
            return pairs_table()
        return pairs_table(
            np.concatenate(oi), np.concatenate(oj), np.concatenate(oc)
        )

    if auto:
        if occ is not None:
            # auto_bits already measured occupancy at the chosen width
            salt_buckets = salt_for_occupancy(occ, D07_TARGET_ROWS)
        else:
            from quacfka_spark.operators.lsh_tuning import choose_salt

            # float banded face, not the (possibly quantized) final
            # frame — the chooser's count agg must stay narrow (r12
            # advisor); occupancy is identical under either payload
            salt_buckets = choose_salt(_banded(bits), D07_TARGET_ROWS)

    if salt_buckets <= 1:
        return (
            banded.groupBy("band", "sig")
            .applyInArrow(bucket_verify, schema="i bigint, j bigint, cos double")
            .select("i", "j", F.round("cos", 4).alias("cos"))
        )

    # Salted plan: triangle decomposition inside each (band, sig) bucket
    # (see docstring). Deterministic salt -> every unordered pair lands
    # in exactly one (pa <= pb) sub-bucket; no cross-sub-bucket dedup
    # pass is ever needed.
    S = int(salt_buckets)
    pair_structs = [
        F.struct(
            F.least(F.col("slt"), F.lit(y)).alias("pa"),
            F.greatest(F.col("slt"), F.lit(y)).alias("pb"),
        )
        for y in range(S)
    ]
    rep = (
        banded.withColumn("slt", F.pmod(F.xxhash64("vec_id"), F.lit(S)))
        .select(
            "vec_id", "embedding", "sigs", "band", "sig", "slt",
            F.explode(F.array(*pair_structs)).alias("p"),
        )
        .select(
            "vec_id", "embedding", "sigs", "band", "sig", "slt",
            F.col("p.pa"), F.col("p.pb"),
        )
    )

    def bucket_verify_salted(key, tbl):
        import numpy as np

        from quacfka_spark.operators.arrowkit import (
            cosine_block, cosine_prep, list_matrix, np_col, pairs_table,
            str_matrix,
        )

        # applyInArrow keys are pyarrow scalars -> unwrap to Python
        band, _sig, sa, sb = (x.as_py() for x in key)

        ids_all = np_col(tbl, "vec_id")
        mat_all, nrm_all = cosine_prep(
            list_matrix(tbl, "embedding", dtype=None)
        )
        sigm_all = str_matrix(tbl, "sigs") if band > 0 else None

        def sel(mask):
            return (
                ids_all[mask],
                mat_all[mask],
                nrm_all[mask] if nrm_all is not None else None,
                sigm_all[mask] if band > 0 else None,
            )

        oi, oj, oc = [], [], []
        if sa == sb:
            # diagonal sub-bucket: the unsalted self-verify over the
            # sa-salt members (they carry exactly one (sa, sa) struct)
            if len(tbl) < 2:
                return pairs_table()
            ids, mat, nrm, sigm = ids_all, mat_all, nrm_all, sigm_all
            for lo in range(0, len(ids), _D07_CHUNK):
                hi = min(lo + _D07_CHUNK, len(ids))
                with np.errstate(invalid="ignore"):
                    cos = cosine_block(mat, nrm, mat, nrm, lo, hi)
                    keep = cos >= _D05_THRESHOLD
                keep &= ids[lo:hi, None] < ids[None, :]
                ii, jj = np.nonzero(keep)
                if band > 0 and len(ii):
                    eq = sigm[lo + ii, :] == sigm[jj, :]
                    first = eq.argmax(axis=1) == band
                    ii, jj = ii[first], jj[first]
                if len(ii):
                    oi.append(ids[lo + ii])
                    oj.append(ids[jj])
                    oc.append(cos[ii, jj])
        else:
            # off-diagonal: cross pairs between the two salt groups
            # (disjoint by construction, so no i<j mask — orient by id)
            slt = np_col(tbl, "slt")
            ids_x, mx, nx, sgx = sel(slt == sa)
            ids_y, my, ny, sgy = sel(slt == sb)
            if len(ids_x) == 0 or len(ids_y) == 0:
                return pairs_table()
            for lo in range(0, len(ids_x), _D07_CHUNK):
                hi = min(lo + _D07_CHUNK, len(ids_x))
                with np.errstate(invalid="ignore"):
                    cos = cosine_block(mx, nx, my, ny, lo, hi)
                    keep = cos >= _D05_THRESHOLD
                ii, jj = np.nonzero(keep)
                if band > 0 and len(ii):
                    eq = sgx[lo + ii, :] == sgy[jj, :]
                    first = eq.argmax(axis=1) == band
                    ii, jj = ii[first], jj[first]
                if len(ii):
                    u, v = ids_x[lo + ii], ids_y[jj]
                    oi.append(np.minimum(u, v))
                    oj.append(np.maximum(u, v))
                    oc.append(cos[ii, jj])
        if not oi:
            return pairs_table()
        return pairs_table(
            np.concatenate(oi), np.concatenate(oj), np.concatenate(oc)
        )

    return (
        rep.groupBy("band", "sig", "pa", "pb")
        .applyInArrow(
            bucket_verify_salted, schema="i bigint, j bigint, cos double"
        )
        .select("i", "j", F.round("cos", 4).alias("cos"))
    )


# public name for the composed-pipeline surface (re-exported at package
# top level); the underscore original stays for the registered keys'
# internal call sites
cosine_lsh_pairs = _cosine_lsh_pairs


# --------------------------------------------------------------------------
_D06_ORACLE = f"""
    WITH RECURSIVE
    pairs AS (SELECT i, j FROM ({_D03_ORACLE})),
    e AS (SELECT i AS a, j AS b FROM pairs
          UNION SELECT j AS a, i AS b FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM e
      UNION
      SELECT r.a, e2.b FROM reach r JOIN e e2 ON e2.a = r.b),
    lbl AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a)
    SELECT doc_id, cluster_id FROM lbl ORDER BY doc_id
    """


@query(
    "d06_dup_clusters",
    oracle=_D06_ORACLE,
    doc="Duplicate clustering: connected components over the "
    "Jaccard-verified MinHash pairs (d03), labeling every near-dup doc "
    "with the min doc_id of its component — the step that turns "
    "pairwise near-dup hits into keep-one-per-cluster decisions in a "
    "training-data pipeline. Implemented as iterative min-label "
    "propagation: per round, one equi join (edges x labels) + one "
    "min-aggregate, lineage truncated via localCheckpoint; rounds = "
    "graph diameter, and LSH components are near-cliques (diameter "
    "1-2), so it converges in 2-3 rounds. At cluster scale swap "
    "localCheckpoint for reliable checkpointing and, for adversarial "
    "long-chain graphs, the large-star/small-star contraction variant "
    "(same join-agg building blocks). The only driver-side value per "
    "round is the scalar changed-count. Oracle: transitive closure via "
    "recursive CTE over the same pair SQL.",
)
def d06_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_pairs(spark, sf_dir).select("i", "j")
    labels = label_propagate(pairs)
    return labels.select(
        F.col("v").alias("doc_id"), F.col("lbl").alias("cluster_id")
    ).orderBy("doc_id")


def label_propagate(pairs: DataFrame, max_rounds: int = 100) -> DataFrame:
    """Connected components over (i, j) pair rows as iterative min-label
    propagation — the shared core of d06 (text clusters) and d08 (vector
    keep-lists), and a public building block for composed dedup
    pipelines. Returns (v, lbl). See d06's doc for the scale notes
    (localCheckpoint lineage truncation, large-star/small-star swap for
    adversarial diameters; only a scalar changed-count ever reaches the
    driver).

    Runs to CONVERGENCE (changed == 0) — rounds track the component
    diameter, and LSH near-dup components are near-cliques (2-3 rounds).
    ``max_rounds`` is a runaway backstop, not an accuracy knob: hitting
    it raises rather than silently returning half-propagated labels (a
    20-round cap used to do exactly that on any >20-hop chain)."""
    edges = (
        pairs.select(F.col("i").alias("a"), F.col("j").alias("b"))
        .union(pairs.select(F.col("j").alias("a"), F.col("i").alias("b")))
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("lbl"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        prop = edges.join(labels, edges["a"] == labels["v"]).select(
            F.col("b").alias("v"), "lbl"
        )
        new_labels = (
            labels.union(prop).groupBy("v").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"label propagation did not converge in {max_rounds} rounds — "
        "component diameter exceeds the backstop; use the large-star/"
        "small-star contraction variant for long-chain graphs"
    )


# --------------------------------------------------------------------------
_D08_ORACLE = f"""
    WITH RECURSIVE
    pairs AS (SELECT i, j FROM ({_d07_oracle().replace("ORDER BY i, j", "")})),
    e AS (SELECT i AS a, j AS b FROM pairs
          UNION SELECT j AS a, i AS b FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM e
      UNION
      SELECT r.a, e2.b FROM reach r JOIN e e2 ON e2.a = r.b),
    lbl AS (
      SELECT a AS vec_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a)
    SELECT vec_id, cluster_id,
           (vec_id = cluster_id) AS keep
    FROM lbl ORDER BY vec_id
    """


@query(
    "d08_dedup_keep",
    oracle=_D08_ORACLE,
    doc="Keep-one-per-cluster decisions over the EMBEDDING near-dup "
    "graph — the final step of the vector dedup pipeline (d07 prefilter "
    "-> cosine verify -> cluster -> keep/drop), the same step d06 "
    "performs for the text pipeline. Clusters are connected components "
    "of the d07 pairs (shared min-label-propagation core); each vec_id "
    "gets its cluster's min id and keep = (vec_id == cluster_id) — the "
    "deterministic keep-the-smallest policy. A training-data pipeline "
    "anti-joins its corpus against the keep=false rows. Only near-dup "
    "members appear here (singletons trivially keep), so the result "
    "scales with duplicates found, not corpus size.",
)
def d08_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _cosine_lsh_pairs(spark, sf_dir).select("i", "j")
    labels = label_propagate(pairs)
    return labels.select(
        F.col("v").alias("vec_id"),
        F.col("lbl").alias("cluster_id"),
        (F.col("v") == F.col("lbl")).alias("keep"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# d09: cross-corpus repeated-chunk removal (C4-style, Raffel et al. 2020
# arXiv:1910.10683 §2.2 — "discard all but one of any three-sentence span
# occurring more than once in the data set"). The fixture text has no
# sentence boundaries, so the span unit is a fixed 3-token chunk; the
# operator shape (chunk -> global frequency -> drop frequent chunks ->
# reassemble) is identical for sentence or line units.
_D09_CHUNK = 3       # tokens per span
_D09_MAX_FREQ = 2    # spans seen >= 3 times corpus-wide are boilerplate


@query(
    "d09_chunk_freq_dedup",
    oracle=f"""
    WITH toks AS ({_ORACLE_TOKS}),
    ex AS (
      SELECT doc_id,
             unnest(range(CAST(ceil(len(tk) / {_D09_CHUNK}.0) AS BIGINT)))
               AS i, tk
      FROM toks),
    ch AS (
      SELECT doc_id, i AS chunk_id,
             array_to_string(
               tk[i * {_D09_CHUNK} + 1 : i * {_D09_CHUNK} + {_D09_CHUNK}],
               ' ') AS chunk
      FROM ex),
    f AS (
      SELECT doc_id, chunk_id, chunk,
             COUNT(*) OVER (PARTITION BY chunk) AS freq
      FROM ch),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(COUNT(*) FILTER (freq > {_D09_MAX_FREQ}) AS BIGINT)
               AS n_dropped,
             md5(array_to_string(
               list(chunk ORDER BY chunk_id) FILTER (freq <= {_D09_MAX_FREQ}),
               ' ')) AS kept_md5
      FROM f GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(a.n_chunks, 0) AS n_chunks,
           COALESCE(a.n_dropped, 0) AS n_dropped,
           COALESCE(a.kept_md5, md5('')) AS kept_md5
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="C4-style boilerplate removal: split every doc into fixed "
    "3-token spans, count each span's frequency across the WHOLE corpus, "
    "drop spans seen more than twice, reassemble the surviving text "
    "(md5 digest of it) with per-doc dropped counts.",
)
def d09_chunk_freq_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the corpus-wide span frequency is a window
    count partitioned on md5(chunk) — ONE exchange keyed on the 16-byte
    digest (never the span text; the chunk string rides along only to
    reassemble), fan-in bounded by span popularity exactly like d01's
    digest group-by. Reassembly is a second exchange on doc_id with
    map-side partial collect. No explode survives an exchange un-aggregated:
    rows shuffled are (doc_id, chunk_id, chunk, digest) — ~corpus token
    count / chunk size, the same order as the t09 chunking scan."""
    t = load_views(spark, sf_dir)
    docs = _spread(spark, t["documents"])
    toks = docs.select("doc_id", norm_tokens("text").alias("tk"))
    # guard the zero-token doc: sequence(0, ceil(0/3)-1) = sequence(0,-1)
    # yields [0,-1] in Spark (descending step) — two PHANTOM chunks —
    # while the oracle's range(0) is empty; an empty array here drops
    # the doc from posexplode so it takes the oracle's COALESCE path
    idx = F.when(
        F.size("tk") > 0,
        F.sequence(
            F.lit(0), F.ceil(F.size("tk") / F.lit(_D09_CHUNK)).cast("int") - 1
        ),
    ).otherwise(F.array().cast("array<int>"))
    chunks = toks.select(
        "doc_id", F.posexplode(idx).alias("chunk_id", "i"), "tk"
    ).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.concat_ws(
            " ", F.slice("tk", F.col("i") * _D09_CHUNK + 1, _D09_CHUNK)
        ).alias("chunk"),
    )
    from pyspark.sql.window import Window

    freq = chunks.withColumn(
        "freq", F.count("*").over(Window.partitionBy(F.md5("chunk")))
    )
    agg = freq.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.count_if(F.col("freq") > _D09_MAX_FREQ).cast("bigint").alias("n_dropped"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("freq") <= _D09_MAX_FREQ,
                                F.struct("chunk_id", "chunk"),
                            )
                        )
                    ),
                    lambda s: s.chunk,
                ),
            )
        ).alias("kept_md5"),
    )
    return (
        t["documents"]
        .select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# d10 — SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
# cluster embeddings, then near-dup prune WITHIN each cluster only.
# Multi-probe: each vector belongs to its top-_D10_PROBE trained cells
# for PAIRING (multi-probe LSH's recall trick applied to the SemDeDup
# blocking); the reported cell is the primary (nearest) one. The
# MEASURED recall/cost curve (tools/d10_curve.py, D10_RECALL_CURVE.json,
# round-7 verdict ask #5) across sf0.001/0.01/0.1:
#   probe=1: recall 0.32/0.32/0.43  (work proxy sum(cell^2) = 1x)
#   probe=2: recall 0.65/0.69/0.78  (~4x work)
#   probe=3: recall 0.85/0.90/0.92  (~9x work, still ~sum(cell^2) <<
#            all-pairs; wall time flat at fixture scale)
# probe=3 is the registered operating point: the recall jump past 0.85
# is worth ~2.2x probe-2's verify work for a DEDUP operator whose
# misses are silently-kept duplicates. d10x certifies the measured
# number each round; the knob stays a parameter for cost-bound callers.
_D10_K = 16     # coarse cells (trained, one Lloyd round; sqrt(N)-ish in prod)
_D10_PROBE = 3  # cell memberships per vector for pairing
_D10_DIM = 64   # fixture embedding dimensionality (FIXTURES.md)


def _d10_assign_cte() -> str:
    """Oracle CTE chain shared by d10 (per-vector flags) and d10x (recall
    certification): trained cells via centroid_cte_sql, the 6dp-rounded
    top-PROBE cell memberships, the primary assignment, and the
    within-any-shared-cell dup set."""
    from quacfka_spark.operators.similarity import centroid_cte_sql

    return f"""
    {centroid_cte_sql(_D10_K, _D10_DIM)},
    d10_sims AS (
      SELECT e.vec_id, e.ve, c.cid,
             COALESCE(ROUND(list_cosine_similarity(e.ve, c.ce), 6), -2.0) AS s
      FROM tc_e e, cents c),
    d10_member AS (
      SELECT vec_id, ve, cid AS cell, rn FROM (
        SELECT vec_id, ve, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM d10_sims) t WHERE rn <= {_D10_PROBE}),
    d10_prim AS (SELECT vec_id, ve, cell FROM d10_member WHERE rn = 1),
    d10_dup AS (
      SELECT DISTINCT a.vec_id
      FROM d10_member a JOIN d10_member b
        ON a.cell = b.cell AND b.vec_id < a.vec_id
      WHERE list_cosine_similarity(a.ve, b.ve) >= {_D05_THRESHOLD})
    """


@query(
    "d10_semdedup",
    oracle=f"""
    WITH {_d10_assign_cte()}
    SELECT a.vec_id, a.cell,
           CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS INTEGER)
             AS is_dup
    FROM d10_prim a LEFT JOIN d10_dup d ON d.vec_id = a.vec_id
    ORDER BY a.vec_id
    """,
    doc="SemDeDup semantic dedup over TRAINED cells with multi-probe "
    "pairing: one deterministic Lloyd round (train_centroids — seed "
    "first-K, refine to 6dp-rounded per-dimension means, the sim07 "
    "codebook recipe) produces 16 coarse cells; every embedding joins "
    "its top-3 cells for pairing (reported cell = nearest) and a vector "
    "is duplicate iff a LOWER-id vector shares ANY of its cells with "
    "cosine >= threshold — the cluster blocking bounds the quadratic "
    "term to sum(cell^2) instead of N^2, exactly the "
    "paper's trick, and the probe-3 membership buys back the "
    "cross-cell recall single-probe loses (0.85-0.92 vs 0.32-0.43, "
    "MEASURED by the d10x_semdedup_recall key; full curve in "
    "D10_RECALL_CURVE.json).",
)
def d10_semdedup(
    spark: SparkSession, sf_dir: str, probe: int = _D10_PROBE
) -> DataFrame:
    """Scale design (100 TB): trained centroids are K rows -> broadcast
    (training is one extra N-row pass); cell assignment is IN-ROW — the
    K centroids pack into ONE broadcast array row and the top-PROBE
    cells come from an in-row sort of the K similarities (the sim07
    argmin pattern: no N x K row explosion, no assignment exchange at
    all). The only shuffles are the (cell) exchange carrying N x PROBE
    membership rows and the per-vector flag merge. In production K
    grows ~sqrt(N) (SemDeDup uses 50k clusters for LAION) keeping cells
    small; the per-cell verify is chunked (_D07_CHUNK cosine-matrix
    rows at a time) so task memory is O(cell x chunk), never
    O(cell^2). NULL embeddings are dropped pre-shuffle (same rule as
    d07: they can never verify, and they'd make the per-cell matrix
    ragged).

    ``probe`` widens the multi-probe membership (the recall/cost
    knob): each vector pairs inside its top-``probe`` cells. Measured
    curve on the fixtures (tools/d10_curve.py, D10_RECALL_CURVE.json):
    probe=1 is the cheap low-recall floor (0.32-0.43), probe=2 buys
    most of the cross-cell recall back (0.65-0.78), probe=3 (the
    registered operating point, certified by d10x at >= 0.80) reaches
    0.85-0.92 at ~2.2x probe-2's verify work. The registered key uses
    _D10_PROBE because the oracle CTE pins the same constant."""
    import pandas as pd

    from quacfka_spark.operators.similarity import (
        _register_codebook,
        pack_centroids,
        top_cells,
        train_centroids,
    )

    t = load_views(spark, sf_dir)
    # conditional fan-out: the in-row top-PROBE assignment runs K
    # interpreted cosine folds per row — a single-file scan would do
    # all of them in ONE task (the t08 trap; spread skips the exchange
    # on already-parallel scans)
    e = spread_for_cpu(
        t["embeddings"].filter(F.col("embedding").isNotNull())
    )
    cents = train_centroids(e, _D10_K, dim=_D10_DIM, spread=False).persist()
    _register_codebook(f"d10:{sf_dir}", cents)
    # in-row top-PROBE cell memberships over the packed broadcast
    # centroid row (shared pack_centroids/top_cells helpers — the
    # oracle's ROW_NUMBER ORDER BY s DESC, cid, with no N x K explosion
    # and no assignment exchange)
    member = (
        e.crossJoin(F.broadcast(pack_centroids(cents)))
        .select(
            "vec_id",
            "embedding",
            top_cells("embedding", "cbs", probe).alias(
                "top"
            ),
        )
        .select(
            "vec_id",
            "embedding",
            F.col("top")[0]["cid"].alias("prim"),
            F.explode(F.transform("top", lambda s: s["cid"])).alias("cell"),
        )
    )

    def cell_dups(tbl):
        import numpy as np
        import pyarrow as pa

        from quacfka_spark.operators.arrowkit import list_matrix, np_col

        ids = np_col(tbl, "vec_id")
        m = list_matrix(tbl, "embedding")
        # zero-norm rows -> NaN cosine -> below-threshold (they can
        # never verify; same rule as d07's bucket_verify). Out-of-place:
        # the zero-copy matrix is read-only when parquet is float64.
        with np.errstate(divide="ignore", invalid="ignore"):
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
        dup = np.zeros(len(ids), dtype=bool)
        for a in range(0, len(ids), _D07_CHUNK):
            b = min(a + _D07_CHUNK, len(ids))
            with np.errstate(invalid="ignore"):
                cos = m[a:b] @ m.T
                hit = (cos >= _D05_THRESHOLD) & (
                    ids[None, :] < ids[a:b, None]
                )
            dup[a:b] = hit.any(axis=1)
        return pa.table(
            {
                "vec_id": tbl.column("vec_id"),
                "prim": tbl.column("prim"),
                "is_dup": pa.array(dup.astype("int32")),
            }
        )

    # a vector sits in PROBE cells -> PROBE flag rows; OR them and keep
    # the primary cell for reporting (prim is functionally dependent on
    # vec_id, so min == the value)
    return (
        member.groupBy("cell")
        .applyInArrow(cell_dups, schema="vec_id bigint, prim bigint, is_dup int")
        .groupBy("vec_id")
        .agg(
            F.min("prim").alias("cell"),
            F.max("is_dup").alias("is_dup"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# d10x — measured recall certification for d10's cell blocking (the d03x
# pattern: a companion agreement key whose value-hash pins the measured
# number). SemDeDup's cross-cell misses are the documented recall/cost
# knob; this key MEASURES them against d05's exact pair set instead of
# leaving the claim qualitative.
# measured (K=16, probe=3): 0.850 / 0.896 / 0.921 at sf0.001/0.01/0.1
# (full curve incl. probe=1/2 in D10_RECALL_CURVE.json) — the gate sits
# just under the weakest fixture's value
_D10X_RECALL_GATE = 0.80


@query(
    "d10x_semdedup_recall",
    oracle=f"""
    WITH {_d10_assign_cte()},
    exact_pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[]))
            >= {_D05_THRESHOLD}),
    exact_dups AS (SELECT DISTINCT j AS vec_id FROM exact_pairs),
    u AS (
      SELECT vec_id, 1 AS in_exact, 0 AS in_d10 FROM exact_dups
      UNION ALL
      SELECT vec_id, 0 AS in_exact, 1 AS in_d10 FROM d10_dup),
    per AS (
      SELECT vec_id, MAX(in_exact) AS in_exact, MAX(in_d10) AS in_d10
      FROM u GROUP BY vec_id),
    agg AS (
      SELECT CAST(COALESCE(SUM(in_exact), 0) AS BIGINT) AS n_exact,
             CAST(COALESCE(SUM(in_d10), 0) AS BIGINT) AS n_d10,
             CAST(COALESCE(SUM(in_exact * in_d10), 0) AS BIGINT) AS n_common
      FROM per)
    SELECT n_exact, n_d10, n_common,
           ROUND(CAST(n_common AS DOUBLE) / NULLIF(n_exact, 0), 4) AS recall,
           CAST(CASE WHEN n_exact = 0
                       OR n_common >= {_D10X_RECALL_GATE} * n_exact
                     THEN 1 ELSE 0 END AS INTEGER) AS ok
    FROM agg
    """,
    doc="Self-verifying recall measurement for d10's SemDeDup cell "
    "blocking (the d03x agreement pattern): the exact duplicate set is "
    "every vector with a LOWER-id exact-cosine neighbor >= threshold "
    "(d05's pair semantics, keep-lowest), d10's set is its within-cell "
    "subset by construction (precision is 1 — every within-cell hit is "
    "a genuine pair), so the one number that can degrade is recall = "
    "|d10 ∩ exact| / |exact|. Reported as counts + 4dp recall + a "
    ">= 60% gate flag; the driver's value-hash certifies the MEASURED "
    "recall, so a centroid/blocking regression that silently drops "
    "recall flips the hash even while d10 itself stays self-consistent. "
    "The recall/cost knob is K (more, smaller cells -> cheaper verify, "
    "lower recall); production SemDeDup accepts exactly this trade "
    "(arXiv:2303.09540 uses 50k cells on LAION).",
)
def d10x_semdedup_recall(
    spark: SparkSession, sf_dir: str, probe: int = _D10_PROBE
) -> DataFrame:
    """One union-with-marker aggregation (the d03x shape — each side's
    pipeline evaluates once; no intersect-plus-distinct double
    evaluation): d05's exact pairs reduce to the keep-lowest dup set,
    d10's flags filter to its dup set, and a single group-by yields the
    exact/d10/common counts. Exact all-pairs is inherently the oracle
    baseline's cost (this is a certification key, run at fixture scale;
    at 100 TB recall is spot-checked on a sampled stratum, same plan
    with a sampling filter)."""
    exact_dups = (
        d05_embedding_cosine(spark, sf_dir)
        .select(F.col("j").alias("vec_id"))
        .distinct()
        .select(
            "vec_id", F.lit(1).alias("in_exact"), F.lit(0).alias("in_d10")
        )
    )
    d10_dups = (
        d10_semdedup(spark, sf_dir, probe=probe)
        .filter(F.col("is_dup") == 1)
        .select(
            "vec_id", F.lit(0).alias("in_exact"), F.lit(1).alias("in_d10")
        )
    )
    per = (
        exact_dups.unionByName(d10_dups)
        .groupBy("vec_id")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_d10").alias("in_d10"),
        )
    )
    agg = per.agg(
        F.coalesce(F.sum("in_exact"), F.lit(0)).cast("long").alias("n_exact"),
        F.coalesce(F.sum("in_d10"), F.lit(0)).cast("long").alias("n_d10"),
        F.coalesce(F.sum(F.col("in_exact") * F.col("in_d10")), F.lit(0))
        .cast("long")
        .alias("n_common"),
    )
    recall = F.round(
        F.try_divide(
            F.col("n_common").cast("double"),
            F.nullif(F.col("n_exact"), F.lit(0)).cast("double"),
        ),
        4,
    )
    ok = (
        F.when(
            (F.col("n_exact") == 0)
            | (
                F.col("n_common")
                >= F.lit(_D10X_RECALL_GATE) * F.col("n_exact")
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    return agg.select(
        "n_exact", "n_d10", "n_common", recall.alias("recall"), ok.alias("ok")
    )


# --------------------------------------------------------------------------
# d07x — measured recall certification for d07's sign-LSH prefilter,
# completing the certification family (d03x: hash-family agreement, q30x:
# sketch accuracy, d10x: cell-blocking recall). The bands x bits trade is
# d07's documented recall knob; this key MEASURES it against d05's exact
# pair set instead of leaving the claim qualitative.
# measured: 0.4786 / 0.4945 / 0.4781 at sf0.001/0.01/0.1 — the fixture's
# 0.35 threshold is a WEAK-similarity regime for 16 axis-aligned sign
# bits (at near-dup thresholds ~0.9 sign-LSH recall is far higher); the
# gate sits just under the weakest fixture's value.
_D07X_RECALL_GATE = 0.40


@query(
    "d07x_lsh_recall",
    oracle=f"""
    WITH d07_pairs AS ({_d07_oracle().replace("ORDER BY i, j", "")}),
    exact_pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[]))
            >= {_D05_THRESHOLD}),
    u AS (
      SELECT i, j, 1 AS in_exact, 0 AS in_d07 FROM exact_pairs
      UNION ALL
      SELECT i, j, 0 AS in_exact, 1 AS in_d07 FROM d07_pairs),
    per AS (
      SELECT i, j, MAX(in_exact) AS in_exact, MAX(in_d07) AS in_d07
      FROM u GROUP BY i, j),
    agg AS (
      SELECT CAST(COALESCE(SUM(in_exact), 0) AS BIGINT) AS n_exact,
             CAST(COALESCE(SUM(in_d07), 0) AS BIGINT) AS n_d07,
             CAST(COALESCE(SUM(in_exact * in_d07), 0) AS BIGINT) AS n_common
      FROM per)
    SELECT n_exact, n_d07, n_common,
           ROUND(CAST(n_common AS DOUBLE) / NULLIF(n_exact, 0), 4) AS recall,
           CAST(CASE WHEN n_exact = 0
                       OR n_common >= {_D07X_RECALL_GATE} * n_exact
                     THEN 1 ELSE 0 END AS INTEGER) AS ok
    FROM agg
    """,
    doc="Self-verifying recall measurement for d07's sign-LSH candidate "
    "prefilter (the d10x pattern, at PAIR granularity): the exact pair "
    "set is d05's all-pairs cosine >= threshold; d07's verified pairs "
    "are its banded subset by construction (the verify stage re-scores "
    "with exact cosine, so precision is 1 and the one number that can "
    "degrade is recall = |d07 ∩ exact| / |exact|). Reported as counts "
    "+ 4dp recall + a >= 40% gate flag, all value-hashed by the driver "
    "— a band/signature regression that silently drops recall flips "
    "the hash even while d07 itself stays exact-parity on its "
    "prefiltered set. The recall/cost knob is bands x bits (more bands "
    "-> higher recall, more verify work); the measured ~0.48 reflects "
    "the fixture's deliberately weak 0.35 threshold regime.",
)
def d07x_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One union-with-marker aggregation over pair keys (each side's
    pipeline evaluates once; the d03x/d10x shape). Exact all-pairs is
    inherently the oracle baseline's cost — this is a certification
    key, run at fixture scale; at 100 TB recall is spot-checked on a
    sampled stratum (same plan behind a deterministic md5-fraction
    filter, the x02 sampler)."""
    exact = d05_embedding_cosine(spark, sf_dir).select(
        "i", "j", F.lit(1).alias("in_exact"), F.lit(0).alias("in_d07")
    )
    d07p = _cosine_lsh_pairs(spark, sf_dir).select(
        "i", "j", F.lit(0).alias("in_exact"), F.lit(1).alias("in_d07")
    )
    per = (
        exact.unionByName(d07p)
        .groupBy("i", "j")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_d07").alias("in_d07"),
        )
    )
    agg = per.agg(
        F.coalesce(F.sum("in_exact"), F.lit(0)).cast("long").alias("n_exact"),
        F.coalesce(F.sum("in_d07"), F.lit(0)).cast("long").alias("n_d07"),
        F.coalesce(F.sum(F.col("in_exact") * F.col("in_d07")), F.lit(0))
        .cast("long")
        .alias("n_common"),
    )
    recall = F.round(
        F.try_divide(
            F.col("n_common").cast("double"),
            F.nullif(F.col("n_exact"), F.lit(0)).cast("double"),
        ),
        4,
    )
    ok = (
        F.when(
            (F.col("n_exact") == 0)
            | (
                F.col("n_common")
                >= F.lit(_D07X_RECALL_GATE) * F.col("n_exact")
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    return agg.select(
        "n_exact", "n_d07", "n_common", recall.alias("recall"), ok.alias("ok")
    )


# --------------------------------------------------------------------------
# d07wx — recall certification for the RECOVERED wide family: the exact
# (bits=6, bands=10) plan auto_bands picks when the width chooser is
# forced past the floor on 64-dim embeddings (bands_for_recall's dim-
# capped Charikar match). Certified at the SAME 0.40 gate as the 4-bit
# default's d07x — i.e. the driver-checked statement that recall
# recovery restores the baseline certification level, not a weaker one.
# measured vs d05: 0.4981 / 0.4133 / 0.4503 at sf0.001/0.01/0.1
# (d07x 4-bit: 0.4786 / 0.4945 / 0.4781; UNrecovered 6x4: 0.21-0.24).
_D07WX_RECALL_GATE = 0.40
_D07WX_BITS, _D07WX_BANDS = 6, 10


@query(
    "d07wx_recovered_recall",
    oracle=f"""
    WITH rec_pairs AS (
      {_d07_oracle(_D07WX_BITS, _D07WX_BANDS).replace("ORDER BY i, j", "")}),
    exact_pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[]))
            >= {_D05_THRESHOLD}),
    u AS (
      SELECT i, j, 1 AS in_exact, 0 AS in_rec FROM exact_pairs
      UNION ALL
      SELECT i, j, 0 AS in_exact, 1 AS in_rec FROM rec_pairs),
    per AS (
      SELECT i, j, MAX(in_exact) AS in_exact, MAX(in_rec) AS in_rec
      FROM u GROUP BY i, j),
    agg AS (
      SELECT CAST(COALESCE(SUM(in_exact), 0) AS BIGINT) AS n_exact,
             CAST(COALESCE(SUM(in_rec), 0) AS BIGINT) AS n_rec,
             CAST(COALESCE(SUM(in_exact * in_rec), 0) AS BIGINT) AS n_common
      FROM per)
    SELECT n_exact, n_rec, n_common,
           ROUND(CAST(n_common AS DOUBLE) / NULLIF(n_exact, 0), 4) AS recall,
           CAST(CASE WHEN n_exact = 0
                       OR n_common >= {_D07WX_RECALL_GATE} * n_exact
                     THEN 1 ELSE 0 END AS INTEGER) AS ok
    FROM agg
    """,
    doc="Recall certification for the width-RECOVERED band family "
    "(6 bits x 10 bands — exactly what auto_bands picks when the "
    "salt-first chooser is forced past the 4-bit floor on 64-dim "
    "embeddings), measured against d05's exact pair set at the SAME "
    "0.40 gate as the 4-bit default's d07x. The driver-hashed "
    "statement that the recall-recovery knob restores the baseline "
    "certification level (measured 0.41-0.50 vs d07x's 0.48; the "
    "unrecovered 6x4 family sits at 0.21-0.24 and would FAIL this "
    "gate) — a bands_for_recall regression that silently under-"
    "recovers flips the hash. Counts + 4dp recall + gate flag, the "
    "d07x/d10x/d03r certification shape.",
)
def d07wx_recovered_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same union-with-marker single-pass shape as d07x (each side's
    pipeline evaluates once); certification key, fixture-scale by
    role — at 100 TB the same plan runs behind a deterministic
    sampled stratum."""
    exact = d05_embedding_cosine(spark, sf_dir).select(
        "i", "j", F.lit(1).alias("in_exact"), F.lit(0).alias("in_rec")
    )
    recp = _cosine_lsh_pairs(
        spark, sf_dir, bits=_D07WX_BITS, bands=_D07WX_BANDS
    ).select("i", "j", F.lit(0).alias("in_exact"), F.lit(1).alias("in_rec"))
    per = (
        exact.unionByName(recp)
        .groupBy("i", "j")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_rec").alias("in_rec"),
        )
    )
    agg = per.agg(
        F.coalesce(F.sum("in_exact"), F.lit(0)).cast("long").alias("n_exact"),
        F.coalesce(F.sum("in_rec"), F.lit(0)).cast("long").alias("n_rec"),
        F.coalesce(F.sum(F.col("in_exact") * F.col("in_rec")), F.lit(0))
        .cast("long")
        .alias("n_common"),
    )
    recall = F.round(
        F.try_divide(
            F.col("n_common").cast("double"),
            F.nullif(F.col("n_exact"), F.lit(0)).cast("double"),
        ),
        4,
    )
    ok = (
        F.when(
            (F.col("n_exact") == 0)
            | (
                F.col("n_common")
                >= F.lit(_D07WX_RECALL_GATE) * F.col("n_exact")
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    return agg.select(
        "n_exact", "n_rec", "n_common", recall.alias("recall"), ok.alias("ok")
    )


# --------------------------------------------------------------------------
# d03r — measured recall certification for d03's MinHash-LSH banding,
# the text-side sibling of d07x (vectors): banded-candidate recall
# against the EXACT shingle-join pair set at the same 0.7 Jaccard
# threshold. Theory: with r=3 rows x b=4 bands the S-curve gives
# P(candidate) = 1-(1-t^3)^4 ≈ 0.81 at exactly t=0.7 and -> 1 quickly
# above; the fixture's near-dups sit far above the knee, and measured
# recall is 1.0000 at sf0.001/0.01/0.1. Gate at 0.95.
_D03R_RECALL_GATE = 0.95


@query(
    "d03r_minhash_recall",
    oracle=f"""
    WITH toks AS ({_ORACLE_TOKS}),
    sh AS ({_ORACLE_SHINGLES}),
    ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    n AS (SELECT doc_id, len(shs) AS n FROM sh),
    common AS (
      SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    exact_pairs AS (
      SELECT c.i, c.j FROM common c
      JOIN n na ON na.doc_id = c.i JOIN n nb ON nb.doc_id = c.j
      WHERE c.c * 1.0 / (na.n + nb.n - c.c) >= 0.7),
    lsh_pairs AS (SELECT i, j FROM ({_D03_ORACLE.replace("ORDER BY i, j", "")})),
    u AS (
      SELECT i, j, 1 AS in_exact, 0 AS in_lsh FROM exact_pairs
      UNION ALL
      SELECT i, j, 0 AS in_exact, 1 AS in_lsh FROM lsh_pairs),
    per AS (
      SELECT i, j, MAX(in_exact) AS in_exact, MAX(in_lsh) AS in_lsh
      FROM u GROUP BY i, j),
    agg AS (
      SELECT CAST(COALESCE(SUM(in_exact), 0) AS BIGINT) AS n_exact,
             CAST(COALESCE(SUM(in_lsh), 0) AS BIGINT) AS n_lsh,
             CAST(COALESCE(SUM(in_exact * in_lsh), 0) AS BIGINT) AS n_common
      FROM per)
    SELECT n_exact, n_lsh, n_common,
           ROUND(CAST(n_common AS DOUBLE) / NULLIF(n_exact, 0), 4) AS recall,
           CAST(CASE WHEN n_exact = 0
                       OR n_common >= {_D03R_RECALL_GATE} * n_exact
                     THEN 1 ELSE 0 END AS INTEGER) AS ok
    FROM agg
    """,
    doc="Self-verifying recall measurement for d03's MinHash-LSH banding "
    "(the d07x pattern, text side): the exact pair set is the full "
    "shingle self-join at Jaccard >= 0.7 (d02's machinery at d03's "
    "threshold); d03's pairs are its banded subset by construction "
    "(candidates re-verify with true Jaccard, so precision is 1 and "
    "recall is the only number that can degrade). Counts + 4dp recall "
    "+ a >= 95% gate flag, value-hashed by the driver — a signature/"
    "banding regression that silently drops recall flips the hash even "
    "while d03 stays exact-parity on its banded set. Measured 1.0000 "
    "at sf0.001/0.01/0.1 (r=3 x b=4 puts the fixture's near-dups far "
    "above the S-curve knee).",
)
def d03r_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-with-marker single-pass counts (the d03x/d07x/d10x shape).
    The exact shingle self-join is inherently the oracle baseline's
    cost — certification key, fixture scale; at 100 TB recall is
    spot-checked on a sampled stratum."""
    sh = _doc_shingles(spark, sf_dir)
    ex = sh.select(
        "doc_id", F.size("shs").alias("n"), F.explode_outer("shs").alias("s")
    )
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            F.col("a.n").alias("n_i"),
            F.col("b.n").alias("n_j"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c") / (F.col("n_i") + F.col("n_j") - F.col("c"))
    exact = common.filter(jac >= 0.7).select(
        "i", "j", F.lit(1).alias("in_exact"), F.lit(0).alias("in_lsh")
    )
    lsh = minhash_pairs(spark, sf_dir).select(
        "i", "j", F.lit(0).alias("in_exact"), F.lit(1).alias("in_lsh")
    )
    per = (
        exact.unionByName(lsh)
        .groupBy("i", "j")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_lsh").alias("in_lsh"),
        )
    )
    agg = per.agg(
        F.coalesce(F.sum("in_exact"), F.lit(0)).cast("long").alias("n_exact"),
        F.coalesce(F.sum("in_lsh"), F.lit(0)).cast("long").alias("n_lsh"),
        F.coalesce(F.sum(F.col("in_exact") * F.col("in_lsh")), F.lit(0))
        .cast("long")
        .alias("n_common"),
    )
    recall = F.round(
        F.try_divide(
            F.col("n_common").cast("double"),
            F.nullif(F.col("n_exact"), F.lit(0)).cast("double"),
        ),
        4,
    )
    ok = (
        F.when(
            (F.col("n_exact") == 0)
            | (
                F.col("n_common")
                >= F.lit(_D03R_RECALL_GATE) * F.col("n_exact")
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    return agg.select(
        "n_exact", "n_lsh", "n_common", recall.alias("recall"), ok.alias("ok")
    )


# --------------------------------------------------------------------------
# d11 — content-defined chunking dedup (offset-robust exact-substring
# removal). Fixed-grid chunking (d09) misses a duplicated passage the
# moment an insertion shifts its alignment; CDC cuts where a hash of the
# trailing W-gram crosses a threshold, so boundaries move WITH the
# content and a long substring shared at ANY offset yields the same
# interior chunks in every document containing it (the backup-dedup /
# LBFS chunking idea applied to corpus text, and the practical
# distributed stand-in for Lee et al. 2021's suffix-array ExactSubstr,
# arXiv:2107.06499).
_D11_W = 8          # boundary decision window (chars)
_D11_MEAN = 24      # cut prob 1/MEAN -> mean chunk ~MEAN chars
_D11_MIN_LEN = 20   # chunks shorter than this are never deduped
#                     (ExactSubstr's min-match-length knob: common short
#                     fragments are language, not duplication)


@query(
    "d11_cdc_dedup",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text, unnest(range({_D11_W}, len(text) + 1)) AS i
      FROM documents),
    cuts AS (
      SELECT doc_id, list(i ORDER BY i) AS cs FROM pos
      WHERE CAST(concat('0x',
              substr(md5(CAST(substr(text, i - {_D11_W} + 1, {_D11_W})
                              AS VARCHAR)), 1, 4)) AS INT) / 65536.0
            < 1.0 / {_D11_MEAN}
      GROUP BY doc_id),
    b AS (
      SELECT d.doc_id, d.text,
             list_sort(list_distinct(list_concat(
               list_concat([0], COALESCE(c.cs, [])), [len(d.text)])))
               AS bounds
      FROM documents d LEFT JOIN cuts c USING (doc_id)
      WHERE len(d.text) > 0),
    ch0 AS (
      SELECT doc_id,
             list_transform(range(1, len(bounds)),
               j -> {{'cid': j, 'chunk':
                      substr(text, bounds[j] + 1, bounds[j+1] - bounds[j])}})
               AS cl
      FROM b),
    ch AS (
      SELECT doc_id, u.cid AS chunk_id, u.chunk AS chunk
      FROM ch0, unnest(cl) AS t(u)),
    r AS (
      SELECT doc_id, chunk_id, chunk,
             ROW_NUMBER() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, chunk_id) AS rn
      FROM ch),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(COUNT(*) FILTER (len(chunk) >= {_D11_MIN_LEN} AND rn > 1)
               AS BIGINT) AS n_dropped,
             md5(array_to_string(
               list(chunk ORDER BY chunk_id)
                 FILTER (len(chunk) < {_D11_MIN_LEN} OR rn = 1),
               '')) AS kept_md5
      FROM r GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(a.n_chunks, 0) AS n_chunks,
           COALESCE(a.n_dropped, 0) AS n_dropped,
           COALESCE(a.kept_md5, md5('')) AS kept_md5
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="Content-defined chunking dedup: cut each document where the "
    "md5-fraction of the trailing 8-gram falls under 1/24 (mean chunk "
    "~24 chars), so chunk boundaries are a function of CONTENT, not "
    "position — a passage duplicated at any offset chunks identically "
    "everywhere it appears. Every duplicated chunk of >= 20 chars is "
    "dropped except its corpus-wide first occurrence (doc_id, "
    "chunk_id order); short chunks are exempt (common fragments are "
    "language, not duplication). Output mirrors d09: per-doc chunk/"
    "dropped counts + md5 of the reassembled surviving text. The "
    "oracle formulates retention independently via ROW_NUMBER instead "
    "of the engine's min-struct.",
)
def d11_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): boundary detection is pure per-row codegen
    (no shuffle); the retention decision is ONE exchange keyed on the
    16-byte chunk digest with the chunk text riding only to reassembly
    (d09's documented trade), and reassembly is the same doc_id
    exchange with map-side partial collect. The md5-per-position
    boundary hash is the cross-engine-portable formulation; a
    production deployment swaps in an O(1)-per-char gear/buzhash
    rolling hash via pandas_udf with identical downstream plumbing —
    the hash only has to be deterministic, not portable. Reference
    relation: the reference has no text dedup at all (it delegates SQL
    to DuckDB, /root/reference/duck.go:49-52); d11 extends the d09
    family with the offset-robust variant."""
    from pyspark.sql.window import Window

    from quacfka_spark.functions.text import md5_frac

    t = load_views(spark, sf_dir)
    docs = _spread(spark, t["documents"]).select("doc_id", "text")
    w_lit = F.lit(_D11_W)
    pos = F.sequence(w_lit, F.length("text"))
    cuts = F.filter(
        pos,
        lambda i: md5_frac(F.substring(F.col("text"), i - w_lit + F.lit(1), w_lit))
        < (1.0 / _D11_MEAN),
    )
    bounds = F.array_distinct(
        F.concat(F.array(F.lit(0)), cuts, F.array(F.length("text")))
    )
    # bounds is EXPENSIVE (one md5 per char position): materialize it in
    # its own projection below the Generate so the chunk-slicing
    # expressions reference the computed column — inlining it into the
    # transform lambda re-evaluated the whole boundary scan once per
    # reference (measured 3-4x the cost at sf0.1)
    bdf = docs.filter(F.length("text") > 0).select(
        "doc_id", "text", bounds.alias("bounds")
    )
    ch = (
        bdf.select(
            "doc_id",
            "text",
            "bounds",
            F.posexplode(F.sequence(F.lit(0), F.size("bounds") - 2)).alias(
                "cid0", "j"
            ),
        )
        .select(
            "doc_id",
            (F.col("cid0") + 1).cast("bigint").alias("chunk_id"),  # oracle 1-based
            F.substring(
                F.col("text"),
                F.get("bounds", F.col("j")) + F.lit(1),
                F.get("bounds", F.col("j") + 1) - F.get("bounds", F.col("j")),
            ).alias("chunk"),
        )
    )
    w = Window.partitionBy(F.md5("chunk"))
    first = F.min(F.struct("doc_id", "chunk_id")).over(w)
    keep = (F.length("chunk") < _D11_MIN_LEN) | (
        F.struct("doc_id", "chunk_id") == first
    )
    flagged = ch.withColumn("keep", keep)
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.count_if(~F.col("keep")).cast("bigint").alias("n_dropped"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("chunk_id", "chunk"))
                        )
                    ),
                    lambda s: s.chunk,
                ),
            )
        ).alias("kept_md5"),
    )
    return (
        t["documents"]
        .select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# d11 production twin: gearhash CDC boundaries as an Arrow pandas_udf.
# The registered d11 key uses the md5-per-position boundary rule because
# it is expressible in BOTH engines (oracle-checkable); a 100 TB
# deployment swaps in this O(1)-per-char rolling gearhash — the chunker
# used by content-defined dedup systems (FastCDC-family) — with the
# SAME downstream plumbing (digest window -> first-occurrence keep ->
# reassembly). Only determinism matters for correctness, not
# portability, so the gear table is a fixed seeded PRNG draw.
_GEAR_SEED = 0x5EED
_GEAR_MASK = 31           # cut when (h & mask) == 0 -> mean chunk ~32 chars
_GEAR_MIN = 8             # min chunk length (suppresses degenerate cuts)


def _gear_table():
    import numpy as np

    rng = np.random.default_rng(_GEAR_SEED)
    return rng.integers(0, 2**63, size=256, dtype=np.int64).astype(object)


def gear_bounds_udf():
    """pandas_udf: text -> array<int> of CDC cut positions (the same
    [0, ..., len] bounds shape the registered d11 builds with the
    portable md5 rule). Built lazily — pandas_udf needs a live session."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def bounds(texts):
        import pandas as pd

        gear = _gear_table()
        out = []
        for s in texts:
            if s is None:
                out.append(None)
                continue
            # positions are CODE POINTS, not bytes: downstream slicing
            # uses substring() char offsets, which must match exactly
            cuts = [0]
            h = 0
            last = 0
            for i, c in enumerate(s, start=1):
                h = ((h << 1) + int(gear[ord(c) & 0xFF])) & ((1 << 63) - 1)
                if i - last >= _GEAR_MIN and (h & _GEAR_MASK) == 0:
                    cuts.append(i)
                    last = i
            if cuts[-1] != len(s):
                cuts.append(len(s))
            out.append(cuts)
        return pd.Series(out)

    return bounds


def cdc_dedup_gear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d11 with gearhash boundaries — the production chunker wired to
    the identical retention/reassembly plumbing. Engine-tested (offset
    robustness + planted-dup agreement vs the registered md5-rule d11);
    not a registered key: its boundaries are not SQL-expressible, and
    the d03p precedent already covers the 'production hash family'
    reporting pattern."""
    from pyspark.sql.window import Window

    t = load_views(spark, sf_dir)
    docs = _spread(spark, t["documents"]).select("doc_id", "text")
    bdf = docs.filter(F.length("text") > 0).select(
        "doc_id", "text", gear_bounds_udf()(F.col("text")).alias("bounds")
    )
    ch = (
        bdf.select(
            "doc_id",
            "text",
            "bounds",
            F.posexplode(F.sequence(F.lit(0), F.size("bounds") - 2)).alias(
                "cid0", "j"
            ),
        )
        .select(
            "doc_id",
            (F.col("cid0") + 1).cast("bigint").alias("chunk_id"),
            F.substring(
                F.col("text"),
                F.get("bounds", F.col("j")) + F.lit(1),
                F.get("bounds", F.col("j") + 1) - F.get("bounds", F.col("j")),
            ).alias("chunk"),
        )
    )
    w = Window.partitionBy(F.md5("chunk"))
    first = F.min(F.struct("doc_id", "chunk_id")).over(w)
    keep = (F.length("chunk") < _D11_MIN_LEN) | (
        F.struct("doc_id", "chunk_id") == first
    )
    flagged = ch.withColumn("keep", keep)
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.count_if(~F.col("keep")).cast("bigint").alias("n_dropped"),
    )
    return (
        t["documents"]
        .select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# d12: per-document n-gram NOVELTY — the incremental-ingest accounting
# twin of d09's removal: when new data lands on an existing corpus, how
# much of each doc is genuinely new text vs n-grams the corpus already
# holds? The per-doc novelty fraction drives keep/drop and mixture
# decisions in growing-corpus pipelines (and, summed, reports the
# marginal token value of a new crawl snapshot).
@query(
    "d12_ngram_novelty",
    oracle="""
    WITH toks AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                  FROM documents),
    sh AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
               THEN list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
               ELSE [] END) AS s
           FROM toks),
    firsts AS (SELECT doc_id, s,
                      MIN(doc_id) OVER (PARTITION BY md5(s)) AS first_doc
               FROM sh)
    SELECT t.doc_id,
           CAST(COALESCE(COUNT(f.s), 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(SUM(CASE WHEN f.first_doc = f.doc_id
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN f.first_doc = f.doc_id THEN 1 ELSE 0 END)
                 / COUNT(f.s), 4) AS novelty
    FROM toks t LEFT JOIN firsts f ON t.doc_id = f.doc_id
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    doc="Per-doc n-gram novelty vs corpus arrival order: the fraction "
    "of a doc's distinct 3-gram shingles whose FIRST corpus occurrence "
    "(min doc_id over the shingle) is that doc. 1.0 = all-new text, "
    "0.0 = everything already seen — the incremental-crawl value "
    "report. Sub-3-token docs carry 0 shingles and NULL novelty.",
)
def d12_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): shuffle carries (16-byte shingle digest,
    doc_id) pairs only — the doc body never moves (the d01/d09 digest
    discipline) — and first-occurrence is a min window on the digest
    key: one digest-keyed exchange + one doc_id-keyed agg exchange,
    both partial-aggregated map-side where the planner allows. Same
    O(total shingles) posture as t08's inverted index; never all-pairs.
    Reference analog: none (opaque bytes, kafka.go:151) — this is the
    accounting stage a training pipeline layers on."""
    docs = spread_for_cpu(load_views(spark, sf_dir)["documents"])
    toks = docs.select("doc_id", norm_tokens("text").alias("tk"))
    sh = toks.select(
        "doc_id",
        F.explode_outer(
            shingles(F.col("tk"), short_empty=True)
        ).alias("s"),
    ).select("doc_id", F.md5("s").alias("dg"), F.col("s").isNotNull().alias("has"))
    from pyspark.sql.window import Window as _W

    firsts = sh.withColumn(
        "first_doc",
        F.min(F.when(F.col("has"), F.col("doc_id"))).over(_W.partitionBy("dg")),
    )
    novel = F.when(F.col("has") & (F.col("first_doc") == F.col("doc_id")), 1).otherwise(
        F.lit(0)
    )
    return (
        firsts.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("has"), 1).otherwise(0)).cast("bigint").alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(novel) / F.sum(F.when(F.col("has"), 1)), 4
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# d13: cluster-quota diversity sampling — the generalization of d08's
# keep-one: inside every near-dup cluster keep the Q highest-QUALITY
# members instead of the smallest id. SemDeDup-style pruning keeps one
# representative; curation practice often wants a small quota per
# cluster (near-dups are rarely byte-identical — keeping the best 2-3
# preserves phrasing diversity while still collapsing the cluster's
# token mass). Quality is t02's heuristic; rank is (4dp quality DESC,
# doc_id) so both engines break ties identically.
_D13_QUOTA = 2


def _d13_oracle() -> str:
    from quacfka_spark.operators.text import PUNCT_CLASS, STOPWORDS

    return f"""
    WITH RECURSIVE
    pairs AS (SELECT i, j FROM ({_D03_ORACLE})),
    e AS (SELECT i AS a, j AS b FROM pairs
          UNION SELECT j AS a, i AS b FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM e
      UNION
      SELECT r.a, e2.b FROM reach r JOIN e e2 ON e2.a = r.b),
    lbl AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a),
    m AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '{PUNCT_CLASS}')) AS BIGINT) AS n_punct,
             CAST(len(regexp_extract_all(text,
                  '\\b({'|'.join(STOPWORDS)})\\b')) AS BIGINT) AS n_stop
      FROM documents),
    q AS (
      SELECT doc_id,
             ROUND(n_stop * 1.0 / n_tokens - n_punct * 1.0 / n_chars
                   + LEAST(n_tokens, 100) / 100.0, 4) AS quality
      FROM m),
    r AS (
      SELECT l.doc_id, l.cluster_id, q.quality,
             ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                ORDER BY q.quality DESC, l.doc_id) AS rnk
      FROM lbl l JOIN q ON q.doc_id = l.doc_id)
    SELECT doc_id, cluster_id, quality,
           CAST(rnk AS BIGINT) AS rnk,
           (rnk <= {_D13_QUOTA}) AS keep
    FROM r ORDER BY doc_id
    """


@query(
    "d13_cluster_quota",
    oracle=_d13_oracle(),
    doc="Cluster-quota diversity sampling: connected components over "
    "the Jaccard-verified MinHash pairs (d06's clusters), then keep "
    f"the {_D13_QUOTA} highest-quality members per cluster (t02's "
    "heuristic, 4dp, doc_id tiebreak) — the keep-the-best-Q "
    "generalization of d08's keep-the-smallest. Only near-dup members "
    "appear (singletons trivially keep).",
)
def d13_cluster_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): clusters come from the shared
    label_propagate core (one equi-join + min-agg per round, scalar-only
    driver traffic); the quality join is co-keyed on doc_id against a
    codegen-scored projection of documents (no second text scan beyond
    it), and the per-cluster quota is a WindowGroupLimit-trimmed
    row_number — rank state per task is one cluster's members, and the
    result scales with duplicates found, not corpus size."""
    from quacfka_spark.operators.text import PUNCT_CLASS, STOPWORDS

    from pyspark.sql.window import Window

    t = load_views(spark, sf_dir)
    pairs = minhash_pairs(spark, sf_dir).select("i", "j")
    labels = label_propagate(pairs).select(
        F.col("v").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )
    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"
    m = t["documents"].select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0))
        .cast("bigint")
        .alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(PUNCT_CLASS), 0))
        .cast("bigint")
        .alias("n_punct"),
        F.size(F.regexp_extract_all("text", F.lit(stop_re), 0))
        .cast("bigint")
        .alias("n_stop"),
    )
    quality = F.round(
        F.col("n_stop") * 1.0 / F.col("n_tokens")
        - F.col("n_punct") * 1.0 / F.col("n_chars")
        + F.least(F.col("n_tokens"), F.lit(100)) / 100.0,
        4,
    )
    scored = m.select("doc_id", quality.alias("quality"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        labels.join(scored, "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "quality",
            "rnk",
            (F.col("rnk") <= _D13_QUOTA).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
@query(
    "d14_fuzzy_containment",
    oracle=f"""
    WITH toks AS ({_ORACLE_TOKS}),
    sh AS ({_ORACLE_SHINGLES}),
    ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    n AS (SELECT doc_id, len(shs) AS n FROM sh),
    common AS (
      SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS c
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT c.src, c.dst, ROUND(c.c * 1.0 / na.n, 4) AS containment
    FROM common c JOIN n na ON na.doc_id = c.src
    WHERE c.c * 1.0 / na.n >= 0.9
    ORDER BY src, dst
    """,
    doc="Directed fuzzy CONTAINMENT pairs (Broder's second resemblance "
    "measure): C(src->dst) = |shingles(src) & shingles(dst)| / "
    "|shingles(src)| >= 0.9 — detects a document swallowed whole by a "
    "longer one (quotation, copypasta, version supersets), the "
    "asymmetric case d02's symmetric Jaccard provably misses: a short "
    "doc fully inside a 10x-longer one has containment 1.0 but "
    "Jaccard ~0.1. Same exact shingle self-join as d02 (both "
    "directions), normalized by the source's shingle count.",
)
def d14_fuzzy_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design (100 TB): the d02-class exact baseline by role —
    the shingle self-join fan-out is the cost ceiling, so like d02 it
    is registered + mirror-checked but not a headline query. NOTE the
    production path is NOT d03's Jaccard bands: the interesting
    containment pairs have LOW Jaccard by construction (a short doc
    inside a 10x-longer one has J ~ 0.1), so J-tuned minhash bands
    systematically miss them. The scale shape for containment is the
    INVERTED INDEX the repo already ships as t08's decontamination
    join — source-side shingles probe a corpus shingle index, partial
    counts aggregate per (src, dst), and only src docs whose hit
    count clears tau * |A| survive; t08 is exactly this primitive
    with the eval set as the src side. (The algebraic bridge
    C = J(1 + |B|/|A|)/(1 + J) holds but inherits the bands' low-J
    recall, so it certifies only the high-J corner.) Reference
    analog: none (dedup beyond the reference's SQL surface)."""
    sh = _doc_shingles(spark, sf_dir)
    ex = sh.select(
        "doc_id", F.size("shs").alias("n"), F.explode_outer("shs").alias("s")
    )
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("dst"),
            F.col("a.n").alias("n_src"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cont = F.col("c") / F.col("n_src")
    return (
        common.filter(cont >= 0.9)
        .select("src", "dst", F.round(cont, 4).alias("containment"))
        .orderBy("src", "dst")
    )
