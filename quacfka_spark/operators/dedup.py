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
- All hashing is md5 (portable, oracle-checkable). At production scale
  swap ``xxhash64`` — same shapes, ~10x cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.functions.text import seeded_md5, shingles
from quacfka_spark.registry import query

# Normalized tokens shared by the shingle-based operators.
_NORM_TOKEN_RE = "[a-z0-9]+"

# DuckDB expression fragments for the shared oracle CTEs.
_ORACLE_TOKS = (
    "SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents"
)
_ORACLE_SHINGLES = """
    SELECT doc_id,
           CASE WHEN len(tk) >= 3
                THEN list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                    for i in generate_series(1, len(tk)-2)])
                ELSE [array_to_string(tk, ' ')] END AS shs
    FROM toks
"""


def _norm_tokens() -> F.Column:
    return F.regexp_extract_all(F.lower(F.col("text")), F.lit(_NORM_TOKEN_RE), 0)


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition to full core count before CPU-heavy per-row work.

    The fixture tables are single parquet files -> one input split; a
    shingle/hash pipeline would otherwise run on 1 of N cores. At
    cluster scale the same principle holds: a CPU-bound expression stage
    should be spread to total parallelism even when the scan has fewer
    splits (the shuffle moves KBs of text per row, the expressions burn
    orders of magnitude more CPU than that move costs).
    """
    return df.repartition(spark.sparkContext.defaultParallelism)


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


def _minhash_cols() -> list[F.Column]:
    """12 minhashes, each an array fold over the shingle array — computed
    in one projection, no explode, no shuffle."""
    return [
        F.array_min(F.transform(F.col("shs"), lambda s, i=i: seeded_md5(i, s))).alias(f"mh{i}")
        for i in range(_MINHASH_N)
    ]


# Shared by d03 (pairs) and d06 (clusters-over-pairs): the full MinHash
# chain replicated in DuckDB SQL.
_D03_ORACLE = f"""
    WITH toks AS ({_ORACLE_TOKS}),
    sh AS ({_ORACLE_SHINGLES}),
    mh AS (
      SELECT doc_id, g.i,
             list_aggregate(list_transform(shs,
                 s -> md5(CAST(g.i AS VARCHAR) || '|' || s)), 'min') AS m
      FROM sh, generate_series(0, {_MINHASH_N - 1}) g(i)),
    bands AS (
      SELECT doc_id, i // {_BAND_SIZE} AS band,
             md5(string_agg(m, '|' ORDER BY i)) AS sig
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
    doc="MinHash+LSH near-dup: 12 seeded-md5 minhashes as array folds "
    "(no shuffle), banded 3-wide into 4 LSH signatures, bucket self-join "
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
        _minhash_pairs(spark, sf_dir)
        .select("i", "j", F.round(F.col("_j"), 4).alias("jaccard"))
        .orderBy("i", "j")
    )


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-verified LSH candidate pairs (i, j, _j) — the shared core
    of d03 (reported pairs) and d06 (duplicate clusters)."""
    sh = _doc_shingles(spark, sf_dir)
    sigs = sh.select("doc_id", "shs", *_minhash_cols())
    n_bands = _MINHASH_N // _BAND_SIZE
    band_sigs = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh{b * _BAND_SIZE + k}") for k in range(_BAND_SIZE)])
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
    bands = (
        sigs.select("doc_id", "shs", F.array(*band_sigs).alias("bs"))
        .select("doc_id", "shs", F.posexplode_outer("bs").alias("band", "sig"))
    )
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
    jac = common / (F.size("shs_i") + F.size("shs_j") - common)
    return cand.select("i", "j", jac.alias("_j")).filter(F.col("_j") >= 0.7)


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
@query(
    "d05_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS i, b.vec_id AS j,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.35
    ORDER BY i, j
    """,
    doc="Embedding-cosine near-dup pairs (threshold 0.35) via BLOCKED "
    "all-pairs matrix cosine: vectors hash into B blocks, the B*(B+1)/2 "
    "block pairs fan out as tasks, and each task computes its block-vs-"
    "block cosine matrix with vectorized numpy inside mapInPandas (Arrow "
    "batches). This is the distributed exact-all-pairs pattern: work and "
    "memory per task are bounded by the block size, the shuffle carries "
    "each vector B+1 times (not N times), and surviving pairs (>= "
    "threshold) are the only rows that leave the task. At 100 TB the "
    "sign-LSH buckets (sim02) pre-filter candidates and this runs per "
    "bucket.",
)
def d05_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t = load_views(spark, sf_dir)
    n_blocks = 8
    e = t["embeddings"].select(
        "vec_id", "embedding", (F.col("vec_id") % n_blocks).alias("blk")
    )
    blocks = e.groupBy("blk").agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("rows")
    )
    pairs = (
        blocks.alias("x")
        .crossJoin(blocks.alias("y"))
        .filter(F.col("x.blk") <= F.col("y.blk"))
        .select(
            (F.col("x.blk") == F.col("y.blk")).alias("same_block"),
            F.col("x.rows").alias("rows_x"),
            F.col("y.rows").alias("rows_y"),
        )
        # one block-pair per task: without this, AQE coalesces the
        # B*(B+1)/2 pair rows onto 1-2 partitions and the matrix work
        # runs on 1-2 cores (each pair row is only ~MBs; the shuffle is
        # cheap next to the B/2-fold parallelism it buys)
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )

    def block_cosine(batches):
        import numpy as np

        for pdf in batches:
            out_i, out_j, out_c = [], [], []
            for same, rows_x, rows_y in zip(
                pdf["same_block"], pdf["rows_x"], pdf["rows_y"]
            ):
                ids_x = np.array([r["vec_id"] for r in rows_x])
                ids_y = np.array([r["vec_id"] for r in rows_y])
                mx = np.array([r["embedding"] for r in rows_x], dtype="float64")
                my = np.array([r["embedding"] for r in rows_y], dtype="float64")
                mx /= np.linalg.norm(mx, axis=1, keepdims=True)
                my /= np.linalg.norm(my, axis=1, keepdims=True)
                cos = mx @ my.T
                if same:
                    # diagonal block holds both (u,v) and (v,u): keep u<v
                    cos = np.where(ids_x[:, None] < ids_y[None, :], cos, -2.0)
                ii, jj = np.nonzero(cos >= 0.35)
                for a_, b_ in zip(ii, jj):
                    u, v = int(ids_x[a_]), int(ids_y[b_])
                    out_i.append(min(u, v))
                    out_j.append(max(u, v))
                    out_c.append(round(float(cos[a_, b_]), 4))
            yield pd.DataFrame({"i": out_i, "j": out_j, "cos": out_c})

    return (
        pairs.mapInPandas(block_cosine, schema="i bigint, j bigint, cos double")
        .orderBy("i", "j")
    )


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
    pairs = _minhash_pairs(spark, sf_dir).select("i", "j")
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
    for _ in range(20):  # diameter bound; LSH components converge in 2-3
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
            break
    edges.unpersist()
    return labels.select(
        F.col("v").alias("doc_id"), F.col("lbl").alias("cluster_id")
    ).orderBy("doc_id")
