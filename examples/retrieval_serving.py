"""Composed retrieval SERVING stack — the query-time twin of the
curation pipeline (examples/training_data_pipeline.py):

    candidate generation  ->  hybrid fusion  ->  diversity re-rank

1. **Candidate generation** (two channels, both distributed, both
   shuffle-free over the corpus at scale):
   - lexical: BM25 top-N (`bm25_topk`, the t16 scorer — inverted
     postings shape, partial-agg top-k)
   - vector: cosine top-N vs the broadcast query embedding (the sim01
     shape — codegen fold, TakeOrderedAndProject)
2. **Hybrid fusion**: reciprocal-rank fusion over the two depth-bounded
   lists (the sim08 shape) — 1/(60+rank) on <= 2N rows, never a
   corpus-scale frame.
3. **Diversity re-rank**: MMR over the fused shortlist (the sim12
   kernel — greedy 7*rel_q - 3*max_sim_q in 1e4 fixed point, one Arrow
   kernel over a <= N-row group).

Every stage reuses the PUBLIC operator APIs; this file only wires them.
The serving contract at 100 TB: stages 2-3 cost O(shortlist^2)
regardless of corpus size, and stage 1 is the only corpus-scale work.

Run: python examples/retrieval_serving.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quacfka_spark.catalog import load_views
from quacfka_spark.functions.vector import cosine
from quacfka_spark.operators.text import bm25_topk
from quacfka_spark.plans.spread import spread_for_cpu

_RRF_K = 60
_DEPTH = 20
_FINAL_K = 5


def serve(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...],
    query_vec_id: int = 0,
    k: int = _FINAL_K,
) -> DataFrame:
    """Top-``k`` diverse results for a (terms, query-embedding) query.

    Returns (rnk, vec_id, rel, score): `rel` is the shortlist-
    normalized RRF relevance (1.0 = best fused candidate) and `score`
    the fixed-point marginal 7*rel_q - 3*max_sim_q that won rank
    ``rnk`` (scores are per-step marginals, not monotone by rank).
    """
    from pyspark.sql.window import Window

    t = load_views(spark, sf_dir)

    # --- stage 1a: lexical candidates (t16's public scorer) ---------
    lex = bm25_topk(spark, sf_dir, terms, k=_DEPTH).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("lex_rank"),
    )

    # --- stage 1b: vector candidates (the sim01 shape) --------------
    q = (
        t["embeddings"]
        .filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
    )
    vec = (
        spread_for_cpu(
            t["embeddings"]
            .filter(F.col("vec_id") != query_vec_id)
            .filter(F.col("embedding").isNotNull())
        )
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine("embedding", "qv"), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(_DEPTH)
        .select(
            "vec_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), F.asc("vec_id")))
            .alias("vec_rank"),
        )
    )

    # --- stage 2: RRF fusion over the two bounded lists -------------
    # embeddings vec_id doubles as the doc key in the fixtures (the
    # sim08 convention) — a production deployment joins its own id map
    fused = (
        lex.select(F.col("doc_id").alias("id"), "lex_rank")
        .join(vec.select(F.col("vec_id").alias("id"), "vec_rank"), "id", "full_outer")
        .select(
            "id",
            (
                F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("vec_rank")), F.lit(0.0))
            ).alias("fused"),
        )
        .orderBy(F.desc("fused"), F.asc("id"))
        .limit(_DEPTH)
    )

    # --- stage 3: MMR diversity re-rank over the fused shortlist ----
    # fixed-point greedy (the sim12 kernel recipe) with RRF as the
    # relevance signal and embedding cosine as the redundancy penalty
    short = (
        fused.join(
            t["embeddings"].select(
                F.col("vec_id").alias("id"), "embedding"
            ),
            "id",
            "left",
        )
        .filter(F.col("embedding").isNotNull())
        .select(
            F.col("id").alias("vec_id"),
            F.col("embedding").alias("emb"),
            # 1e6 quantization preserves RRF rank ties exactly; the
            # kernel re-normalizes onto the 1e4 cosine scale below so
            # the MMR penalty actually bites (raw RRF tops out ~0.03)
            F.floor(F.col("fused") * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("relq"),
        )
        .localCheckpoint()
    )

    def mmr_kernel(tbl):
        import numpy as np
        import pyarrow as pa

        from quacfka_spark.operators.arrowkit import list_matrix, np_col

        ids = np_col(tbl, "vec_id")
        relq = np_col(tbl, "relq")
        # integer min-max onto the 1e4 cosine scale (floor div keeps
        # every comparison exact): best candidate -> 10000
        relq = (relq * 10000) // max(int(relq.max()), 1)
        mat = list_matrix(tbl, "emb")
        with np.errstate(divide="ignore", invalid="ignore"):
            matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        with np.errstate(invalid="ignore"):
            simq = np.floor(
                np.nan_to_num(matn @ matn.T, nan=-2.0) * 1e4 + 0.5
            ).astype("int64")
        picked, scores = [], []
        avail = np.ones(len(ids), dtype=bool)
        for _ in range(min(k, len(ids))):
            sc = 7 * relq if not picked else 7 * relq - 3 * simq[:, picked].max(axis=1)
            sc = np.where(avail, sc, np.iinfo("int64").min)
            cand = np.nonzero(sc == sc.max())[0]
            j = cand[np.argmin(ids[cand])]
            picked.append(int(j))
            scores.append(int(sc[j]))
            avail[j] = False
        return pa.table(
            {
                "rnk": pa.array(
                    np.arange(1, len(picked) + 1, dtype="int32")
                ),
                "vec_id": pa.array(ids[picked]),
                "rel": pa.array(relq[picked] * 1.0 / 1e4),
                "score": pa.array(np.array(scores, dtype="int64")),
            }
        )

    return (
        short.groupBy(F.lit(1).alias("g"))
        .applyInArrow(
            mmr_kernel,
            schema="rnk int, vec_id bigint, rel double, score bigint",
        )
        .orderBy("rnk")
    )


def main() -> None:
    from quacfka_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("retrieval-serving")
    out = serve(spark, sf_dir, terms=("data", "model", "training"))
    out.show(truncate=False)


if __name__ == "__main__":
    main()
