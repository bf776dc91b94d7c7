"""Session-config drift screen: results must not depend on AQE or the
shuffle-partition count.

The driver verifies with its own plain session; its defaults (or a
user's cluster conf) can differ from this repo's tuned session. Every
result here is semantically partition-count-independent by construction
— deterministic hashes, explicit orderings, exact aggregates — and this
suite pins that: a representative shuffle-heavy slice of the query
surface must hash-match its oracle with AQE disabled and an awkward
prime shuffle-partition count.
"""

from __future__ import annotations

import pytest

from quacfka_spark.registry import QUERIES, get_queries

import tests.conftest as cf
from tests.parity import compare

get_queries()

DRIFT_KEYS = (
    "q07_inner_join",
    "q11_multiway_join",
    "q13_window_rank",
    "d03_minhash_lsh",
    "d07_cosine_lsh_pairs",
    "t08_decontaminate",
    "x01_asof_join",
    "x06_bucketed_join_agg",
    "q43_skew_safe_agg",
    "d06_dup_clusters",
    "x08_mix_resample",
    "t14_lm_perplexity",
    "d10_semdedup",
    "q45_grouping_sets",
    "t15_url_canonical_dedup",
    "q46_stats_profile",
    "q47_median_mode",
    "t16_bm25_topk",
    "t17_dsir_resample",
    "sim08_rrf_hybrid",
    "x10_compact_scan",
    "q48_fuzzy_match",
)


@pytest.fixture(scope="module")
def weird_session(spark):
    """Shared session with AQE off and a prime shuffle-partition count;
    restores the originals afterwards (both are runtime SQL confs)."""
    saved = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


@pytest.mark.parametrize("name", DRIFT_KEYS)
def test_aqe_off_odd_partitions_parity(weird_session, duck_smoke, name):
    q = QUERIES[name]
    problems = compare(q.fn(weird_session, cf.SMOKE_DIR), duck_smoke.sql(q.oracle))
    assert not problems, f"{name} (AQE off, 7 shuffle partitions): " + "; ".join(problems)
