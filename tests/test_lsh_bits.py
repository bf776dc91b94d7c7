"""Occupancy-adaptive band WIDTH for the d07/sim10 sign-LSH family —
round-8 verdict ask #1: fixed 4-bit bands let benign bucket occupancy
grow as N/16 per band, past what MAX_SALT=16 can spread (per-task
verify work turns quadratic at ~4-8M clustered vectors). The width
chooser (lsh_tuning.choose_band_bits / choose_band_bits_measured)
must (a) bound the benign model N/2^B inside the task budget, (b)
escalate ONLY while widening measurably splits the hottest bucket —
cluster mass is the salt knob's job — and (c) keep the kernels
oracle-checkable at non-default widths (the d07w/sim10w registered
keys carry width-matched oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_spark.operators import lsh_tuning
from quacfka_spark.operators.lsh_tuning import (
    choose_band_bits,
    choose_band_bits_measured,
)
from tests.conftest import SMOKE_DIR
from tests.parity import compare


def test_analytic_width_bounds_benign_model():
    """SALT-FIRST: smallest B with N / 2^B <= target * MAX_SALT
    (width engages only where salt saturates), clamped to
    [4, dim//bands]. The salt budget at the 4-bit floor is
    17,100 * 16 * 16 buckets ~= 4.4M vectors — exactly the 4-8M
    region where the fixed width's verify work turns quadratic."""
    t = lsh_tuning.D07_TARGET_ROWS
    # fixture and probe scales never widen past the registered
    # default — their occupancy is salt's job (zero recall cost)
    assert choose_band_bits(500, dim=64, bands=4, target_rows=t) == 4
    assert choose_band_bits(250_000, dim=64, bands=4, target_rows=t) == 4
    assert choose_band_bits(2_000_000, dim=64, bands=4, target_rows=t) == 4
    # the verdict's named blow-up region: width engages at ~4.4M
    assert choose_band_bits(4_000_000, dim=64, bands=4, target_rows=t) == 4
    assert choose_band_bits(8_000_000, dim=64, bands=4, target_rows=t) == 5
    # 1e9 vectors: 1e9 / 2^12 = 244k <= 273.6k budget -> 12 bits
    assert choose_band_bits(10**9, dim=64, bands=4, target_rows=t) == 12
    # narrower embeddings cap the width at dim // bands
    assert choose_band_bits(10**9, dim=32, bands=4, target_rows=t) == 8
    # empty/tiny corpora stay at the floor
    assert choose_band_bits(0, dim=64, bands=4, target_rows=t) == 4
    # with salt disabled (max_salt=1) the width must carry the whole
    # budget: 1e7 / 2^10 = 9766 <= 17100
    assert (
        choose_band_bits(10**7, dim=64, bands=4, target_rows=t, max_salt=1)
        == 10
    )


def _splitting_builder(spark, n: int):
    """Banded-frame builder behaving like a BENIGN corpus: every added
    bit halves the hottest bucket (occ = n >> bits)."""

    def build(bits: int):
        return spark.range(n).select(
            F.lit(0).alias("band"),
            (F.col("id") % (1 << bits)).cast("string").alias("sig"),
        )

    return build


def _cluster_builder(spark, occ: int):
    """Builder behaving like IRREDUCIBLE cluster mass: near-identical
    vectors agree on every sign bit, so the hot bucket never splits."""

    def build(bits: int):
        return spark.range(occ).select(
            F.lit(0).alias("band"), F.lit("1" * bits).alias("sig")
        )

    return build


def test_measured_width_lands_on_benign_corpus(spark):
    """6400 rows splitting cleanly, salt disabled (max_salt=1 makes
    the width carry the whole budget): analytic guess b=6
    (6400/64 = 100 <= target) lands in ONE measurement — no
    escalation loop."""
    bits, occ = choose_band_bits_measured(
        _splitting_builder(spark, 6400),
        6400,
        dim=64,
        bands=4,
        target_rows=100,
        max_salt=1,
    )
    assert (bits, occ) == (6, 100)


def test_measured_width_defers_to_salt_inside_budget(spark):
    """SALT-FIRST: occupancy the salt knob can spread (occ <= target
    * max_salt) must NOT trigger widening — salting is recall-free,
    a stricter collision filter is not. This is the measured 250k
    case: occ 17,376 vs target 17,100 is 1.6% over target but far
    inside the salt budget; widening there cost 25% of the true
    pairs for occupancy S=2 handles."""
    bits, occ = choose_band_bits_measured(
        _splitting_builder(spark, 16_000),  # occ 1000 at b=4
        16_000,
        dim=64,
        bands=4,
        target_rows=100,
        max_salt=16,  # budget 1600 > 1000 -> stay at the floor
    )
    assert (bits, occ) == (4, 1000)
    assert lsh_tuning.salt_for_occupancy(occ, 100) == 10


def test_measured_width_escalates_while_bits_help(spark):
    """Under-estimating analytic guess (corpus count small relative to
    real crowding) escalates by the measured occupancy's prediction.
    n=1000 -> analytic b=4, but the builder models a frame whose
    hottest bucket holds 1000 rows at b=4 and splits per bit: the
    chooser must re-measure and widen until occ <= budget."""

    def build(bits: int):
        # occupancy 16000 >> bits: 1000 at b=4, target 100 needs b=8
        n = 16_000
        return spark.range(n).select(
            F.lit(0).alias("band"),
            (F.col("id") % (1 << bits)).cast("string").alias("sig"),
        )

    bits, occ = choose_band_bits_measured(
        build, 1000, dim=64, bands=4, target_rows=100, max_salt=1
    )
    assert bits == 8
    assert occ <= 100


def test_measured_width_stops_on_cluster_mass(spark):
    """A hot bucket of sign-identical vectors does NOT split with
    width: the chooser must stop escalating (salt's job), not burn
    recall walking to the dim cap."""
    bits, occ = choose_band_bits_measured(
        _cluster_builder(spark, 1000),
        1000,
        dim=64,
        bands=4,
        target_rows=100,
        max_salt=1,
    )
    assert bits == 4  # width never helped; stay at the floor
    assert occ == 1000  # the residual handed to the salt chooser
    # and the salt rule spreads exactly that residual
    assert lsh_tuning.salt_for_occupancy(occ, 100) == 10


def test_measured_width_jump_falls_back_to_single_bit(spark):
    """Step-scaled commit criterion (advisor r9): a multi-bit jump
    must shrink occupancy below 0.75 * occ / 2^(step-1) — one bit's
    worth of relief no longer buys several bits of recall. When the
    jump under-delivers but the bucket is PARTLY splittable, the
    single-bit fallback keeps the leading bit instead of discarding
    the whole jump (the old flat 25% rule would have committed all
    4 bits here for a 51% shrink)."""
    occs = {4: 1000, 5: 490, 6: 489, 8: 488}

    def build(bits: int):
        return spark.range(occs[bits]).select(
            F.lit(0).alias("band"), F.lit("x").alias("sig")
        )

    bits, occ = choose_band_bits_measured(
        build, 1000, dim=64, bands=4, target_rows=100, max_salt=1
    )
    # jump 4->8 shrinks only to 488 (fails 3904 > 750); fallback bit
    # 5 shrinks to 490 (passes 490 <= 750); the next jump 5->8 fails
    # again (1952 > 367) and bit 6 fails the 25% bound -> stop at 5.
    assert (bits, occ) == (5, 490)


def test_salt_for_occupancy_matches_choose_salt(spark):
    """The split-out occupancy->salt rule (reused by auto_bits without
    a second agg) is the same function choose_salt applies."""
    frame = _cluster_builder(spark, 40_000)(4)
    assert lsh_tuning.choose_salt(
        frame, lsh_tuning.D07_TARGET_ROWS
    ) == lsh_tuning.salt_for_occupancy(40_000, lsh_tuning.D07_TARGET_ROWS)


# --------------------------------------------------------------------------
# width-parameterized parity + output invariants on the real fixtures


def test_d07_wideband_oracle_parity(spark, duck_smoke):
    """The 6-bit band family must match its width-matched DuckDB
    oracle exactly — parity away from the registered 4x4 default is
    what keeps the ADAPTIVE path checkable at any chooser pick."""
    from quacfka_spark.operators.dedup import _cosine_lsh_pairs, _d07_oracle

    df = _cosine_lsh_pairs(spark, SMOKE_DIR, bits=6).orderBy("i", "j")
    assert compare(df, duck_smoke.sql(_d07_oracle(bits=6))) == []


def test_sim10_wideband_oracle_parity(spark, duck_smoke):
    from quacfka_spark.operators.similarity import _sim10_oracle, knn_edges

    df = knn_edges(spark, SMOKE_DIR, bits=6).orderBy("i", "rnk")
    assert compare(df, duck_smoke.sql(_sim10_oracle(bits=6))) == []


def test_d07_auto_bits_equals_manual_pick(spark):
    """auto_bits is a plan-control decision: at fixture scale the
    chooser lands on the 4-bit floor, so the output must equal the
    manual default exactly (same invariant as the salt chooser)."""
    from quacfka_spark.operators.dedup import _cosine_lsh_pairs

    auto = {
        (r.i, r.j, r.cos)
        for r in _cosine_lsh_pairs(
            spark, SMOKE_DIR, auto=True, auto_bits=True
        ).collect()
    }
    manual = {
        (r.i, r.j, r.cos)
        for r in _cosine_lsh_pairs(spark, SMOKE_DIR).collect()
    }
    assert auto == manual


def test_sim10_auto_bits_equals_manual_pick(spark):
    from quacfka_spark.operators.similarity import knn_edges

    auto = {
        (r.i, r.j, r.rnk, r.cos)
        for r in knn_edges(
            spark, SMOKE_DIR, auto=True, auto_bits=True
        ).collect()
    }
    manual = {
        (r.i, r.j, r.rnk, r.cos) for r in knn_edges(spark, SMOKE_DIR).collect()
    }
    assert auto == manual


def test_bands_for_recall_analytic_match():
    """bands_for_recall holds the Charikar-model recall floor
    1-(1-p^B)^L at the base family's level, capped at dim // bits.
    p at the d07 verify threshold 0.35 is ~0.614."""
    from quacfka_spark.operators.lsh_tuning import (
        bands_for_recall,
        collision_p,
    )

    p = collision_p(0.35)
    assert abs(p - 0.6138) < 1e-3
    # identity at the base width
    assert bands_for_recall(4, dim=64, threshold=0.35) == 4
    # +1 bit needs 7 bands to hold the floor (6.7 analytic)
    assert bands_for_recall(5, dim=64, threshold=0.35) == 7
    # +2 bits wants 12 but the 64-dim cap binds at 10
    assert bands_for_recall(6, dim=64, threshold=0.35) == 10
    assert bands_for_recall(8, dim=64, threshold=0.35) == 8  # cap 64//8
    # production dims have headroom: 768-dim recovers fully
    assert bands_for_recall(6, dim=768, threshold=0.35) == 12
    # the analytic floor really is held wherever the cap doesn't bind
    base = 1 - (1 - p**4) ** 4
    for bits, dim in ((5, 64), (6, 768), (8, 768)):
        L = bands_for_recall(bits, dim=dim, threshold=0.35)
        assert 1 - (1 - p**bits) ** L >= base


def test_bands_for_recall_never_exceeds_dim_cap():
    """The cap must bind even when base_bands itself exceeds it —
    bands past dim // bits hash only out-of-range dims (every vector
    in one '000...' bucket per band: an N^2 single-task trap)."""
    from quacfka_spark.operators.lsh_tuning import bands_for_recall

    assert bands_for_recall(8, dim=16, threshold=0.35) == 2
    assert bands_for_recall(16, dim=32, threshold=0.35) == 2


def test_d07wx_family_is_the_auto_bands_pick():
    """d07wx certifies 'exactly what auto_bands picks at a forced
    6-bit width on 64-dim embeddings' — pin the constant to the
    chooser so a bands_for_recall change can't silently decouple
    the certified family from the adaptive path."""
    from quacfka_spark.operators.dedup import (
        _D05_THRESHOLD,
        _D07WX_BANDS,
        _D07WX_BITS,
    )
    from quacfka_spark.operators.lsh_tuning import bands_for_recall

    assert (
        bands_for_recall(_D07WX_BITS, dim=64, threshold=_D05_THRESHOLD)
        == _D07WX_BANDS
    )


def test_auto_bits_respects_caller_width_floor(spark):
    """A caller-configured bits value is the FLOOR under auto_bits:
    the chooser may widen but never narrows below it. At fixture
    scale nothing escalates, so the output must equal the manual
    6-bit plan, not the 4-bit default."""
    from quacfka_spark.operators.dedup import _cosine_lsh_pairs

    auto = {
        (r.i, r.j, r.cos)
        for r in _cosine_lsh_pairs(
            spark, SMOKE_DIR, bits=6, auto_bits=True
        ).collect()
    }
    manual6 = {
        (r.i, r.j, r.cos)
        for r in _cosine_lsh_pairs(spark, SMOKE_DIR, bits=6).collect()
    }
    manual4 = {
        (r.i, r.j, r.cos)
        for r in _cosine_lsh_pairs(spark, SMOKE_DIR).collect()
    }
    assert auto == manual6
    assert auto != manual4  # the floor actually held


def test_d07_auto_bands_noop_below_engagement(spark):
    """auto_bands only acts when auto_bits actually widens; at fixture
    scale the chooser stays at the floor, so output must equal the
    manual default exactly."""
    from quacfka_spark.operators.dedup import _cosine_lsh_pairs

    auto = {
        (r.i, r.j, r.cos)
        for r in _cosine_lsh_pairs(
            spark, SMOKE_DIR, auto=True, auto_bits=True, auto_bands=True
        ).collect()
    }
    manual = {
        (r.i, r.j, r.cos)
        for r in _cosine_lsh_pairs(spark, SMOKE_DIR).collect()
    }
    assert auto == manual


def test_d07_recovered_family_oracle_parity(spark, duck_smoke):
    """The exact family auto_bands would pick at a forced 6-bit width
    on 64-dim embeddings (10 bands, the dim cap) carries a matched
    oracle like every other (bits, bands) point."""
    from quacfka_spark.operators.dedup import _cosine_lsh_pairs, _d07_oracle
    from quacfka_spark.operators.lsh_tuning import bands_for_recall

    L = bands_for_recall(6, dim=64, threshold=0.35)
    df = _cosine_lsh_pairs(spark, SMOKE_DIR, bits=6, bands=L).orderBy(
        "i", "j"
    )
    assert compare(df, duck_smoke.sql(_d07_oracle(bits=6, bands=L))) == []


def test_d07_more_bands_oracle_parity(spark, duck_smoke):
    """The recall-recovery knob (more bands at a wider width — linear
    shuffle cost instead of quadratic verify) also carries a matched
    oracle: 8 bands x 6 bits must agree exactly."""
    from quacfka_spark.operators.dedup import _cosine_lsh_pairs, _d07_oracle

    df = _cosine_lsh_pairs(spark, SMOKE_DIR, bits=6, bands=8).orderBy(
        "i", "j"
    )
    assert compare(df, duck_smoke.sql(_d07_oracle(bits=6, bands=8))) == []


def test_more_bands_recover_recall_monotonically(spark):
    """Bands L < L' at the same width: the first L bands are a PREFIX
    of L', so every collision survives and the verified pair set is a
    strict-or-equal superset — the guaranteed direction of the
    bands-for-recall trade (width has no such guarantee: its bands
    cover different dims)."""
    from quacfka_spark.operators.dedup import _cosine_lsh_pairs

    p4 = {
        (r.i, r.j)
        for r in _cosine_lsh_pairs(spark, SMOKE_DIR, bits=6, bands=4).collect()
    }
    p8 = {
        (r.i, r.j)
        for r in _cosine_lsh_pairs(spark, SMOKE_DIR, bits=6, bands=8).collect()
    }
    assert p4 <= p8


def test_sim10wx_agreement_gate(spark, duck_smoke):
    """The top-k width certification key (r9 ask #5): edge agreement
    of the 6x4 and 6x8 graphs vs the 4-bit default, oracle-matched
    and inside both gates, with the bands knob measurably buying
    agreement back (the fixture-scale direction of the probe's
    90.7% -> 96.4%)."""
    from quacfka_spark.operators.similarity import (
        _sim10wx_oracle,
        sim10wx_wideband_agreement,
    )

    df = sim10wx_wideband_agreement(spark, SMOKE_DIR)
    assert compare(df, duck_smoke.sql(_sim10wx_oracle())) == []
    row = df.collect()[0]
    assert row.ok == 1
    assert row.agree_rec > row.agree_wide  # more bands -> more agreement


def test_wideband_pairs_are_exact_verified_subset(spark):
    """Width trades candidate RECALL, never precision: every pair the
    6-bit plan emits must appear in d05's exact all-pairs ground truth
    with the identical 4dp cosine."""
    from quacfka_spark.operators.dedup import (
        _cosine_lsh_pairs,
        d05_embedding_cosine,
    )

    wide = {
        (r.i, r.j, r.cos)
        for r in _cosine_lsh_pairs(spark, SMOKE_DIR, bits=6).collect()
    }
    exact = {
        (r.i, r.j, r.cos)
        for r in d05_embedding_cosine(spark, SMOKE_DIR).collect()
    }
    assert wide, "smoke fixture should produce at least one near-dup pair"
    assert wide <= exact
