"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

The reference has no vector ops (its SQL surface was DuckDB's, which has
``list_cosine_similarity``); our engine provides the same capability as
column expressions: a sequential left fold (``F.aggregate``) over
``zip_with`` products, computed in double. Sequential fold order matches
DuckDB's list-function iteration order, so results are bit-comparable
before rounding.

Scale note: these are expressions, not UDFs — a brute-force cosine
between a broadcast query vector and 100 TB of embeddings runs entirely
inside whole-stage codegen, no Python boundary, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, folded sequentially in double."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(a: Column | str, n_bits: int = 8) -> Column:
    """Axis-aligned random-projection LSH bucket: the sign pattern of the
    first ``n_bits`` components, as a '0'/'1' string.

    Using coordinate axes as the projection planes keeps the bucket
    deterministic across engines (no shared RNG needed) while preserving
    the LSH property: cosine-similar vectors agree on most signs. At
    scale this is the shuffle key that turns an O(n^2) all-pairs search
    into per-bucket searches.
    """
    a = F.col(a) if isinstance(a, str) else a
    bits = [
        F.when(F.element_at(a, i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)
