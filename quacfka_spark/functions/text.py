"""Text primitives for the documents pipeline — pure Catalyst expressions.

Tokenization, word n-gram shingling, and portable md5-based hashing used
by the dedup / text-analysis operators. Everything is an expression over
``pyspark.sql.functions`` (JVM, codegen) — no Python in the hot path.

md5 (hex string) is used as the portable hash family: identical output in
Spark and DuckDB, so every signature built from it (minhash, simhash,
fingerprints) is oracle-checkable byte-for-byte. At 100 TB one would swap
in xxhash64 for speed; the operator shapes are hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = r"\S+"
NORM_TOKEN_RE = "[a-z0-9]+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens via regexp_extract_all — same semantics as the
    DuckDB oracle's ``regexp_extract_all(text, '\\S+')``."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)


def norm_tokens(text: Column | str) -> Column:
    """Normalized alnum tokens — ``regexp_extract_all(lower(text),
    '[a-z0-9]+')`` — the tokenizer every shingle-based operator (dedup,
    decontamination) shares, so punctuation/case in the corpus can never
    make the Spark shingle set diverge from the oracle's."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(text), F.lit(NORM_TOKEN_RE), 0)


def shingles(toks: Column, n: int = 3, short_empty: bool = False) -> Column:
    """Distinct word n-gram shingles: one space-joined string per window
    of ``n`` consecutive tokens. A doc shorter than ``n`` tokens yields
    its whole token string as the single shingle (the dedup-operator
    convention, so short near-identical docs still pair up) — or, with
    ``short_empty=True``, an empty array (the decontamination
    convention: a sub-n-gram doc can't share an n-gram with anything).

    Built with sequence+transform (array-valued, no explode here);
    callers explode and shuffle on the shingle only where the algorithm
    requires it.
    """

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])

    idx = F.sequence(F.lit(0), F.size(toks) - n)
    short = (
        F.array().cast("array<string>")
        if short_empty
        else F.array(F.concat_ws(" ", toks))
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(short)


def grams(toks: Column, n: int) -> Column:
    """All word n-grams IN ORDER and WITH MULTIPLICITY — unlike
    ``shingles()``, which dedups for set-similarity signatures. This is
    the primitive for repetition metrics (t11: how often does the same
    n-gram recur inside one doc) where multiplicity IS the signal.
    A doc with fewer than ``n`` tokens yields an empty array."""

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])

    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def seeded_md5(seed: int, value: Column) -> Column:
    """Family of portable hash functions indexed by an integer seed:
    ``md5(seed || '|' || value)`` — identical in Spark and DuckDB.

    ``seed`` must be a Python int: passing a Column (e.g. transform's
    index variable via the two-arg-lambda trap) would stringify the
    Column OBJECT into the literal and silently change the hash family.
    """
    if not isinstance(seed, int):
        raise TypeError(f"seed must be a Python int, got {type(seed).__name__}")
    return F.md5(F.concat(F.lit(str(seed)), F.lit("|"), value))


def hex_digit_value(ch: Column) -> Column:
    """Value 0-15 of one lowercase hex digit via position lookup —
    portable (Spark ``position`` == DuckDB ``instr`` semantics)."""
    return F.position(ch, F.lit("0123456789abcdef")) - 1


def md5_frac(col: Column | str) -> Column:
    """Deterministic uniform fraction in [0, 1): the first 4 hex chars
    of md5(value) over 65536 — the portable sampling coin shared by the
    sampling operators (x02 stratified, x08 mixture resampling). Stable
    under task retries and re-runs; bit-identical in DuckDB via
    ``md5_frac_sql``, so hash-sampled outputs oracle-check exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("int")
        / 65536.0
    )


def md5_frac_sql(expr: str) -> str:
    """DuckDB fragment computing exactly ``md5_frac`` for ``expr``."""
    return (
        f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 4)) "
        "AS INT) / 65536.0"
    )
