"""xxHash64 replicated as DuckDB SQL — the d03p oracle's missing half.

The d03p key (``minhash_pairs(family="xxhash64")``) is the production
MinHash family: seeded native 64-bit hashes end to end, no hex-string
materialization, 8-byte band shuffle keys. DuckDB has no xxhash64
builtin, so through round 9 the key was rows-only (its correctness
riding on the d03x agreement gate). This module closes that gap
(round-9 verdict ask #2) by implementing XXH64 — a public,
deterministic spec (Yann Collet's xxHash, BSD-2; the same algorithm
Spark ships as ``F.xxhash64``) — twice:

- a pure-Python reference (:func:`hash_int` / :func:`hash_long` /
  :func:`hash_bytes`), fuzz-tested bit-identical against Spark's
  JVM implementation (tests/test_xxh64_sql.py), used at SQL-build
  time to fold constant seeds (Spark's ``xxhash64(lit(i), s)``
  chains ``hashInt(i, 42)`` into the string hash's seed — a per-i
  CONSTANT the SQL never needs to recompute);
- a DuckDB SQL emitter (:func:`str_hash_ctes` /
  :func:`long_chain_stages`) that renders the algorithm as a CTE
  stage chain over HUGEINT arithmetic.

Why this is expressible at all: XXH64's only loops are folds — the
32-byte stripe loop folds four lane accumulators, the tail folds
8-byte words then single bytes — and DuckDB's ``list_reduce`` over a
``list_prepend(seed, lanes)`` is exactly a seeded fold. Wrap-around
64-bit arithmetic rides HUGEINT (int128) with explicit ``% 2^64``;
the one operation that could overflow int128 — a 64x64 multiply — is
split as ``(a_lo*C + ((a_hi*C) % 2^32) * 2^32) % 2^64`` (every
multiply in XXH64 has a constant-prime operand, so only ``a`` is a
runtime value). Rotations become shift-and-or on values kept in
[0, 2^64). Sequential dependencies BETWEEN fold phases are CTE
stages (``SELECT * EXCLUDE (h), <next> AS h``), so no expression
ever nests the whole pipeline textually.

Spark semantics replicated exactly (verified by fuzz round-trip):
- UTF-8 bytes of the string, words read little-endian;
- multi-argument ``xxhash64(a, b, ...)`` folds left with seed 42,
  each argument's hash becoming the next one's seed;
- IntegerType arguments hash via hashInt (4 bytes), LongType via
  hashLong (8 bytes); NULL arguments leave the seed unchanged;
- the result is the two's-complement signed view of the 64-bit hash.

Reference analog: none — the reference delegates all hashing to
DuckDB builtins (it has no MinHash surface at all); this implements
the public xxHash spec, not any proprietary variant.
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
_2_64 = 1 << 64
_2_32 = 1 << 32


# ---------------------------------------------------------------- python ref
def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int) -> int:
    """Spark XXH64.hashInt (IntegerType argument): the 4-byte value
    path. Returns the UNSIGNED 64-bit hash (callers feeding it onward
    as a seed want the mod-2^64 view; use :func:`signed` at the edge)."""
    h = (seed + P5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _fmix(h)


def hash_long(l: int, seed: int) -> int:
    """Spark XXH64.hashLong (LongType argument): the 8-byte path."""
    h = (seed + P5 + 8) & _M
    h ^= (_rotl((l & _M) * P2 & _M, 31) * P1) & _M
    h = (_rotl(h, 27) * P1 + P4) & _M
    return _fmix(h)


def hash_bytes(b: bytes, seed: int) -> int:
    """Spark XXH64.hashUnsafeBytes (StringType argument): the full
    xxHash64 byte stream — 32-byte stripes into four lane
    accumulators, merge, then 8-byte / 4-byte / 1-byte tails and the
    avalanche. Matches the public XXH64 spec (little-endian reads)."""
    n = len(b)
    off = 0
    if n >= 32:
        v = [
            (seed + P1 + P2) & _M,
            (seed + P2) & _M,
            seed & _M,
            (seed - P1) & _M,
        ]
        while off + 32 <= n:
            for k in range(4):
                lane = int.from_bytes(
                    b[off + 8 * k : off + 8 * k + 8], "little"
                )
                v[k] = (_rotl((v[k] + lane * P2) & _M, 31) * P1) & _M
            off += 32
        h = (
            _rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)
        ) & _M
        for k in range(4):
            h ^= (_rotl((v[k] * P2) & _M, 31) * P1) & _M
            h = (h * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        k = int.from_bytes(b[off : off + 8], "little")
        h ^= (_rotl((k * P2) & _M, 31) * P1) & _M
        h = (_rotl(h, 27) * P1 + P4) & _M
        off += 8
    if off + 4 <= n:
        k = int.from_bytes(b[off : off + 4], "little")
        h ^= (k * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        off += 4
    while off < n:
        h ^= (b[off] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        off += 1
    return _fmix(h)


def signed(v: int) -> int:
    """Two's-complement signed view — what Spark's BIGINT result is."""
    return v - _2_64 if v >= (1 << 63) else v


# ---------------------------------------------------------------- sql emit
# Every emitter keeps its value in [0, 2^64) as HUGEINT; `%` on
# non-negative HUGEINTs is a true mod.


def _mod(e: str) -> str:
    return f"(({e}) % {_2_64}::HUGEINT)"


def _mulc(e: str, c: int) -> str:
    """(e * c) % 2^64 for a full-width runtime value e and CONSTANT c
    — the int128-safe split multiply (see module docstring). Callers
    must pass e as a short column/lambda reference: it is duplicated
    twice."""
    return _mod(
        f"(({e}) % {_2_32}) * {c}::HUGEINT"
        f" + ((({e}) // {_2_32}) * {c}::HUGEINT % {_2_32}) * {_2_32}"
    )


def _muln(e: str, c: int) -> str:
    """(e * c) % 2^64 when e < 2^32 (bytes, 4-byte words): the plain
    product stays far inside int128, no split needed."""
    return _mod(f"({e}) * {c}::HUGEINT")


def _rotl_sql(e: str, r: int) -> str:
    """Left-rotation via split-shift on a value in [0, 2^64):
    (low 64-r bits) << r | (high r bits). e duplicated twice."""
    lo = 1 << (64 - r)
    return f"((({e}) % {lo}) * {1 << r} + (({e}) // {lo}))"


def _round64(acc: str, lane: str) -> str:
    """One stripe round: rotl31(acc + lane*P2) * P1 (mod 2^64)."""
    return _mulc(_rotl_sql(_mod(f"({acc}) + {_mulc(lane, P2)}"), 31), P1)


def _round0(lane: str) -> str:
    """The merge/tail-word scramble: rotl31(lane*P2) * P1."""
    return _mulc(_rotl_sql(_mulc(lane, P2), 31), P1)


def _word8(hx: str, byte_off: str) -> str:
    """Little-endian 8-byte word from a hex(blob) string at the given
    0-based byte offset (an expression)."""
    parts = " || ".join(
        f"substr({hx}, 2 * (({byte_off}) + {k}) + 1, 2)"
        for k in range(7, -1, -1)
    )
    return f"('0x' || {parts})::UBIGINT::HUGEINT"


def _word4(hx: str, byte_off: str) -> str:
    parts = " || ".join(
        f"substr({hx}, 2 * (({byte_off}) + {k}) + 1, 2)"
        for k in range(3, -1, -1)
    )
    return f"('0x' || {parts})::UBIGINT::HUGEINT"


def _byte(hx: str, byte_off: str) -> str:
    return f"('0x' || substr({hx}, 2 * ({byte_off}) + 1, 2))::UBIGINT::HUGEINT"


def str_hash_ctes(
    src: str, seeds: dict[int, int], prefix: str = "xx"
) -> tuple[str, str]:
    """CTE chain hashing every string of ``src`` (a CTE/table exposing
    one VARCHAR column ``s``) with each seed in ``seeds`` (label ->
    64-bit seed). Returns (cte_sql, final_name); the final CTE exposes
    (s, i, hs) with hs the SIGNED xxhash64 — exactly Spark's
    ``xxhash64(<seed-producing args>, s)`` when the label's seed is
    the fold of those leading arguments.

    Stage layout (one fold phase per CTE, so nothing nests the whole
    pipeline into one expression): bytes -> words / tails, cross-join
    seeds, 4 stripe-lane folds (list_reduce), 4 merge rounds, length
    add, 8-byte tail fold, 4-byte round, 1-byte tail fold, 3 avalanche
    stages, signed cast."""
    p = prefix
    seed_rows = ", ".join(f"({i}, {s}::HUGEINT)" for i, s in seeds.items())
    init = {
        0: lambda s: _mod(f"{s} + {(P1 + P2) & _M}::HUGEINT"),
        1: lambda s: _mod(f"{s} + {P2}::HUGEINT"),
        2: lambda s: f"({s})",
        3: lambda s: _mod(f"{s} + {(_2_64 - P1)}::HUGEINT"),
    }
    lane_folds = ",\n      ".join(
        f"""CASE WHEN nstr > 0 THEN list_reduce(
        list_prepend({init[k]('seed')},
          list_transform(range(0, nstr), t -> words[4 * t + {k + 1}])),
        (a, x) -> {_round64('a', 'x')})
      ELSE NULL END AS v{k}"""
        for k in range(4)
    )
    merge_stages = "".join(
        f""",
    {p}m{k + 1} AS (
      SELECT * EXCLUDE (hm),
        CASE WHEN hm IS NULL THEN NULL ELSE
          {_mod(_mulc(f"xor(hm, {_round0(f'v{k}')})", P1) + f" + {P4}::HUGEINT")}
        END AS hm
      FROM {p}m{k})"""
        for k in range(4)
    )
    sql = f"""
    {p}b AS (
      SELECT s, octet_length(encode(s)) AS len, hex(encode(s)) AS hx
      FROM {src}
    ),
    {p}w AS (
      SELECT s, len, len // 32 AS nstr,
        list_transform(range(0, len // 8), j -> {_word8('hx', '8 * j')})
          AS words,
        CASE WHEN len % 8 >= 4
             THEN {_word4('hx', 'len // 8 * 8')} ELSE NULL END AS u4,
        list_transform(
          range(len // 8 * 8 + CASE WHEN len % 8 >= 4 THEN 4 ELSE 0 END,
                len),
          q -> {_byte('hx', 'q')}) AS tbytes
      FROM {p}b
    ),
    {p}s AS (
      SELECT w.*, sd.i, sd.seed
      FROM {p}w w CROSS JOIN (VALUES {seed_rows}) sd(i, seed)
    ),
    {p}v AS (
      SELECT *,
      {lane_folds}
      FROM {p}s
    ),
    {p}m0 AS (
      SELECT *, CASE WHEN nstr > 0 THEN
        {_mod(" + ".join(_rotl_sql(f"v{k}", r) for k, r in ((0, 1), (1, 7), (2, 12), (3, 18))))}
      ELSE NULL END AS hm
      FROM {p}v
    ){merge_stages},
    {p}h0 AS (
      SELECT * EXCLUDE (hm),
        {_mod(f"COALESCE(hm, {_mod(f'seed + {P5}::HUGEINT')}) + len")} AS h
      FROM {p}m4
    ),
    {p}t1 AS (
      SELECT * EXCLUDE (h), list_reduce(
        list_prepend(h,
          list_transform(range(4 * nstr, len // 8), j -> words[j + 1])),
        (a, x) -> {_mod(_mulc(_rotl_sql(f"xor(a, {_round0('x')})", 27), P1) + f" + {P4}::HUGEINT")})
        AS h
      FROM {p}h0
    ),
    {p}t2 AS (
      SELECT * EXCLUDE (h),
        CASE WHEN u4 IS NOT NULL THEN
          {_mod(_mulc(_rotl_sql(f"xor(h, {_muln('u4', P1)})", 23), P2) + f" + {P3}::HUGEINT")}
        ELSE h END AS h
      FROM {p}t1
    ),
    {p}t3 AS (
      SELECT * EXCLUDE (h), list_reduce(
        list_prepend(h, tbytes),
        (a, c) -> {_mulc(_rotl_sql(f"xor(a, {_muln('c', P5)})", 11), P1)})
        AS h
      FROM {p}t2
    ),
    {p}f1 AS (
      SELECT * EXCLUDE (h), {_mulc(f"xor(h, h // {1 << 33})", P2)} AS h
      FROM {p}t3
    ),
    {p}f2 AS (
      SELECT * EXCLUDE (h), {_mulc(f"xor(h, h // {1 << 29})", P3)} AS h
      FROM {p}f1
    ),
    {p}out AS (
      SELECT s, i,
        CAST(CASE WHEN xor(h, h // {1 << 32}) >= {1 << 63}::HUGEINT
                  THEN xor(h, h // {1 << 32}) - {_2_64}::HUGEINT
                  ELSE xor(h, h // {1 << 32}) END AS BIGINT) AS hs
      FROM {p}f2
    )"""
    return sql, f"{p}out"


def long_chain_stages(
    src: str, cols: list[str], out_col: str, prefix: str = "xl"
) -> tuple[str, str]:
    """CTE chain computing Spark's ``xxhash64(col0, col1, ...)`` over
    SIGNED BIGINT columns of ``src``: seed 42, each column folded via
    hashLong with the running hash as seed; NULL columns leave the
    seed unchanged (Spark's null semantics). Final CTE adds the
    signed ``out_col`` to the source row."""
    p = prefix
    sql = f""",
    {p}init AS (SELECT *, 42::HUGEINT AS hh FROM {src})"""
    cur = f"{p}init"
    for n, col in enumerate(cols):
        un = _mod(f"({col})::HUGEINT + {_2_64}::HUGEINT")
        scrambled = _mulc(_rotl_sql(_mulc("lu", P2), 31), P1)
        sql += f""",
    {p}{n}a AS (
      SELECT *,
        CASE WHEN {col} IS NULL THEN NULL ELSE {un} END AS lu
      FROM {cur}),
    {p}{n}b AS (
      SELECT * EXCLUDE (hh, lu),
        CASE WHEN lu IS NULL THEN hh ELSE
          {_mod(_mulc(_rotl_sql(f"xor({_mod(f'hh + {(P5 + 8) & _M}::HUGEINT')}, {scrambled})", 27), P1) + f" + {P4}::HUGEINT")}
        END AS hh0,
        lu IS NULL AS skip
      FROM {p}{n}a),
    {p}{n}c AS (
      SELECT * EXCLUDE (hh0, skip),
        CASE WHEN skip THEN hh0 ELSE
          {_mulc("xor(hh0, hh0 // " + str(1 << 33) + ")", P2)}
        END AS hh1, skip
      FROM {p}{n}b),
    {p}{n}d AS (
      SELECT * EXCLUDE (hh1, skip),
        CASE WHEN skip THEN hh1 ELSE
          {_mulc("xor(hh1, hh1 // " + str(1 << 29) + ")", P3)}
        END AS hh2, skip
      FROM {p}{n}c),
    {p}{n} AS (
      SELECT * EXCLUDE (hh2, skip),
        CASE WHEN skip THEN hh2 ELSE xor(hh2, hh2 // {1 << 32}) END AS hh
      FROM {p}{n}d)"""
        cur = f"{p}{n}"
    sql += f""",
    {p}out AS (
      SELECT * EXCLUDE (hh),
        CAST(CASE WHEN hh >= {1 << 63}::HUGEINT THEN hh - {_2_64}::HUGEINT
                  ELSE hh END AS BIGINT) AS {out_col}
      FROM {cur}
    )"""
    return sql, f"{p}out"
