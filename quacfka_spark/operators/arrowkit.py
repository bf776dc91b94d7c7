"""Arrow-native group-map kernels shared by the cosine-verify family.

The bucket/cell/block verify operators (d05, d07, d10, sim10) all
reduce to "turn a grouped list<float> column into a dense numpy
matrix, matmul, emit narrow pair rows". `applyInPandas` paid a real
conversion tax on that path: Arrow -> pandas materializes one small
numpy object per row, and `np.array(pdf[col].tolist())` re-stacks
them; measured at probe scale (100k vectors, 400k banded rows) the
sim10 local stage dropped 39.6s -> 21.6s when rewritten on
`applyInArrow` with the flatten->reshape below (identical output).

Two wins compose:
  1. zero-copy matrix build — a fixed-width list<float> column's
     values buffer IS the row-major matrix; `flatten()` honors list
     offsets, `reshape` needs no copy, and only the float32->float64
     widening (exact) allocates.
  2. float32 exchange — the callers stopped pre-casting to
     array<double> before the group shuffle, halving exchange bytes;
     widening after the shuffle is bit-exact, so every emitted cosine
     is identical to the former double-shuffle plan (mirrors stay
     hash-green against the DuckDB oracles).

At 100 TB posture (2) is the headline: the band/cell exchanges are
these operators' dominant network cost and now move half the bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def np_col(tbl: "pa.Table", name: str) -> np.ndarray:
    """Scalar column -> 1-D numpy array (zero-copy for numerics)."""
    return np.asarray(tbl.column(name).combine_chunks())


def list_matrix(tbl: "pa.Table", name: str, dtype="float64") -> np.ndarray:
    """Fixed-width list<numeric> column -> 2-D numpy matrix.

    `flatten()` is offset-aware (safe on sliced batches); reshape is
    valid because callers guarantee rectangular input (NULL embeddings
    are filtered pre-shuffle by every caller — the d07/d10 rule).

    When the stored dtype already equals `dtype` the result is a
    READ-ONLY zero-copy view of the Arrow buffer — callers must
    normalize out-of-place (`m = m / norm`), never in-place.
    """
    arr = tbl.column(name).combine_chunks()
    flat = np.asarray(arr.flatten())
    mat = flat.reshape(len(arr), -1)
    return mat.astype(dtype, copy=False) if dtype else mat


def str_matrix(tbl: "pa.Table", name: str) -> np.ndarray:
    """list<string> column -> 2-D object matrix (for band-sig rows).

    Strings can't be zero-copied into numpy; this stays cheap because
    callers only carry BANDS short signatures per row and consult the
    matrix for threshold survivors, never the full cosine tensor.
    """
    arr = tbl.column(name).combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), -1)


_PAIRS_SCHEMA = pa.schema(
    [("i", pa.int64()), ("j", pa.int64()), ("cos", pa.float64())]
)


def pairs_table(i=None, j=None, cos=None) -> "pa.Table":
    """(i, j, cos) numpy triple -> Arrow table; no args -> empty."""
    if i is None or len(i) == 0:
        return _PAIRS_SCHEMA.empty_table()
    return pa.table(
        {
            "i": pa.array(np.ascontiguousarray(i, dtype="int64")),
            "j": pa.array(np.ascontiguousarray(j, dtype="int64")),
            "cos": pa.array(np.ascontiguousarray(cos, dtype="float64")),
        }
    )


def cosine_prep(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray | None]:
    """Prepare a (possibly int8-quantized) embedding matrix for chunked
    cosine blocks. Two regimes:

    - float input (the default float32 exchange): returns the row-
      normalized FLOAT64 matrix and ``None`` — callers matmul normalized
      rows directly, the historical arithmetic, so every existing
      oracle-hashed cosine is unchanged.
    - int8 input (the quantized verify payload, d07q): returns the raw
      ints as FLOAT32 plus float64 row norms — callers compute
      ``(M[lo:hi] @ M.T).astype(f64) / outer(norms)``. This is
      BIT-IDENTICAL to running the whole thing in float64: every int8
      dot product and partial sum is an integer bounded by
      dim * 127^2 (~1M at dim 64, far under 2^24), exactly
      representable in float32 whatever the SGEMM summation order, and
      the float64 normalize-after matches DuckDB's
      list_cosine_similarity formula (dot / (norm_a * norm_b)) op for
      op — which is what makes the quantized key exact-oracle-checkable
      while the matmul runs on the ~2x faster SGEMM path.

      The float32-SGEMM shortcut's precondition is ENFORCED, not just
      documented (r11 advisor): it requires dim * 127^2 < 2^24, i.e.
      dim <= 1040 — fine for the dim-64 fixtures but NOT for production
      embedding dims (1536, 3072), where float32 partial sums would
      round and silently break the bit-exact oracle parity. Past the
      bound the ints are widened to float64 instead: int64 dots are
      still integers far below 2^53, so the DGEMM path stays exact at
      every realistic dim (< ~5.6e8), only ~2x slower — exactness is
      never traded for the speed win.
    """
    if mat.dtype == np.int8:
        norms = np.sqrt((mat.astype(np.float64) ** 2).sum(axis=1))
        if mat.shape[1] * 127**2 < 2**24:
            return mat.astype(np.float32), norms
        return mat.astype(np.float64), norms
    m = mat.astype(np.float64, copy=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return m, None


def cosine_block(
    ma: np.ndarray,
    na: np.ndarray | None,
    mb: np.ndarray,
    nb: np.ndarray | None,
    lo: int,
    hi: int,
) -> np.ndarray:
    """Cosine of ``ma[lo:hi]`` against all of ``mb``, for matrices
    prepared by :func:`cosine_prep` (na/nb are the paired norms —
    ``None`` means pre-normalized float rows). Zero-norm rows yield
    NaN (suppressed), which every caller's threshold mask drops."""
    with np.errstate(invalid="ignore", divide="ignore"):
        if na is None:
            return ma[lo:hi] @ mb.T
        dot = (ma[lo:hi] @ mb.T).astype(np.float64)
        return dot / (na[lo:hi, None] * nb[None, :])
