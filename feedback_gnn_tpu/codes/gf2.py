"""GF(2) linear algebra (host-side, NumPy).

Re-implements the semantics of the reference's GF(2) helpers
(/root/reference/sionna/fec/utils.py:1022-1233: ``row_echelon``, ``rank``,
``kernel``, ``row_basis``, ``compute_code_distance``, ``inverse``) with
vectorised NumPy elimination (the reference eliminates row-by-row in Python,
which is minutes-slow for the 882/1270-qubit codes; here each pivot step is a
single masked XOR over all rows).

These run once at code-construction time on the host; nothing here touches
the device.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "row_echelon",
    "rank",
    "kernel",
    "row_basis",
    "compute_code_distance",
    "inverse",
    "int2bin",
]


def row_echelon(mat: np.ndarray, reduced: bool = False, use_native: bool = True):
    """Gaussian elimination over GF(2); rank-deficient safe, no column swaps.

    Returns ``[row_ech_form, rank, transform, pivot_cols]`` with
    ``transform @ mat % 2 == row_ech_form``, matching the reference contract
    (fec/utils.py:1022).

    Large matrices are handed to the bit-packed C++ core
    (feedback_gnn_tpu/native, ~64x fewer word ops, identical pivot
    choices); the NumPy path below is the reference implementation and the
    fallback when no toolchain is available.
    """
    m, n = mat.shape
    if use_native and m * n >= 64 * 64:
        from ..native import row_echelon_native

        out = row_echelon_native(mat, reduced)
        if out is not None:
            return out
    mat = mat.astype(bool).copy()
    transform = np.eye(m, dtype=bool)
    pivot_row = 0
    pivot_cols = []

    for col in range(n):
        if not mat[pivot_row, col]:
            # bring a 1 (if any) from below up to the pivot row
            swap_row = pivot_row + int(np.argmax(mat[pivot_row:, col]))
            if mat[swap_row, col]:
                mat[[swap_row, pivot_row]] = mat[[pivot_row, swap_row]]
                transform[[swap_row, pivot_row]] = transform[[pivot_row, swap_row]]

        if mat[pivot_row, col]:
            # eliminate every other row holding a 1 in this column at once
            sel = mat[:, col].copy()
            if reduced:
                sel[pivot_row] = False
            else:
                sel[: pivot_row + 1] = False
            if sel.any():
                mat[sel] ^= mat[pivot_row]
                transform[sel] ^= transform[pivot_row]
            pivot_row += 1
            pivot_cols.append(col)

        if pivot_row >= m:
            break

    return [mat.astype(int), pivot_row, transform.astype(int), pivot_cols]


def rank(mat: np.ndarray) -> int:
    """Rank of a binary matrix over GF(2)."""
    return row_echelon(mat)[1]


def kernel(mat: np.ndarray):
    """Kernel of ``mat`` over GF(2).

    Returns ``(ker, rank, pivot_cols)`` where the rows of ``ker`` span
    ``{x : mat @ x = 0 (mod 2)}`` and ``pivot_cols`` indexes a row basis of
    ``mat`` (reference: fec/utils.py:1104 — transform rows below the rank of
    the transposed matrix).
    """
    transpose = mat.T
    m = transpose.shape[0]
    _, rk, transform, pivot_cols = row_echelon(transpose)
    return transform[rk:m], rk, pivot_cols


def row_basis(mat: np.ndarray) -> np.ndarray:
    """Rows of ``mat`` forming a basis of its row space."""
    return mat[row_echelon(mat.T)[3]]


def compute_code_distance(mat: np.ndarray, is_pcm: bool = True, is_basis: bool = False):
    """Minimum weight of a nonzero codeword (exponential unless ``is_basis``).

    Mirrors fec/utils.py:1159.  With ``is_basis=True`` this is simply the
    minimum row weight of the given basis, which is what the reference uses
    for its stabilizer-distance estimate.
    """
    gen = mat
    if is_pcm:
        gen = kernel(mat)[0]
    if len(gen) == 0:
        return np.inf
    cw = gen
    if not is_basis:
        cw = row_basis(gen)
    return int(np.min(np.sum(cw, axis=1)))


def inverse(mat: np.ndarray) -> np.ndarray:
    """Left inverse of a full-(column-)rank binary matrix (fec/utils.py:1189)."""
    m, n = mat.shape
    reduced_row_ech, rk, transform, _ = row_echelon(mat, reduced=True)
    if m == n and rk == m:
        return transform
    if m > rk and n == rk:
        return reduced_row_ech.T @ transform % 2
    raise ValueError(
        "Matrix is not invertible: need a full-rank square matrix or a "
        "rectangular matrix with full column rank."
    )


def int2bin(num: int, length: int) -> list:
    """Binary representation of ``num`` using ``length`` bits (LSB-first order
    matching the reference's int2bin used by the Hamming constructor)."""
    assert num >= 0 and length >= 0
    bin_str = format(num, f"0{length}b")[-length:] if length else ""
    return [int(x) for x in bin_str]
