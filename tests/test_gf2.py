"""GF(2) linear algebra unit tests: brute-force NumPy checks of the
contracts documented in /root/reference/sionna/fec/utils.py:1022-1233."""

import numpy as np
import pytest

from feedback_gnn_tpu.codes import (
    compute_code_distance,
    inverse,
    kernel,
    rank,
    row_basis,
    row_echelon,
)


def random_binary(rng, m, n):
    return rng.integers(0, 2, size=(m, n))


@pytest.mark.parametrize("shape", [(5, 8), (8, 5), (10, 10), (1, 7), (7, 1)])
def test_row_echelon_transform_identity(rng, shape):
    for _ in range(10):
        mat = random_binary(rng, *shape)
        ech, rk, transform, pivots = row_echelon(mat)
        assert np.array_equal(transform @ mat % 2, ech)
        assert len(pivots) == rk
        # echelon structure: pivot of row i is strictly right of row i-1's
        assert pivots == sorted(pivots)
        for i, col in enumerate(pivots):
            assert ech[i, col] == 1
            assert not ech[i + 1 :, col].any()


def test_row_echelon_reduced(rng):
    mat = random_binary(rng, 8, 12)
    ech, rk, transform, pivots = row_echelon(mat, reduced=True)
    assert np.array_equal(transform @ mat % 2, ech)
    for i, col in enumerate(pivots):
        col_vals = ech[:, col]
        assert col_vals.sum() == 1 and col_vals[i] == 1


def test_rank_matches_gf2_brute_force(rng):
    for _ in range(20):
        mat = random_binary(rng, 6, 9)
        # brute force: count distinct nonzero row-space elements = 2^rank
        from itertools import product

        span = set()
        for coeffs in product([0, 1], repeat=mat.shape[0]):
            v = tuple((np.array(coeffs) @ mat) % 2)
            span.add(v)
        assert 2 ** rank(mat) == len(span)


def test_kernel_annihilates(rng):
    for _ in range(20):
        mat = random_binary(rng, 7, 11)
        ker, rk, pivots = kernel(mat)
        assert ker.shape[0] == mat.shape[1] - rk
        assert not np.any(mat @ ker.T % 2)
        # kernel rows are independent
        assert rank(ker) == ker.shape[0] if ker.shape[0] else True


def test_row_basis(rng):
    mat = random_binary(rng, 8, 6)
    basis = row_basis(mat)
    assert rank(basis) == basis.shape[0] == rank(mat)


def test_inverse_square(rng):
    # random invertible square matrix
    while True:
        mat = random_binary(rng, 6, 6)
        if rank(mat) == 6:
            break
    inv = inverse(mat)
    assert np.array_equal(inv @ mat % 2, np.eye(6, dtype=int))


def test_inverse_left(rng):
    # full column rank rectangular
    while True:
        mat = random_binary(rng, 9, 5)
        if rank(mat) == 5:
            break
    inv = inverse(mat)
    assert np.array_equal(inv @ mat % 2, np.eye(5, dtype=int))


def test_code_distance_repetition():
    from feedback_gnn_tpu.codes import rep_code

    # [5,1,5] repetition code: distance 5
    assert compute_code_distance(rep_code(5)) == 5


def test_matches_reference_implementation(rng):
    """Golden comparison against the reference's own row_echelon."""
    try:
        from refutil import import_reference_sionna

        import_reference_sionna()
        from sionna.fec.utils import row_echelon as ref_row_echelon
    except Exception:
        pytest.skip("reference import unavailable")

    for _ in range(10):
        mat = random_binary(rng, 7, 10)
        ours = row_echelon(mat)
        ref = ref_row_echelon(mat)
        assert np.array_equal(ours[0], ref[0])
        assert ours[1] == ref[1]
        assert np.array_equal(ours[2], ref[2])
        assert ours[3] == ref[3]
