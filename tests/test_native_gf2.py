"""Bit-packed C++ GF(2) core vs the NumPy reference implementation."""

import numpy as np
import pytest

from feedback_gnn_tpu import native
from feedback_gnn_tpu.codes import gf2

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain available"
)


@pytest.mark.parametrize("shape", [(8, 8), (40, 70), (70, 40), (129, 200)])
@pytest.mark.parametrize("reduced", [False, True])
def test_row_echelon_matches_numpy(shape, reduced):
    rng = np.random.default_rng(shape[0] * 1000 + shape[1] + int(reduced))
    mat = rng.integers(0, 2, shape)
    ech_n, rk_n, tf_n, piv_n = native.row_echelon_native(mat, reduced)
    ech_p, rk_p, tf_p, piv_p = gf2.row_echelon(mat, reduced, use_native=False)
    assert rk_n == rk_p
    assert piv_n == list(piv_p)
    np.testing.assert_array_equal(ech_n, ech_p)
    np.testing.assert_array_equal(tf_n, tf_p)
    # transform contract
    np.testing.assert_array_equal(tf_n @ mat % 2, ech_n)


def test_row_echelon_rank_deficient():
    mat = np.zeros((6, 9), int)
    mat[0, 2] = mat[1, 2] = 1
    mat[3] = 1
    ech_n, rk_n, _, piv = native.row_echelon_native(mat)
    _, rk_p, _, piv_p = gf2.row_echelon(mat, use_native=False)
    assert rk_n == rk_p and piv == list(piv_p)


def test_gf2_matmul_native():
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2, (37, 130))
    v = rng.integers(0, 2, (130, 23))
    out = native.gf2_matmul_native(h, v)
    np.testing.assert_array_equal(out, h @ v % 2)


def test_code_construction_uses_native():
    """The GHP constructor produces the same code parameters through the
    native path (codes built in other tests already cover correctness; this
    pins the native/NumPy agreement at construction scale)."""
    from feedback_gnn_tpu.codes.css import (
        create_QC_GHP_codes,
        create_cyclic_permuting_matrix,
    )

    code = create_QC_GHP_codes(
        7, create_cyclic_permuting_matrix(3, [2, 4, 0]), [0, 1, 3]
    )
    assert code.N == 42
    hx = np.asarray(code.hx)
    lx = np.asarray(code.lx)
    # logical ops commute with the stabilizers: Hz @ Lx^T = 0
    assert not np.any(np.asarray(code.hz) @ lx.T % 2)
