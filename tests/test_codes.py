"""Code-construction tests: reproduce the verified constants of the target
code instances (SURVEY.md §2.2) and structural invariants."""

import numpy as np
import pytest

from feedback_gnn_tpu.codes import (
    CSSCode,
    build_graph,
    build_rowset,
    create_checkerboard_toric_codes,
    create_generalized_bicycle_codes,
    create_QC_GHP_codes,
    create_cyclic_permuting_matrix,
    create_rotated_surface_codes,
    create_surface_codes,
    hamming_code,
    hypergraph_product,
    rep_code,
)


def check_css_invariants(code: CSSCode):
    # CSS commutation
    assert not np.any(code.hx @ code.hz.T % 2)
    # kernels annihilate
    assert not np.any(code.hx @ code.hx_perp.T % 2)
    assert not np.any(code.hz @ code.hz_perp.T % 2)
    # logicals commute with stabilizers but lx/lz pair anticommutes somewhere
    assert not np.any(code.hx @ code.lz.T % 2)
    assert not np.any(code.hz @ code.lx.T % 2)
    assert code.lx.shape[0] == code.K
    assert code.lz.shape[0] == code.K
    from feedback_gnn_tpu.codes import rank

    assert rank(code.lx @ code.lz.T % 2) == code.K


def test_surface_code():
    code = create_surface_codes(3)
    assert code.N == 13 and code.K == 1
    check_css_invariants(code)


def test_rotated_surface_code():
    code = create_rotated_surface_codes(3)
    assert code.N == 9 and code.K == 1
    check_css_invariants(code)


def test_toric_code():
    code = create_checkerboard_toric_codes(4)
    assert code.N == 16 and code.K == 2
    check_css_invariants(code)


def test_generalized_bicycle():
    # GB code from examples/QLDPC.ipynb: [[48,6]]
    code = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])
    assert code.N == 48 and code.K == 6
    check_css_invariants(code)


def test_hypergraph_product_hamming():
    h = hamming_code(3)
    code = hypergraph_product(h, h)
    assert code.N == 7 * 7 + 3 * 3
    check_css_invariants(code)


@pytest.mark.slow
def test_ghp_882_24(ghp882):
    code = ghp882
    assert code.N == 882 and code.K == 24
    assert code.hx.shape == (441, 882) and code.hz.shape == (441, 882)
    assert code.rank_hx == 429 and code.rank_hz == 429
    assert code.hx_perp.shape[0] == 453
    # (3,6)-biregular
    assert (code.hx.sum(axis=0) == 3).all() and (code.hx.sum(axis=1) == 6).all()
    assert (code.hz.sum(axis=0) == 3).all() and (code.hz.sum(axis=1) == 6).all()
    check_css_invariants(code)


def test_cyclic_permuting_matrix():
    A = create_cyclic_permuting_matrix(7, [27, 54, 0])
    assert A.shape == (7, 7)
    assert (A >= -1).all()
    # rows each contain exactly the three shifts
    for j in range(7):
        vals = sorted(v for v in A[j] if v >= 0)
        assert vals == [0, 27, 54]


def test_graph_layout_roundtrip(small_code):
    """The aligned slot-major tables must encode exactly the PCM's edges and
    the two flat gathers must be mutual inverses on real slots."""
    g = build_graph(small_code.hx)
    pcm = np.asarray(small_code.hx)
    assert g.num_edges == int(pcm.sum())
    assert g.n_pad % 8 == 0 and g.c_pad % 8 == 0
    assert g.n_pad > g.num_vn and g.c_pad > g.num_cn
    # edge endpoints reconstruct the pcm (debug views, VN-major)
    rebuilt = np.zeros_like(pcm)
    rebuilt[g.edge_cn, g.edge_vn] = 1
    assert np.array_equal(rebuilt, pcm)
    assert (np.diff(g.edge_vn) >= 0).all()
    # masks count true degrees
    assert np.array_equal(g.vn_mask.sum(axis=0)[: g.num_vn], pcm.sum(axis=0))
    assert np.array_equal(g.cn_mask.sum(axis=0)[: g.num_cn], pcm.sum(axis=1))
    # vn_gather and cn_gather are mutual inverses on real slots, and
    # together they encode the pcm edges
    edges_seen = set()
    for sc in range(g.max_cn_deg):
        for c in range(g.c_pad):
            if g.cn_mask[sc, c] > 0:
                vflat = g.cn_gather[sc * g.c_pad + c]
                sv, v = divmod(int(vflat), g.n_pad)
                assert g.vn_mask[sv, v] > 0
                assert g.vn_gather[vflat] == sc * g.c_pad + c
                assert g.edge_cn_byslot[sv, v] == c
                assert g.edge_vn_byslot[sc, c] == v
                edges_seen.add((c, v))
    assert edges_seen == set(zip(map(int, g.edge_cn), map(int, g.edge_vn)))
    # pad entries point at pad rows (zero-invariant targets)
    assert (g.cn_gather[g.cn_mask.ravel() == 0] % g.n_pad >= g.num_vn).all()
    assert (g.vn_gather[g.vn_mask.ravel() == 0] % g.c_pad >= g.num_cn).all()


def test_graph_biregular(ghp882):
    g = build_graph(ghp882.hx)
    assert g.max_vn_deg == 3 and g.max_cn_deg == 6
    assert g.num_edges == 2646
    assert g.n_pad == 888 and g.c_pad == 448


def test_rowset(small_code):
    rs = build_rowset(small_code.hx_perp)
    pcm = np.asarray(small_code.hx_perp)
    assert rs.num_rows == pcm.shape[0]
    assert rs.r_pad % 8 == 0 and rs.r_pad > rs.num_rows
    for r in range(rs.num_rows):
        cols = rs.vn_idx[:, r][rs.mask[:, r] > 0]
        assert set(cols) == set(np.nonzero(pcm[r])[0])
    assert (rs.row_valid[: rs.num_rows] == 1).all()
    assert (rs.row_valid[rs.num_rows :] == 0).all()


def test_overcomplete_gb_codes():
    """Shipped overcomplete check matrices (QLDPC.ipynb cell 5): same code
    parameters as the square constructions, but redundant rows (more checks
    than rank) for better BP convergence."""
    from feedback_gnn_tpu.codes import (
        create_generalized_bicycle_codes,
        gb_n46_k2_d9_oc,
        gb_n48_k6_d8_oc,
    )

    oc48 = gb_n48_k6_d8_oc()
    sq48 = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])
    assert (oc48.N, oc48.K) == (sq48.N, sq48.K) == (48, 6)
    assert oc48.hx.shape[0] == 1000 and oc48.rank_hx == sq48.rank_hx
    # overcomplete rows are all parity checks: orthogonal to the logicals
    assert not ((oc48.hx @ oc48.lz.T) % 2).any()

    oc46 = gb_n46_k2_d9_oc()
    assert (oc46.N, oc46.K) == (46, 2)
    assert oc46.hx.shape[0] == 400
