from .gf2 import (
    row_echelon,
    rank,
    kernel,
    row_basis,
    compute_code_distance,
    inverse,
    int2bin,
)
from .css import (
    CSSCode,
    create_circulant_matrix,
    create_generalized_bicycle_codes,
    hypergraph_product,
    hamming_code,
    rep_code,
    create_surface_codes,
    create_rotated_surface_codes,
    create_checkerboard_toric_codes,
    create_QC_GHP_codes,
    create_cyclic_permuting_matrix,
    create_bivariate_QC_codes,
    read_alist,
    gb_n48_k6_d8_oc,
    gb_n46_k2_d9_oc,
    ghp_882_24,
    ghp_1270_28,
)
from .graph import TannerGraph, RowSet, QuantumGraph, build_graph, build_rowset
