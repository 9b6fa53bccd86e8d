"""Golden parity: Feedback GNN vs the TF reference (random weights + random
inputs; fixture from tests/golden/generate_golden.py)."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_feedback_gnn_matches_reference():
    path = os.path.join(GOLDEN, "gnn_gb48_random.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing")
    d = np.load(path)

    import jax.numpy as jnp

    from feedback_gnn_tpu.codes import CSSCode
    from feedback_gnn_tpu.codes.graph import QuantumGraph
    from feedback_gnn_tpu.decoders.gnn_feedback import feedback_gnn_apply

    code = CSSCode(d["hx"].astype(int), d["hz"].astype(int))
    graph = QuantumGraph.from_code(code)

    w = [jnp.asarray(d[f"w{i}"]) for i in range(12)]
    params = {
        "llr_inv_embed": {"kernel": w[0], "bias": w[1]},
        "msg_mlp_x": [{"kernel": w[2], "bias": w[3]}, {"kernel": w[4], "bias": w[5]}],
        "msg_mlp_z": [{"kernel": w[6], "bias": w[7]}, {"kernel": w[8], "bias": w[9]}],
        "embed_mlp": [{"kernel": w[10], "bias": w[11]}],
    }

    # reference h_vn is [bs, n, 3]; ours is [3, n, B]
    h_vn = jnp.asarray(d["h_vn"]).transpose(2, 1, 0)
    out = feedback_gnn_apply(
        params,
        graph,
        h_vn,
        jnp.asarray(d["logit_hx"]),
        jnp.asarray(d["logit_hz"]),
        jnp.asarray(d["syndrome_x"]),
        jnp.asarray(d["syndrome_z"]),
    )
    ref = d["out"].transpose(2, 1, 0)  # [bs, n, 3] -> [3, n, B]
    n = graph.n
    np.testing.assert_allclose(np.asarray(out)[:, :n], ref, rtol=1e-4, atol=1e-4)


def test_weight_importer_roundtrip(tmp_path):
    """load_reference_weights + save_reference_weights are inverses and match
    the 12-array layout of the shipped pickles."""
    import pickle

    import jax

    from feedback_gnn_tpu.decoders.gnn_feedback import (
        init_feedback_gnn,
        load_reference_weights,
        save_reference_weights,
    )

    params = init_feedback_gnn(jax.random.PRNGKey(0))
    path = str(tmp_path / "w.npy")
    save_reference_weights(params, path)
    with open(path, "rb") as f:
        w = pickle.load(f)
    assert len(w) == 12
    assert w[0].shape == (40, 3) and w[2].shape == (4, 40) and w[10].shape == (43, 40)
    params2 = load_reference_weights(path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), params, params2)


def test_shipped_weights_import():
    """The 4 shipped trained pickles import into our param structure."""
    base = "/root/reference/sionna/fec/ldpc/weights"
    if not os.path.isdir(base):
        pytest.skip("reference weights unavailable")
    from feedback_gnn_tpu.decoders.gnn_feedback import load_reference_weights

    for f in os.listdir(base):
        params = load_reference_weights(os.path.join(base, f))
        assert params["llr_inv_embed"]["kernel"].shape == (40, 3)
        assert params["embed_mlp"][0]["kernel"].shape == (43, 40)


def test_converted_npz_weights_match_reference_pickles():
    """The npz checkpoints shipped in feedback_gnn_tpu/weights/ must be
    bit-identical to the reference pickles they were converted from."""
    import glob
    import os

    import jax
    import numpy as np

    from feedback_gnn_tpu.decoders.gnn_feedback import (
        load_reference_weights,
        load_weights,
    )

    pkg = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "feedback_gnn_tpu", "weights")
    ref = "/root/reference/sionna/fec/ldpc/weights"
    # the four reference-converted pickles; weights trained IN this
    # framework (scratch_*) have no reference counterpart to compare to
    npzs = sorted(p for p in glob.glob(os.path.join(pkg, "*.npz"))
                  if "scratch" not in os.path.basename(p))
    assert len(npzs) == 4
    checked = 0
    for npz in npzs:
        stem = os.path.splitext(os.path.basename(npz))[0]
        pkl = os.path.join(ref, stem + ".npy")
        if not os.path.exists(pkl):
            continue
        a = load_weights(npz)
        b = load_reference_weights(pkl)
        for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        checked += 1
    if checked == 0:
        import pytest

        pytest.skip("reference pickles unavailable")
