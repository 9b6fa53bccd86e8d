"""Golden parity: our BP decoders vs the TF reference (fixtures produced by
tests/golden/generate_golden.py with deterministic injected noise).

Tolerance policy (calibrated, see docstring of `assert_llr_parity`):

* minsum: piecewise-linear, no transcendental noise -> strict allclose.
* boxplus/boxplus-phi: TF's phi is dominated by f32 `exp(x)-1` quantization
  for x < 1e-5 (TF's own phi(1e-6) deviates 0.05 from the true value, and
  numpy/XLA exp round differently), so saturated messages (|llr| ~ 16..70)
  carry framework-specific staircase noise.  Our expm1-based phi is the
  mathematically accurate one.  We therefore compare strictly on the
  informative region (|ref| < 10 -> agree to ~8e-4) and at decision level
  (signs, hard decisions) elsewhere.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_case(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing")
    return np.load(path, allow_pickle=True)


def build_quantum_graph(hx, hz, stage_mode=True):
    from feedback_gnn_tpu.codes import CSSCode
    from feedback_gnn_tpu.codes.graph import QuantumGraph

    code = CSSCode(hx.astype(int), hz.astype(int))
    return QuantumGraph.from_code(code, stage_mode=stage_mode)


def assert_llr_parity(ours, ref, strict, what, llr_mask_level=10.0, atol=5e-2):
    ours = np.asarray(ours)
    if strict:
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=atol, err_msg=what)
        return
    mask = np.abs(ref) < llr_mask_level
    if mask.any():
        # chaotic long-horizon BP: a small tail of informative entries sits
        # downstream of saturated (staircase-noise) messages — require 98 %
        # of the informative region within tolerance instead of all of it
        diff = np.abs(ours[mask] - ref[mask])
        tol = atol + 1e-3 * np.abs(ref[mask])
        frac_ok = np.mean(diff <= tol)
        assert frac_ok >= 0.98, f"{what} (masked): only {frac_ok:.4f} within tol"
    sign_agree = np.mean(np.sign(ours) == np.sign(ref))
    assert sign_agree >= 0.9995, f"{what}: sign agreement {sign_agree}"


@pytest.mark.parametrize(
    "case",
    [
        "bp4_surface3_phi8.npz",
        "bp4_gb48_phi8.npz",
        "bp4_gb48_minsum8.npz",
        "bp4_gb48_tanh4.npz",
    ],
)
def test_bp4_matches_reference(case):
    import jax.numpy as jnp

    from feedback_gnn_tpu.decoders import bp4_decode

    d = load_case(case)
    graph = build_quantum_graph(d["hx"], d["hz"])
    strict = str(d["cn_type"]) == "minsum"

    llr = jnp.asarray(d["llr"]).transpose(1, 2, 0)  # [bs,3,n] -> [3,n,B]
    res = bp4_decode(
        graph,
        llr,
        jnp.asarray(d["syndrome_x"], jnp.float32),
        jnp.asarray(d["syndrome_z"], jnp.float32),
        num_iter=int(d["num_iter"]),
        cn_type=str(d["cn_type"]),
        normalization_factor=float(d["factor"]),
    )
    n = graph.n
    rx = graph.logit_rows_x.num_rows
    rz = graph.logit_rows_z.num_rows

    assert_llr_parity(res.llrx[:n], d["llrx"].T, strict, f"{case}:llrx")
    assert_llr_parity(res.llry[:n], d["llry"].T, strict, f"{case}:llry")
    assert_llr_parity(res.llrz[:n], d["llrz"].T, strict, f"{case}:llrz")
    # logits always go through phi (even for minsum decoding), so the
    # saturated-region staircase noise applies regardless of cn_type
    assert_llr_parity(
        res.x_logit[:rx], d["x_logit"], False, f"{case}:x_logit", llr_mask_level=8.0, atol=2e-2
    )
    assert_llr_parity(
        res.z_logit[:rz], d["z_logit"], False, f"{case}:z_logit", llr_mask_level=8.0, atol=2e-2
    )
    x_match = np.mean(np.asarray(res.x_hat[:n]) == d["x_hat"].T)
    z_match = np.mean(np.asarray(res.z_hat[:n]) == d["z_hat"].T)
    assert x_match > 0.999 and z_match > 0.999, (x_match, z_match)


def test_bp4_logit_stack_matches_reference():
    """stage_two mode: per-iteration logit stack used by the training loss.

    Reference stack layout (decoding_q.py:730-781): slot 2i = x_logit of
    iteration i, slot 2i+1 = z_logit; final pair at 2*num_iter.
    Ours: two stacks [num_iter+1, R, B].
    """
    import jax.numpy as jnp

    from feedback_gnn_tpu.decoders import bp4_decode

    d = load_case("bp4stack_gb48_phi6.npz")
    graph = build_quantum_graph(d["hx"], d["hz"])
    llr = jnp.asarray(d["llr"]).transpose(1, 2, 0)
    num_iter = int(d["num_iter"])

    res = bp4_decode(
        graph,
        llr,
        jnp.asarray(d["syndrome_x"], jnp.float32),
        jnp.asarray(d["syndrome_z"], jnp.float32),
        num_iter=num_iter,
        collect_logits=True,
    )
    xs, zs = res.logit_stack
    rx = graph.logit_rows_x.num_rows
    rz = graph.logit_rows_z.num_rows
    ref = d["llr_hat"]  # [2*num_iter+2, R, B]
    for it in range(num_iter + 1):
        assert_llr_parity(
            xs[it][:rx], ref[2 * it], False, f"x it={it}", llr_mask_level=8.0, atol=2e-2
        )
        assert_llr_parity(
            zs[it][:rz], ref[2 * it + 1], False, f"z it={it}", llr_mask_level=8.0, atol=2e-2
        )


def test_bp2_matches_reference():
    import jax.numpy as jnp

    from feedback_gnn_tpu.codes.graph import build_graph
    from feedback_gnn_tpu.decoders import bp2_decode

    for case in ["bp2_surface3_phi8.npz", "bp2_gb48_minsum8.npz"]:
        d = load_case(case)
        graph = build_graph(d["pcm"].astype(int))
        res = bp2_decode(
            graph,
            jnp.asarray(d["llr"]).T,
            jnp.asarray(d["syndrome"], jnp.float32),
            num_iter=int(d["num_iter"]),
            cn_type=str(d["cn_type"]),
            normalization_factor=float(d["factor"]),
        )
        strict = str(d["cn_type"]) == "minsum"
        n = graph.num_vn
        assert_llr_parity(
            res.logits[:n], d["logits"].T, strict, case, llr_mask_level=10.0, atol=1e-2
        )
