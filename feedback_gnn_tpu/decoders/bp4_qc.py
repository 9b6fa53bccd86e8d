"""Fused quaternary BP kernel for quasi-cyclic CSS codes (Pallas/TPU).

The entire BP4 message-passing loop runs inside ONE Pallas kernel with all
message state resident in VMEM: per batch tile, channel LLRs and syndromes
are read from HBM once and only the final marginals are written back —
versus the XLA path (decoders/bp4.py) which streams ~10 full message
passes through HBM per iteration.

This is possible because block-circulant codes (codes/qc.py) need no
dynamic gather: the VN<->CN edge permutation decomposes into per-group
cyclic shifts, executed as static sublane slice-copies at VMEM speed
(Mosaic has no dynamic-gather lowering on this target — measured in
scripts/probe_pallas*.py).

Message state layout: ``[G, l, Bt]`` — one [l, Bt] plane per single-shift
circulant edge group, stored in the CN frame (plane row r = the message on
the edge of CN (i_g, r)).  The VN frame is ``roll_left(plane, s_g)``.

Numerics follow the reference QLDPCBPDecoder exactly
(/root/reference/sionna/fec/ldpc/decoding_q.py):
* VN update: Y-coupled stable log-space extrinsics (decoding_q.py:244-273);
* CN update: boxplus-phi with the syndrome sign in the node product and
  clip constants 8.5e-8 / 16.635532 (decoding_q.py:365-431) — phi is
  computed as -log(tanh(x/2)) (identical function; expm1 has no Mosaic
  lowering), agreeing with the XLA path to ~1e-6;
* minsum with duplicate-min detection (decoding_q.py:539-644).

Eval-only: no logit stack / no gradients (training uses the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.qc import QCPair
from .cn_update import ATANH_CLIP, LLR_MAX, PHI_CLIP_MAX, PHI_CLIP_MIN, _LARGE_VAL

__all__ = ["bp4_qc_marginals", "qc_supported"]


def qc_supported(cn_type: str) -> bool:
    return cn_type in ("boxplus-phi", "boxplus", "minsum")


def _roll_left(x, k, l, use_pltpu=True):
    """roll_left(x, k)[i] = x[(i + k) % l] on an [l_pad, Bt] plane whose
    rows >= l are pad (quarantined: they never mix into rows < l).

    Implemented as TWO aligned ``pltpu.roll``s + a static row select —
    sublane-unaligned slice/concat lowers to a catastrophically slow copy
    loop on Mosaic (~600us vs ~0.5us per roll, measured on v5e), while
    hardware rotates are VMEM-speed:

      want  y[i] = x[(i+k) mod l]          for i < l
      use   y[i] = roll(x,k)[i]   = x[i+k]           for i <  l-k
            y[i] = roll(x,k+g)[i] = x[i+k-l]         for i >= l-k
      with g = l_pad - l  (row l_pad-k of roll(x,k) would read pad row l;
      the select hands that row to the other branch first).
    """
    k = k % l
    if k == 0:
        return x
    l_pad = x.shape[0]
    g = l_pad - l
    # pltpu.roll has no interpret-mode lowering; jnp.roll is identical
    roll = pltpu.roll if use_pltpu else jnp.roll
    a = roll(x, shift=l_pad - k, axis=0)  # roll convention: y[i] = x[(i-shift)%n]
    if g == 0:
        return a
    b = roll(x, shift=l_pad - k - g, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < l - k, a, b)


def _phi(x, impl=None):
    """phi(x) = log((e^x+1)/(e^x-1)) = -log(tanh(x/2)), reference clips
    (decoding_q.py:48-51, 372-373).  ``impl`` selects a formulation
    explicitly (floor-numerics experiments / the rescue stage); ``None``
    falls back to cn_update's module default.  Only the Mosaic-loweable
    formulations are honored; the kernel default is the tanh form (expm1
    has no Mosaic lowering)."""
    if impl is None:
        from . import cn_update

        impl = cn_update._PHI_IMPL
    x = jnp.clip(x, PHI_CLIP_MIN, PHI_CLIP_MAX)
    if impl == "tf":
        out = jax.nn.softplus(x) - jnp.log(jnp.exp(x) - 1.0)
    elif impl == "accurate":
        e = jnp.exp(-x)
        out = jnp.log1p(e) - jnp.log1p(-e)
    else:
        out = -jnp.log(jnp.tanh(x * 0.5))
    return jnp.clip(out, PHI_CLIP_MIN, PHI_CLIP_MAX)


def _sign_no_zero(x):
    return jnp.where(x < 0, -1.0, 1.0)


def _logsumexp2_neg(a, b):
    """log(exp(-a) + exp(-b)) = -min(a,b) + log1p(exp(-|a-b|))."""
    m = jnp.minimum(a, b)
    return -m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _vn_update(qc: QCPair, msg_x, msg_z, llr, use_pltpu=True):
    """Joint VN update.  msg_* are lists of CN-frame planes ([l_pad, Bt],
    pad rows quarantined); llr is the [3, nb, l_pad, Bt] channel block.
    Returns (new CN-frame msg_x, msg_z, marginals llrx/llry/llrz as
    per-block lists)."""
    qx, qz = qc.qx, qc.qz
    l = qc.l
    nb = qx.nb

    vx = [_roll_left(msg_x[g], s, l, use_pltpu) for g, (_, _, s) in enumerate(qx.groups)]
    vz = [_roll_left(msg_z[g], s, l, use_pltpu) for g, (_, _, s) in enumerate(qz.groups)]

    def block_sum(v, vn_groups, j):
        acc = None
        for g in vn_groups[j]:
            acc = v[g] if acc is None else acc + v[g]
        return acc

    # s_x: sums of Hx-edge messages (beliefs about Z); s_z: about X
    s_x = [block_sum(vx, qx.vn_groups, j) for j in range(nb)]
    s_z = [block_sum(vz, qz.vn_groups, j) for j in range(nb)]

    llrx = [s_z[j] + llr[0, j] for j in range(nb)]
    llry = [s_x[j] + s_z[j] + llr[1, j] for j in range(nb)]
    llrz = [s_x[j] + llr[2, j] for j in range(nb)]

    # extrinsic messages, Hx side (log((pI+pX)/(pZ+pY)) per edge)
    num_x = [jax.nn.softplus(-llrx[j]) for j in range(nb)]
    new_x = []
    for g, (_, j, s) in enumerate(qx.groups):
        lz = llrz[j] - vx[g]
        ly = llry[j] - vx[g]
        nv = num_x[j] - _logsumexp2_neg(lz, ly)
        new_x.append(_roll_left(nv, l - s, l, use_pltpu))

    num_z = [jax.nn.softplus(-llrz[j]) for j in range(nb)]
    new_z = []
    for g, (_, j, s) in enumerate(qz.groups):
        lx = llrx[j] - vz[g]
        ly = llry[j] - vz[g]
        nv = num_z[j] - _logsumexp2_neg(lx, ly)
        new_z.append(_roll_left(nv, l - s, l, use_pltpu))

    return new_x, new_z, llrx, llry, llrz


def _cn_update(spec, msg, syn_pm, cn_type, factor, phi_impl=None):
    """Extrinsic CN update on CN-frame planes.  syn_pm: [mb, l, Bt] in
    {+1,-1}."""
    out = [None] * len(msg)
    for i in range(spec.mb):
        gs = spec.cn_groups[i]
        syn = syn_pm[i]
        if cn_type == "boxplus-phi":
            signs = [_sign_no_zero(msg[g]) for g in gs]
            sprod = functools.reduce(lambda a, b: a * b, signs) * syn
            ps = [_phi(jnp.abs(msg[g]), phi_impl) for g in gs]
            psum = functools.reduce(lambda a, b: a + b, ps)
            for k, g in enumerate(gs):
                out[g] = signs[k] * sprod * _phi(psum - ps[k], phi_impl) * factor
        elif cn_type == "boxplus":
            ts = [jnp.tanh(msg[g] * 0.5) for g in gs]
            ts = [jnp.where(t == 0.0, 1e-12, t) for t in ts]
            tprod = functools.reduce(lambda a, b: a * b, ts) * syn
            for k, g in enumerate(gs):
                o = tprod / ts[k]
                o = jnp.where(jnp.abs(o) < 1e-7, 0.0, o)
                o = jnp.clip(o, -ATANH_CLIP, ATANH_CLIP)
                out[g] = 2.0 * jnp.arctanh(o) * factor
        elif cn_type == "minsum":
            ms = [jnp.clip(msg[g], -LLR_MAX, LLR_MAX) for g in gs]
            signs = [_sign_no_zero(m) for m in ms]
            sprod = functools.reduce(lambda a, b: a * b, signs) * syn
            ams = [jnp.abs(m) for m in ms]
            min1 = functools.reduce(jnp.minimum, ams)
            is_min = [a == min1 for a in ams]
            masked = [jnp.where(im, _LARGE_VAL, a) for im, a in zip(is_min, ams)]
            min2 = functools.reduce(jnp.minimum, masked)
            nmin = functools.reduce(
                lambda a, b: a + b, [im.astype(jnp.float32) for im in is_min]
            )
            min_e = jnp.where(nmin >= 2.0, min1, min2)
            for k, g in enumerate(gs):
                out[g] = signs[k] * sprod * jnp.where(is_min[k], min_e, min1) * factor
        else:  # pragma: no cover
            raise ValueError(cn_type)
    return out


def _pad_l(l: int) -> int:
    """Plane row count: next multiple of 8 (sublane tile)."""
    return -(-l // 8) * 8


def _make_kernel(qc: QCPair, num_iter, cn_type, factor, use_pltpu=True,
                 msg_dtype=jnp.float32, phi_impl=None):
    """``msg_dtype``: storage dtype of the iteration-carried message state
    (bfloat16 halves the VMEM-resident carry; all arithmetic stays f32 —
    an accuracy/VMEM trade measured in the README perf study, NOT used for
    the parity-validated production path)."""
    qx, qz = qc.qx, qc.qz
    l, nb = qc.l, qc.qx.nb
    l_pad = _pad_l(l)

    def kernel(llr_ref, synx_ref, synz_ref, out_ref):
        llr = llr_ref[:]  # [3, nb, l_pad, Bt] (pad rows zero)
        synx = 1.0 - 2.0 * synx_ref[:]  # {0,1} -> {+1,-1}, [mbx, l_pad, Bt]
        synz = 1.0 - 2.0 * synz_ref[:]
        bt = llr.shape[-1]

        def stack(planes):
            return jnp.stack(planes, axis=0).astype(msg_dtype)

        def unstack(arr):
            return [arr[g].astype(jnp.float32) for g in range(arr.shape[0])]

        def body(_, carry):
            mx, mz = carry
            new_x, new_z, _, _, _ = _vn_update(
                qc, unstack(mx), unstack(mz), llr, use_pltpu
            )
            cx = _cn_update(qx, new_x, synx, cn_type, factor, phi_impl)
            cz = _cn_update(qz, new_z, synz, cn_type, factor, phi_impl)
            return stack(cx), stack(cz)

        init = (
            jnp.zeros((qx.num_groups, l_pad, bt), msg_dtype),
            jnp.zeros((qz.num_groups, l_pad, bt), msg_dtype),
        )
        mx, mz = jax.lax.fori_loop(0, num_iter, body, init)
        mx, mz = mx.astype(jnp.float32), mz.astype(jnp.float32)

        # final marginalisation (sum over VN frames + channel LLR)
        vx = [_roll_left(mx[g], s, l, use_pltpu) for g, (_, _, s) in enumerate(qx.groups)]
        vz = [_roll_left(mz[g], s, l, use_pltpu) for g, (_, _, s) in enumerate(qz.groups)]
        for j in range(nb):
            s_x = functools.reduce(lambda a, b: a + b, [vx[g] for g in qx.vn_groups[j]])
            s_z = functools.reduce(lambda a, b: a + b, [vz[g] for g in qz.vn_groups[j]])
            out_ref[0, j] = s_z + llr[0, j]
            out_ref[1, j] = s_x + s_z + llr[1, j]
            out_ref[2, j] = s_x + llr[2, j]

    return kernel


def bp4_qc_marginals(
    qc: QCPair,
    llr_ch,
    syndrome_x,
    syndrome_z,
    num_iter: int,
    cn_type: str = "boxplus-phi",
    normalization_factor: float = 1.0,
    batch_tile: int = 128,
    interpret: bool | None = None,
    msg_dtype=jnp.float32,
    phi_impl: str | None = None,
):
    """Run the fused QC BP4 kernel.

    Args:
      llr_ch: [3, n, B] channel LLRs (x, y, z), true n = qc.n.
      syndrome_x / syndrome_z: [mx, B] / [mz, B] in {0,1}.
    Returns (llrx, llry, llrz), each [n, B] — the same marginals as
    ``bp4_decode``'s result sliced to true shapes.

    ``interpret`` defaults to auto: Pallas interpreter on CPU backends
    (tests / virtual meshes), compiled Mosaic on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    l, nb = qc.l, qc.qx.nb
    l_pad = _pad_l(l)
    mbx, mbz = qc.qx.mb, qc.qz.mb
    n = qc.n
    b = llr_ch.shape[-1]
    assert llr_ch.shape == (3, n, b), llr_ch.shape

    bt = min(batch_tile, b)
    b_pad = -(-b // bt) * bt
    if b_pad != b:
        pad = [(0, 0), (0, 0), (0, b_pad - b)]
        llr_ch = jnp.pad(llr_ch, pad)
        syndrome_x = jnp.pad(syndrome_x, [(0, 0), (0, b_pad - b)])
        syndrome_z = jnp.pad(syndrome_z, [(0, 0), (0, b_pad - b)])

    row_pad = [(0, 0), (0, 0), (0, l_pad - l), (0, 0)]

    def to_planes(x, mb):
        x = x.astype(jnp.float32).reshape(mb, l, b_pad)
        return jnp.pad(x, [(0, 0), (0, l_pad - l), (0, 0)])

    llr_b = jnp.pad(llr_ch.astype(jnp.float32).reshape(3, nb, l, b_pad), row_pad)
    synx_b = to_planes(syndrome_x, mbx)
    synz_b = to_planes(syndrome_z, mbz)

    kernel = _make_kernel(
        qc, num_iter, cn_type, float(normalization_factor),
        use_pltpu=not interpret, msg_dtype=msg_dtype, phi_impl=phi_impl,
    )
    grid = (b_pad // bt,)
    # under shard_map(check_vma=True) the output must declare how it varies
    # over the manual mesh axes: the JOIN of the inputs' vma (the channel
    # prior is often a replicated constant while the syndromes vary)
    def _vma(a):
        return getattr(jax.typeof(a), "vma", None) or frozenset()

    vma = _vma(llr_b) | _vma(synx_b) | _vma(synz_b)
    if vma:
        llr_b, synx_b, synz_b = (
            jax.lax.pvary(a, tuple(vma - _vma(a))) if vma != _vma(a) else a
            for a in (llr_b, synx_b, synz_b)
        )
        out_sds = jax.ShapeDtypeStruct((3, nb, l_pad, b_pad), jnp.float32, vma=vma)
    else:
        out_sds = jax.ShapeDtypeStruct((3, nb, l_pad, b_pad), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=out_sds,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, nb, l_pad, bt), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((mbx, l_pad, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((mbz, l_pad, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, nb, l_pad, bt), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(llr_b, synx_b, synz_b)

    out = out[:, :, :l, :].reshape(3, nb * l, b_pad)[:, :, :b]
    return out[0], out[1], out[2]


def bp4_decode_qc(
    graph,
    qc: QCPair,
    llr_ch,
    syndrome_x,
    syndrome_z,
    num_iter: int,
    cn_type: str = "boxplus-phi",
    normalization_factor: float = 1.0,
    batch_tile: int = 128,
    interpret: bool | None = None,
    need_logits: bool = True,
    msg_dtype=jnp.float32,
    phi_impl: str | None = None,
):
    """Drop-in replacement for ``bp4.bp4_decode`` (eval mode, no logit
    stack) backed by the fused kernel.  Accepts the cascade's padded
    layouts ([3, n_pad, B] LLRs, [c_pad, B] syndromes) and returns a
    ``BP4Result`` with identical padded shapes, so ``sandwich_decode``
    can switch backends transparently.  ``need_logits=False`` skips the
    check-satisfaction logits (prepass runs never feed a GNN)."""
    from .bp4 import BP4Result, _cal_logit, hard_decision

    n = qc.n
    l = qc.l
    mx, mz = qc.qx.mb * l, qc.qz.mb * l
    llrx, llry, llrz = bp4_qc_marginals(
        qc,
        llr_ch[:, :n, :],
        syndrome_x[:mx],
        syndrome_z[:mz],
        num_iter,
        cn_type=cn_type,
        normalization_factor=normalization_factor,
        batch_tile=batch_tile,
        interpret=interpret,
        msg_dtype=msg_dtype,
        phi_impl=phi_impl,
    )
    n_pad = graph.n_pad
    b = llrx.shape[-1]
    pad = [(0, n_pad - n), (0, 0)]
    llrx = jnp.pad(llrx, pad)
    llry = jnp.pad(llry, pad)
    llrz = jnp.pad(llrz, pad)
    x_logit = z_logit = None
    if need_logits:
        x_logit, z_logit = _cal_logit(llrx, llry, llrz, graph, phi_impl)
    x_hat, z_hat = hard_decision(llrx, llry, llrz)
    return BP4Result(llrx, llry, llrz, x_hat, z_hat, x_logit, z_logit, None)
