"""Fused binary syndrome-BP kernel for quasi-cyclic PCMs (Pallas/TPU).

Single-graph sibling of decoders/bp4_qc.py: the whole BP2 flooding loop
runs VMEM-resident per batch tile with the VN<->CN permutation as
circulant rolls.  Semantics match decoders/bp2.py (the re-design of the
reference ``LDPCBPDecoder`` in syndrome mode,
/root/reference/sionna/fec/ldpc/decoding.py:15-1048): logit inputs are
negated into "true" LLRs and clipped to +-20 on entry, the syndrome sign
multiplies the CN product, and outputs are marginal logits.

Eval-only (no weighted-BP / EXIT tracking — those live on the XLA path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.qc import QCGraphSpec
from .bp4_qc import _cn_update, _pad_l, _roll_left
from .cn_update import LLR_MAX

__all__ = ["bp2_qc_logits"]


def _make_kernel(spec: QCGraphSpec, num_iter, cn_type, factor, use_pltpu=True):
    l = spec.l
    nb = spec.nb

    def kernel(llr_ref, syn_ref, out_ref):
        llr = llr_ref[:]  # [nb, l_pad, Bt] "true" llrs (pre-negated)
        syn = 1.0 - 2.0 * syn_ref[:]  # [mb, l_pad, Bt]
        bt = llr.shape[-1]
        l_pad = llr.shape[-2]

        def body(_, msg):
            # VN frame + per-VN totals
            v = [_roll_left(msg[g], s, l, use_pltpu) for g, (_, _, s) in enumerate(spec.groups)]
            new = []
            for j in range(nb):
                tot = llr[j]
                for g in spec.vn_groups[j]:
                    tot = tot + v[g]
                for g in spec.vn_groups[j]:
                    i2, _, s = spec.groups[g]
                    new.append((g, _roll_left(tot - v[g], l - s, l, use_pltpu)))
            new_cn = [None] * spec.num_groups
            for g, plane in new:
                new_cn[g] = plane
            out = _cn_update(spec, new_cn, syn, cn_type, factor)
            return jnp.stack(out, axis=0)

        init = jnp.zeros((spec.num_groups, l_pad, bt), jnp.float32)
        msg = jax.lax.fori_loop(0, num_iter, body, init)

        v = [_roll_left(msg[g], s, l, use_pltpu) for g, (_, _, s) in enumerate(spec.groups)]
        for j in range(nb):
            tot = llr[j]
            for g in spec.vn_groups[j]:
                tot = tot + v[g]
            out_ref[j] = tot

    return kernel


def bp2_qc_logits(
    spec: QCGraphSpec,
    llr_ch,
    syndrome,
    num_iter: int,
    cn_type: str = "boxplus-phi",
    normalization_factor: float = 1.0,
    batch_tile: int = 128,
    interpret: bool | None = None,
):
    """Run the fused QC BP2 kernel.

    Args:
      llr_ch: [n, B] channel LOGITS (positive = bit 1), n = spec.nb * spec.l.
      syndrome: [m, B] in {0,1}, m = spec.mb * spec.l.
    Returns marginal logits [n, B] (same convention as bp2_decode).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    l, nb, mb = spec.l, spec.nb, spec.mb
    l_pad = _pad_l(l)
    n = nb * l
    b = llr_ch.shape[-1]
    assert llr_ch.shape == (n, b), llr_ch.shape

    bt = min(batch_tile, b)
    b_pad = -(-b // bt) * bt
    if b_pad != b:
        llr_ch = jnp.pad(llr_ch, [(0, 0), (0, b_pad - b)])
        syndrome = jnp.pad(syndrome, [(0, 0), (0, b_pad - b)])

    # logits -> "true" llrs, clipped (decoding.py:918-940)
    llr = -jnp.clip(llr_ch.astype(jnp.float32), -LLR_MAX, LLR_MAX)

    def planes(x, blocks):
        x = x.reshape(blocks, l, b_pad)
        return jnp.pad(x, [(0, 0), (0, l_pad - l), (0, 0)])

    llr_b = planes(llr, nb)
    syn_b = planes(syndrome.astype(jnp.float32), mb)

    kernel = _make_kernel(
        spec, num_iter, cn_type, float(normalization_factor), use_pltpu=not interpret
    )
    vma = (getattr(jax.typeof(llr_b), "vma", None) or frozenset()) | (
        getattr(jax.typeof(syn_b), "vma", None) or frozenset()
    )
    kw = {"vma": vma} if vma else {}
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, l_pad, b_pad), jnp.float32, **kw),
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((nb, l_pad, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, l_pad, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, l_pad, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(llr_b, syn_b)

    marg = out[:, :l, :].reshape(n, b_pad)[:, :b]
    return -marg  # back to the logit convention (decoding.py:1031)
