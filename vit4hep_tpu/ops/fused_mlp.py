"""Fused adaLN-MLP half of the DiT block as one Pallas TPU kernel.

The XLA version of ``x + gate * MLP(modulate(LN(x), shift, scale))`` makes
an HBM round trip over the (B, T, 4H) hidden tensor (matmul cannot fuse into
matmul). This kernel streams groups of batch elements through VMEM instead:
LayerNorm (no affine), adaLN modulation, the two matmuls with GELU, the gate
and the residual — one read of x, one write of y, weights resident.

Measured on v5e at the ds2 headline shape (256x135x480, RK4 sampling): the
kernel reaches 163 showers/s vs 182 showers/s for the unfused XLA path —
the block is compute/VPU-bound there, not HBM-bound, so saving the hidden
round trip does not pay for the in-kernel f32 materialisations. It is
therefore OPT-IN (``fused_mlp`` in ViTParams, default False); the win case
is long sequences / low arithmetic-intensity regimes where the (B, T, 4H)
traffic dominates.

Forward-only as a kernel; the backward pass is the VJP of the numerically
identical pure-jnp reference (:func:`mlp_half_reference`), so training works
unchanged while sampling gets the fused path.

Shapes: x (B, T, H); shift/scale/gate (B, H); w1 (H, F), b1 (F), w2 (F, H),
b2 (H). T is padded to a multiple of 8 inside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from vit4hep_tpu.ops.pallas_utils import interpret as _interpret
from vit4hep_tpu.ops.pallas_utils import round_up as _round_up


def mlp_half_reference(x, shift, scale, gate, w1, b1, w2, b2):
    """Pure-jnp reference (the unfused math of DiTBlock's MLP half)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    u = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    h = u * (1 + scale[:, None, :]) + shift[:, None, :]
    h = jnp.dot(h, w1) + b1
    h = jax.nn.gelu(h, approximate=True)
    h = jnp.dot(h, w2) + b2
    return x + gate[:, None, :] * h


def _kernel(x_ref, mod_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            f_chunks, mm_dtype):
    """One grid step processes G batch elements' tokens at once.

    x_ref:  (G, T_pad, H) -> rows = G*T_pad for the matmuls
    mod_ref: (G, 3, H)    -> per-element modulation via (G, 1, H) broadcast
                             (no materialised (rows, H) repeat: VMEM stack)
    The hidden dim is processed in ``f_chunks`` column chunks so the
    (rows, F) intermediate never exceeds the VMEM budget. Matmuls run with
    ``mm_dtype`` (bf16 on TPU) multiplicands and f32 accumulation — XLA's
    own default-precision f32 matmul mode, at full MXU rate instead of the
    multi-pass f32 mode (the round-1 f32-dot version of this kernel lost to
    XLA for exactly that reason).
    """
    g, t, hdim = x_ref.shape
    rows = g * t
    x = x_ref[...].astype(jnp.float32)  # (G, T, H)
    mod = mod_ref[...].astype(jnp.float32)  # (G, 3, H)

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    u = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    h_in = (u * (1.0 + mod[:, 1:2, :]) + mod[:, 0:1, :]).reshape(rows, hdim)
    h_in = h_in.astype(mm_dtype)

    fdim = w1_ref.shape[1]
    chunk = fdim // f_chunks
    acc = jnp.zeros((rows, hdim), jnp.float32)
    for ci in range(f_chunks):
        sl = pl.ds(ci * chunk, chunk)
        hc = jnp.dot(h_in, w1_ref[:, sl].astype(mm_dtype),
                     preferred_element_type=jnp.float32)
        hc = hc + b1_ref[sl][None, :]
        hc = jax.nn.gelu(hc, approximate=True)
        acc = acc + jnp.dot(hc.astype(mm_dtype), w2_ref[sl, :].astype(mm_dtype),
                            preferred_element_type=jnp.float32)
    acc = (acc + b2_ref[...][None, :]).reshape(g, t, hdim)
    o_ref[...] = (x + mod[:, 2:3, :] * acc).astype(o_ref.dtype)


def _fused_forward(x, shift, scale, gate, w1, b1, w2, b2, group=None,
                   f_chunks=1):
    b, t, hdim = x.shape
    fdim = w1.shape[1]
    if fdim % f_chunks:
        raise ValueError(
            f"f_chunks ({f_chunks}) must divide the hidden dim ({fdim}) — the "
            "kernel's column chunks would silently drop the remainder"
        )
    t_pad = _round_up(t, 8)
    if group is None:
        # keep the (group * t_pad, F) f32 intermediate (+ bf16 casts and
        # double-buffered x/out panels) inside the 100M budget: 2176 rows
        # is the measured sweet spot at ds2 (group=16 x t_pad=136, padding
        # nothing at batch 256) and caps the footprint at longer sequences
        # (ds3 t_pad=456 -> group 4, where group=16 exceeded scoped VMEM
        # and failed to compile)
        group = max(1, 2176 // t_pad)
    b_pad = _round_up(b, group)
    xp = jnp.pad(x, [(0, b_pad - b), (0, t_pad - t), (0, 0)])
    mod = jnp.stack([shift, scale, gate], axis=1)  # (B, 3, H)
    mod = jnp.pad(mod, [(0, b_pad - b), (0, 0), (0, 0)])

    out = pl.pallas_call(
        functools.partial(
            _kernel, f_chunks=f_chunks,
            mm_dtype=jnp.float32 if _interpret() else jnp.bfloat16,
        ),
        grid=(b_pad // group,),
        in_specs=[
            pl.BlockSpec((group, t_pad, hdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, 3, hdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((hdim, fdim), lambda i: (0, 0)),
            pl.BlockSpec((fdim,), lambda i: (0,)),
            pl.BlockSpec((fdim, hdim), lambda i: (0, 0)),
            pl.BlockSpec((hdim,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((group, t_pad, hdim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad, hdim), x.dtype),
        # the (rows, F/f_chunks) intermediates need more than the 16M default
        # scoped-VMEM budget; a v5e core has 128M of VMEM.
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, mod, w1, b1, w2, b2)
    return out[:b, :t, :]


@jax.custom_vjp
def fused_mlp_half(x, shift, scale, gate, w1, b1, w2, b2):
    return _fused_forward(x, shift, scale, gate, w1, b1, w2, b2)


def _fwd(x, shift, scale, gate, w1, b1, w2, b2):
    out = _fused_forward(x, shift, scale, gate, w1, b1, w2, b2)
    return out, (x, shift, scale, gate, w1, b1, w2, b2)


def _bwd(res, g):
    # backward through the identical pure-jnp math (XLA handles it well)
    _, vjp = jax.vjp(mlp_half_reference, *res)
    return vjp(g)


fused_mlp_half.defvjp(_fwd, _bwd)
