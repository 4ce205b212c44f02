"""Fused adaLN-MLP half of the DiT block as one Pallas TPU kernel.

The XLA version of ``x + gate * MLP(modulate(LN(x), shift, scale))`` makes
several HBM round trips over the (B, T, H) activation plus the (B, T, 4H)
hidden tensor. This kernel keeps everything for one batch element's tokens in
VMEM: LayerNorm (no affine), adaLN modulation, the two matmuls with GELU, the
gate and the residual — one read of x, one write of y.

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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(n, m):
    return ((n + m - 1) // m) * m


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


def _kernel(x_ref, mod_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, hidden):
    x = x_ref[0].astype(jnp.float32)  # (T_pad, H)
    mod = mod_ref[0].astype(jnp.float32)  # (3, H): shift, scale, gate
    shift, scale, gate = mod[0], mod[1], mod[2]

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    u = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    h = u * (1.0 + scale)[None, :] + shift[None, :]

    h = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[...]
    h = jax.nn.gelu(h, approximate=True)
    h = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32) + b2_ref[...]
    o_ref[0] = (x + gate[None, :] * h).astype(o_ref.dtype)


def _fused_forward(x, shift, scale, gate, w1, b1, w2, b2):
    b, t, hdim = x.shape
    fdim = w1.shape[1]
    t_pad = _round_up(t, 8)
    xp = jnp.pad(x, [(0, 0), (0, t_pad - t), (0, 0)])
    mod = jnp.stack([shift, scale, gate], axis=1)  # (B, 3, H)

    out = pl.pallas_call(
        functools.partial(_kernel, hidden=fdim),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_pad, hdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 3, hdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((hdim, fdim), lambda i: (0, 0)),
            pl.BlockSpec((fdim,), lambda i: (0,)),
            pl.BlockSpec((fdim, hdim), lambda i: (0, 0)),
            pl.BlockSpec((hdim,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, t_pad, hdim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, hdim), x.dtype),
        interpret=_interpret(),
    )(xp, mod, w1, b1, w2, b2)
    return out[:, :t, :]


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
