"""One-shot VMEM-resident attention Pallas kernel for short/medium sequences.

TPU-native replacement for the reference's fused attention backends (torch
SDPA, nn/vit.py:431-438; xformers memory_efficient_attention,
nn/vit.py:440-449), specialized for the shipped CaloChallenge sequence
lengths (88-606 tokens), where the roofline (BASELINE.md, round 2) shows the
XLA path is HBM-bound on ~5 traversals of the materialized (B, H, N, N)
score tensor (softmax max/exp/sum/divide passes).

Unlike the FlashAttention-2 kernel (ops/flash_attention.py), which tiles the
key axis and pays online-softmax rescaling per block, this kernel gives each
(batch x head) grid cell its FULL K/V panel and computes the entire (N, N)
score block, its softmax, and the PV product in VMEM — the scores never touch
HBM, and the softmax is a single max/exp/sum over resident data. At ds3
shapes (N=450, D=80) the whole working set is ~4 MB, far under the 64-128 MB
of VMEM per core; the `auto` dispatch in ops/attention.py bounds it by
score-block size.

Matmul precision: inputs are cast to bfloat16 with float32 accumulation —
exactly what XLA does for float32 matmuls at default precision on TPU, so
numerics match the XLA path to within its own rounding.

The backward pass is a matching one-shot kernel that rebuilds the
probabilities as exp(s - lse) with the SAME matmul precision as the
forward (bf16 multiplicands on TPU), so p is exactly the forward's own
softmax — reusing an f32-recompute backward (the flash kernels) against a
bf16-logit lse would yield biased, unnormalized probabilities.

Shapes: q, k, v are (B, H, N, D); optional shared boolean (N, N) mask
(True = attend); output (B, H, N, D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit4hep_tpu.ops.pallas_utils import interpret as _interpret

_NEG_INF = -1e30


def _oneshot_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale, mm_dtype):
    q = q_ref[0]  # (N, D), input dtype
    k = k_ref[0]
    v = v_ref[0]
    # mm_dtype is bf16 on TPU: bf16 multiplicands + f32 accumulation == XLA's
    # default-precision f32 matmul, and keeps the MXU at full rate instead of
    # the multi-pass f32 mode. Interpret mode (CPU tests) keeps f32, matching
    # what XLA does on that backend.
    s = jax.lax.dot_general(
        q.astype(mm_dtype),
        k.astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (N, N)
    if mask_ref is not None:
        s = jnp.where(mask_ref[0], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(mm_dtype),
        v.astype(mm_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (o / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)


def _oneshot_kernel_nomask(q_ref, k_ref, v_ref, o_ref, lse_ref, **kw):
    _oneshot_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref, **kw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def vmem_attention(q, k, v, mask=None, scale=None):
    """One-shot VMEM-resident attention. q, k, v: (B, H, N, D).

    ``scale`` overrides the 1/sqrt(D) logit scale (used when D is zero-padded
    to the lane width and the true head dim is smaller)."""
    out, _ = _vmem_fwd(q, k, v, mask, scale)
    return out


def _vmem_fwd(q, k, v, mask, scale=None):
    b, h, n, d = q.shape
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)

    in_specs = [pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))] * 3
    args = [qf, kf, vf]
    if mask is not None:
        if mask.ndim != 2:
            raise ValueError("vmem_attention supports a shared (N, N) mask")
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])

    kernel = functools.partial(
        _oneshot_kernel if mask is not None else _oneshot_kernel_nomask,
        scale=d**-0.5 if scale is None else scale,
        mm_dtype=jnp.float32 if _interpret() else jnp.bfloat16,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the (N, N) f32 score block + its bf16 copy + exp output exceed
            # the 16 MB default scoped-VMEM budget for N >~ 1100; v5e/v5p
            # have 128 MB. ~10 n^2 bytes covers s, p, and their bf16 casts
            # with headroom; panels add ~8 n d.
            vmem_limit_bytes=min(
                128 * 1024 * 1024,
                max(32 * 1024 * 1024, 10 * n * n * 4 + 16 * n * d * 4),
            ),
        ),
        interpret=_interpret(),
    )(*args)
    o = out.reshape(b, h, n, d)
    return o, (q, k, v, mask, o, lse)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, mask_ref, dq_ref, dk_ref,
                dv_ref, *, scale, mm_dtype):
    """One-shot backward matching the forward's matmul precision: the
    probabilities are rebuilt as exp(s_bf16 - lse) with the SAME bf16
    logits the forward produced, so p is the forward's own softmax (the
    earlier flash-bwd reuse recomputed the scores in f32, giving biased,
    unnormalized probabilities against a bf16-logit lse)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)

    def mm(a, b_, dims):
        return jax.lax.dot_general(
            a.astype(mm_dtype), b_.astype(mm_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    s = mm(q, k, ((1,), (1,))) * scale
    if mask_ref is not None:
        s = jnp.where(mask_ref[0], s, _NEG_INF)
    p = jnp.exp(s - lse_ref[0])  # (N, M); masked entries -> 0
    dv_ref[0] = mm(p, g, ((0,), (0,))).astype(dv_ref.dtype)
    dp = mm(g, v, ((1,), (1,)))
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))) * scale
    dq_ref[0] = mm(ds, k, ((1,), (0,))).astype(dq_ref.dtype)
    dk_ref[0] = mm(ds, q, ((0,), (0,))).astype(dk_ref.dtype)


def _bwd_kernel_nomask(q_ref, k_ref, v_ref, g_ref, lse_ref, *out_refs, **kw):
    _bwd_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, None, *out_refs, **kw)


def _vmem_bwd(scale, res, g):
    q, k, v, mask, o, lse = res
    b, h, n, d = q.shape
    bh = b * h
    qf, kf, vf = (t.reshape(bh, n, d) for t in (q, k, v))
    gf = g.reshape(bh, n, d)

    in_specs = [pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))] * 4 + [
        pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0))
    ]
    args = [qf, kf, vf, gf, lse]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])

    kernel = functools.partial(
        _bwd_kernel if mask is not None else _bwd_kernel_nomask,
        scale=d**-0.5 if scale is None else scale,
        mm_dtype=jnp.float32 if _interpret() else jnp.bfloat16,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))] * 3,
        out_shape=[jax.ShapeDtypeStruct((bh, n, d), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=min(
                128 * 1024 * 1024,
                max(32 * 1024 * 1024, 14 * n * n * 4 + 28 * n * d * 4),
            ),
        ),
        interpret=_interpret(),
    )(*args)
    dq, dk, dv = (t.reshape(b, h, n, d) for t in outs)
    return dq, dk, dv, None


vmem_attention.defvjp(_vmem_fwd, _vmem_bwd)
