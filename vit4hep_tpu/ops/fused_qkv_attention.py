"""Model-native-layout attention: one Pallas kernel from qkv-Dense to merge.

TPU-native replacement for the reference's fused attention backends (torch
SDPA, nn/vit.py:431-438; xformers memory_efficient_attention, nn/vit.py:
440-449), shaped by two round-2 measurements (BASELINE.md):

1. The one-shot VMEM kernel (ops/vmem_attention.py) beats XLA decisively on
   isolated (B, H, N, D) inputs at ds3 shapes (4.0 vs 7.3 ms) but LOSES
   end-to-end (35.2 vs 38.7 showers/s): a ``pallas_call`` is a fusion
   barrier, so the (B, N, 3, H, D) -> (B, H, N, D) transposes around it
   materialize ~7 ms of layout copies that XLA's fused attention folds away.
2. Round-1 profiling found 13% of sampler device time is XLA normalizing the
   qkv Dense output (1440 lanes) into (3, H, 80)-tiles even on the pure-XLA
   path.

This kernel therefore consumes the qkv Dense output DIRECTLY in its native
(B, N, 3*H*D) layout — flattened [qkv, head, dim] on the last axis — and
writes the merged (B, N, H*D) context ready for the out-projection. No
transpose, no retile, no separated (B, H, N, D) tensors anywhere: each grid
cell DMAs one batch element's contiguous (N, 3HD) panel, slices per-head
q/k/v in VMEM (static lane slices), and runs the full softmax(QK^T)V per
head with the (N, N) scores never touching HBM.

Matmuls run as bf16 multiplicands with f32 accumulation — XLA's own
default-precision f32 matmul mode on TPU.

Measured in the full Attention-module context (qkv/out Dense included,
v5e, tools/attn_bench.py): 5.02 vs 9.57 ms XLA at ds3 (B=256, N=450) and
1.20 vs 1.85 ms at ds2 (N=135); wins from ~128 tokens. The (N, 3HD) panel
outgrows a comfortable VMEM budget above ~1024 tokens — ``auto`` dispatch
(ops/attention.py) hands longer sequences to the flash kernel.

The backward is a second fused-layout kernel: per batch cell it rebuilds
each head's probabilities from the saved log-sum-exp and runs the standard
5-matmul softmax-attention VJP entirely in VMEM, emitting the (N, 3HD)
dqkv panel in the qkv Dense's native layout — like the forward, the (N, N)
score/probability/grad tensors never touch HBM, and both ends of the
backward meet the surrounding Dense VJPs with no transposes. (A plain-XLA
einsum backward was measured first: it cost ds2 training −5% — the QK^T
recompute and materialized probabilities without the fwd's layout savings —
while this kernel turns both train steps into wins; BASELINE.md round 2.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit4hep_tpu.ops.pallas_utils import interpret as _interpret

_NEG_INF = -1e30


def _fused_kernel(qkv_ref, o_ref, lse_ref, *, num_heads, head_dim, scale, mm_dtype):
    _fused_kernel_masked(
        qkv_ref, None, o_ref, lse_ref,
        num_heads=num_heads, head_dim=head_dim, scale=scale, mm_dtype=mm_dtype,
    )


def _fused_kernel_masked(
    qkv_ref, mask_ref, o_ref, lse_ref, *, num_heads, head_dim, scale, mm_dtype
):
    x = qkv_ref[0]  # (N, 3*H*D), input dtype
    h_tot, d = num_heads, head_dim
    for h in range(h_tot):
        q = x[:, h * d:(h + 1) * d]
        k = x[:, (h_tot + h) * d:(h_tot + h + 1) * d]
        v = x[:, (2 * h_tot + h) * d:(2 * h_tot + h + 1) * d]
        s = jax.lax.dot_general(
            q.astype(mm_dtype), k.astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (N, N)
        if mask_ref is not None:
            s = jnp.where(mask_ref[0], s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(mm_dtype), v.astype(mm_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, :, h * d:(h + 1) * d] = (o / l_safe).astype(o_ref.dtype)
        lse_ref[0, h, :] = (m + jnp.log(l_safe))[:, 0]


def _packed_kernel(qkv_ref, o_ref, lse_ref, *, num_heads, head_dim, scale,
                   mm_dtype):
    _packed_kernel_masked(
        qkv_ref, None, o_ref, lse_ref,
        num_heads=num_heads, head_dim=head_dim, scale=scale, mm_dtype=mm_dtype,
    )


def packed_attn_core(x, mask, *, num_heads, head_dim, scale, mm_dtype):
    """Head-packed attention core for small head dims: ALL heads' scores in
    one (H*N, N) matmul against a block-diagonal Q, then one (H*N, HD) PV
    matmul, instead of 2*H tiny per-head matmuls. Shared VMEM-value math of
    :func:`_packed_kernel_masked` and the DiT megakernel's ``_attn_merged``
    (ops/fused_dit_block.py) — keep the Mosaic-proven op sequence in ONE
    place.

    At head_dim < 128 the per-head path starves the MXU (d pads to 128
    lanes) and pays 2*H matmul setups per grid cell — profiled 0.49 ms/call
    at the ds2-cINN subnet shape (N=135, H=4, d=48), ~10x above the
    combined MXU+VPU floor. Packing trades H-fold zero-block FLOPs (dense
    MXU work) for op-count: S[h*N+i, j] = sum_d QBD[h*N+i, d] * K[j, d]
    with QBD = vertically tiled Q masked block-diagonally (row block h
    keeps only head h's columns), so the contraction runs over the FULL
    H*D lanes; the PV product likewise computes (H*N, HD) and keeps the
    (h, h) diagonal blocks. Exact: the off-block contributions are zeros
    added in f32 accumulation.

    x: (N, 3*H*D) qkv panel; mask: optional (N, N) bool. Returns
    (o, m, l_safe): the NORMALIZED (H*N, HD) PV product whose (h, h)
    diagonal blocks are the per-head contexts, plus the softmax row max
    and safe row sum for LSE reconstruction."""
    h_tot, d = num_heads, head_dim
    n = x.shape[0]
    hd = h_tot * d
    q = x[:, :hd]
    k = x[:, hd : 2 * hd]
    v = x[:, 2 * hd :]

    qt = jnp.concatenate([q] * h_tot, axis=0)  # (H*N, HD)
    rowblk = jax.lax.broadcasted_iota(jnp.int32, (h_tot * n, hd), 0) // n
    colblk = jax.lax.broadcasted_iota(jnp.int32, (h_tot * n, hd), 1) // d
    qbd = jnp.where(rowblk == colblk, qt, 0.0)

    s = jax.lax.dot_general(
        qbd.astype(mm_dtype), k.astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (H*N, N)
    if mask is not None:
        s = jnp.where(jnp.concatenate([mask] * h_tot, axis=0), s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(mm_dtype), v.astype(mm_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H*N, HD); row block h's valid columns are head h's
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return o / l_safe, m, l_safe


def _packed_kernel_masked(
    qkv_ref, mask_ref, o_ref, lse_ref, *, num_heads, head_dim, scale, mm_dtype
):
    """Head-packed forward kernel: :func:`packed_attn_core` + per-head
    diagonal-block stores (ref stores tolerate the unaligned offsets that a
    vector concat of the same slices would not)."""
    h_tot, d = num_heads, head_dim
    n = qkv_ref.shape[1]
    o, m, l_safe = packed_attn_core(
        qkv_ref[0], None if mask_ref is None else mask_ref[0],
        num_heads=num_heads, head_dim=head_dim, scale=scale,
        mm_dtype=mm_dtype,
    )
    lse = m + jnp.log(l_safe)
    for h in range(h_tot):
        o_ref[0, :, h * d:(h + 1) * d] = (
            o[h * n:(h + 1) * n, h * d:(h + 1) * d].astype(o_ref.dtype)
        )
        lse_ref[0, h, :] = lse[h * n:(h + 1) * n, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def fused_qkv_attention(qkv, num_heads, mask=None, scale=None):
    """Attention straight from the qkv projection's native layout.

    qkv: (B, N, 3*H*D) — the qkv Dense output, last axis ordered
    [q/k/v, head, dim]. Returns the merged (B, N, H*D) context. ``mask`` is
    an optional shared boolean (N, N), True = attend. ``scale`` overrides
    the 1/sqrt(D) logit scale.
    """
    out, _ = _fused_fwd(qkv, num_heads, mask, scale)
    return out


def _fused_fwd(qkv, num_heads, mask, scale=None):
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads
    if 3 * num_heads * d != three_hd:
        raise ValueError(f"qkv last dim {three_hd} != 3*{num_heads}*head_dim")

    in_specs = [pl.BlockSpec((1, n, three_hd), lambda i: (i, 0, 0))]
    args = [qkv]
    if mask is not None:
        if mask.ndim != 2:
            raise ValueError("fused_qkv_attention supports a shared (N, N) mask")
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])

    # head-packed forward below 128-lane head panels (see _packed_kernel):
    # one block-diag score matmul + one PV matmul instead of 2*H starved
    # per-head matmuls. d=80 (ds2/ds3 flagships) keeps the per-head loop —
    # its 1.6x lane pad beats the H-fold packed-score FLOPs at H=6.
    packed = d <= 64
    if packed:
        kfn = _packed_kernel_masked if mask is not None else _packed_kernel
    else:
        kfn = _fused_kernel_masked if mask is not None else _fused_kernel
    kernel = functools.partial(
        kfn,
        num_heads=num_heads,
        head_dim=d,
        scale=d**-0.5 if scale is None else scale,
        mm_dtype=jnp.float32 if _interpret() else jnp.bfloat16,
    )
    # VMEM budget: the (N, 3HD) panel + (N, HD) output (double-buffered) plus
    # the f32 scores, exp output, and their bf16 casts — (H*N, N) score rows
    # in the packed mode, (N, N) per head otherwise. Packed mode also
    # materializes the (H*N, HD) qt/qbd tiles and PV output (+bf16 casts)
    # that the per-head loop never holds. v5e has 128M.
    panel = 4 * n * (3 * hd + hd) * 2
    scores = 10 * n * n * (num_heads if packed else 1)
    packed_panels = 14 * num_heads * n * hd if packed else 0
    vmem = min(128 * 1024 * 1024,
               max(32 * 1024 * 1024, 2 * panel + 2 * scores + packed_panels))
    out, lse = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, num_heads, n), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, num_heads, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*args)
    return out, (qkv, mask, lse)


def _bwd_kernel(qkv_ref, g_ref, lse_ref, o_ref, *, num_heads, head_dim, scale,
                mm_dtype):
    _bwd_kernel_masked(
        qkv_ref, g_ref, lse_ref, None, o_ref,
        num_heads=num_heads, head_dim=head_dim, scale=scale, mm_dtype=mm_dtype,
    )


def _bwd_kernel_masked(
    qkv_ref, g_ref, lse_ref, mask_ref, o_ref, *, num_heads, head_dim, scale,
    mm_dtype
):
    """Fused-layout attention backward: dqkv panel from the qkv panel, the
    upstream (N, HD) gradient, and the forward's per-head log-sum-exp — the
    standard 5-matmul softmax-attention VJP per head, probabilities rebuilt
    and consumed entirely in VMEM (the (N, N) score/grad tensors never touch
    HBM, mirroring the forward)."""
    x = qkv_ref[0]  # (N, 3*H*D)
    gout = g_ref[0]  # (N, H*D)
    h_tot, d = num_heads, head_dim

    def mm(a, b_, dims):
        return jax.lax.dot_general(
            a.astype(mm_dtype), b_.astype(mm_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    for h in range(h_tot):
        q = x[:, h * d:(h + 1) * d]
        k = x[:, (h_tot + h) * d:(h_tot + h + 1) * d]
        v = x[:, (2 * h_tot + h) * d:(2 * h_tot + h + 1) * d]
        gh = gout[:, h * d:(h + 1) * d]
        s = mm(q, k, ((1,), (1,))) * scale  # (N, M)
        if mask_ref is not None:
            s = jnp.where(mask_ref[0], s, _NEG_INF)
        p = jnp.exp(s - lse_ref[0, h, :][:, None])  # masked entries -> 0
        dv = mm(p, gh, ((0,), (0,)))  # (M, D)
        dp = mm(gh, v, ((1,), (1,)))  # (N, M)
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))) * scale
        dq = mm(ds, k, ((1,), (0,)))
        dk = mm(ds, q, ((0,), (0,)))
        o_ref[0, :, h * d:(h + 1) * d] = dq.astype(o_ref.dtype)
        o_ref[0, :, (h_tot + h) * d:(h_tot + h + 1) * d] = dk.astype(o_ref.dtype)
        o_ref[0, :, (2 * h_tot + h) * d:(2 * h_tot + h + 1) * d] = dv.astype(
            o_ref.dtype
        )


def _fused_bwd(num_heads, scale, res, g):
    qkv, mask, lse = res
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads

    in_specs = [
        pl.BlockSpec((1, n, three_hd), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, num_heads, n), lambda i: (i, 0, 0)),
    ]
    args = [qkv, g, lse]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])

    kernel = functools.partial(
        _bwd_kernel_masked if mask is not None else _bwd_kernel,
        num_heads=num_heads,
        head_dim=d,
        scale=d**-0.5 if scale is None else scale,
        mm_dtype=jnp.float32 if _interpret() else jnp.bfloat16,
    )
    # working set: qkv + dqkv + g panels (double-buffered) plus one head's
    # f32 s/p/dp blocks and their bf16 casts
    panel = 4 * n * (2 * 3 * hd + hd) * 2
    scores = 16 * n * n
    vmem = min(128 * 1024 * 1024, max(32 * 1024 * 1024, 2 * panel + 2 * scores))
    dqkv = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, three_hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, three_hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*args)
    return dqkv, None


fused_qkv_attention.defvjp(_fused_fwd, _fused_bwd)
