"""Fused-layout flash attention: online softmax straight off the qkv panel.

The beyond-VMEM tier of ``qkv_attention`` (ops/attention.py). The round-1
flash kernel (ops/flash_attention.py) predates every later kernel lesson:
it consumes separated (B, H, N, D) tensors — so the model pays materialized
transposes at the pallas_call fusion barrier — and streams K/V from HBM per
(batch, head) grid cell in f32. This kernel applies the round-2/3 lessons
(VERDICT r3 next #5):

- **native layout**: consumes the qkv Dense output as rows of the
  (B, N, 3*H*D) panel and emits the merged (B, N, H*D) context — the only
  host-side prep is a contiguous column slice of the q third (no
  transposes; at flash sequence lengths the O(N) slice is noise against
  the O(N^2) attention work).
- **resident K/V panel**: the whole (N_pad, 3HD) panel rides VMEM-resident
  per batch element in bf16 (the matmul dtype — halves residency), fetched
  ONCE per element; the grid's query-block axis revisits it. HBM sees the
  panel once, not once per head.
- **in-kernel head loop** with per-head online softmax over key blocks:
  scores never exceed (block_q, block_k), so sequence length is bounded by
  the panel residency (~16k tokens at hidden 480 in bf16), not by N^2.

Backward is the FlashAttention-2 split in the same layout: a dQ kernel
(grid over query blocks) and a dKV kernel (grid over key blocks), both
recomputing p from the resident panel + saved per-head LSE, emitting the
merged (B, N, 3HD) cotangent via one column concat.

All stores write full blocks once (per-head results are concatenated in
VMEM values first — single-lane column stores trip Mosaic); the per-head
LSE/delta stats ride (block, H) tiles and are value-sliced per head.

Replaces the xformers memory_efficient_attention role of the reference
(nn/vit.py:440-449). Shapes: qkv (B, N, 3*H*D); optional shared boolean
(N, N) mask (True = attend); returns (B, N, H*D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit4hep_tpu.ops.pallas_utils import interpret as _interpret
from vit4hep_tpu.ops.pallas_utils import round_up as _round_up

_NEG_INF = -1e30


def _mm(a, b, dims, mm_dtype):
    return jax.lax.dot_general(
        a.astype(mm_dtype), b.astype(mm_dtype), (dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, panel_ref, mask_ref, o_ref, lse_ref, *, num_heads,
                head_dim, scale, n_real, block_k, mm_dtype):
    h_tot, d = num_heads, head_dim
    block_q = q_ref.shape[1]
    n_pad = panel_ref.shape[1]
    num_kb = n_pad // block_k

    ctxs, lses = [], []
    for hi in range(h_tot):
        q = q_ref[0, :, hi * d:(hi + 1) * d].astype(jnp.float32)

        def body(kb, carry, hi=hi):
            acc, m_i, l_i = carry
            k_blk = panel_ref[0, pl.ds(kb * block_k, block_k),
                              (h_tot + hi) * d:(h_tot + hi + 1) * d]
            v_blk = panel_ref[0, pl.ds(kb * block_k, block_k),
                              (2 * h_tot + hi) * d:(2 * h_tot + hi + 1) * d]
            s = _mm(q, k_blk, ((1,), (1,)), mm_dtype) * scale
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            valid = col < n_real
            if mask_ref is not None:
                valid = jnp.logical_and(
                    valid, mask_ref[0, :, pl.ds(kb * block_k, block_k)])
            s = jnp.where(valid, s, _NEG_INF)
            m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
            # zero the PAD columns explicitly: on a fully-masked row every
            # s equals _NEG_INF, so exp(s - m_new) = 1 everywhere including
            # the zero-padding — the pad guard keeps the degenerate row's
            # output the uniform mean over the n_real columns, bit-matching
            # the XLA / fused tiers (which see no padding)
            p = jnp.where(col < n_real, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_i - m_new)
            l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + _mm(p, v_blk, ((1,), (0,)), mm_dtype)
            return acc, m_new, l_new

        acc, m_i, l_i = jax.lax.fori_loop(
            0, num_kb, body,
            (jnp.zeros((block_q, d), jnp.float32),
             jnp.full((block_q, 1), _NEG_INF, jnp.float32),
             jnp.zeros((block_q, 1), jnp.float32)),
        )
        l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
        ctxs.append(acc / l_safe)
        lses.append(m_i + jnp.log(l_safe))
    o_ref[0] = jnp.concatenate(ctxs, axis=-1).astype(o_ref.dtype)
    lse_ref[0] = jnp.concatenate(lses, axis=-1).astype(lse_ref.dtype)


def _fwd_kernel_nomask(q_ref, panel_ref, o_ref, lse_ref, **kw):
    _fwd_kernel(q_ref, panel_ref, None, o_ref, lse_ref, **kw)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
def _bwd_dq_kernel(q_ref, panel_ref, do_ref, lse_ref, delta_ref, mask_ref,
                   dq_ref, *, num_heads, head_dim, scale, n_real, block_k,
                   mm_dtype):
    h_tot, d = num_heads, head_dim
    block_q = q_ref.shape[1]
    n_pad = panel_ref.shape[1]
    num_kb = n_pad // block_k
    lse_all = lse_ref[0]      # (BQ, H)
    delta_all = delta_ref[0]  # (BQ, H)

    dqs = []
    for hi in range(h_tot):
        q = q_ref[0, :, hi * d:(hi + 1) * d].astype(jnp.float32)
        do = do_ref[0, :, hi * d:(hi + 1) * d].astype(jnp.float32)
        lse = lse_all[:, hi:hi + 1]
        delta = delta_all[:, hi:hi + 1]

        def body(kb, dq, hi=hi, q=q, do=do, lse=lse, delta=delta):
            k_blk = panel_ref[0, pl.ds(kb * block_k, block_k),
                              (h_tot + hi) * d:(h_tot + hi + 1) * d]
            v_blk = panel_ref[0, pl.ds(kb * block_k, block_k),
                              (2 * h_tot + hi) * d:(2 * h_tot + hi + 1) * d]
            s = _mm(q, k_blk, ((1,), (1,)), mm_dtype) * scale
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            valid = col < n_real
            if mask_ref is not None:
                valid = jnp.logical_and(
                    valid, mask_ref[0, :, pl.ds(kb * block_k, block_k)])
            p = jnp.where(valid, jnp.exp(s - lse), 0.0)
            dp = _mm(do, v_blk, ((1,), (1,)), mm_dtype)
            ds = p * (dp - delta) * scale
            return dq + _mm(ds, k_blk, ((1,), (0,)), mm_dtype)

        dqs.append(jax.lax.fori_loop(
            0, num_kb, body, jnp.zeros((block_q, d), jnp.float32)))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)


def _bwd_dq_kernel_nomask(q_ref, panel_ref, do_ref, lse_ref, delta_ref,
                          dq_ref, **kw):
    _bwd_dq_kernel(q_ref, panel_ref, do_ref, lse_ref, delta_ref, None,
                   dq_ref, **kw)


def _bwd_dkv_kernel(kv_ref, q_ref, do_ref, lse_ref, delta_ref, mask_ref,
                    dkv_ref, *, num_heads, head_dim, scale, n_real, block_q,
                    mm_dtype):
    h_tot, d = num_heads, head_dim
    block_k = kv_ref.shape[1]
    n_pad = q_ref.shape[1]
    num_qb = n_pad // block_q
    kb = pl.program_id(1)

    dks, dvs = [], []
    for hi in range(h_tot):
        k_blk = kv_ref[0, :, (h_tot + hi) * d:(h_tot + hi + 1) * d] \
            .astype(jnp.float32)
        v_blk = kv_ref[0, :, (2 * h_tot + hi) * d:(2 * h_tot + hi + 1) * d] \
            .astype(jnp.float32)
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)

        def body(qb, carry, hi=hi, col=col, k_blk=k_blk, v_blk=v_blk):
            dk, dv = carry
            q = q_ref[0, pl.ds(qb * block_q, block_q),
                      hi * d:(hi + 1) * d].astype(jnp.float32)
            do = do_ref[0, pl.ds(qb * block_q, block_q),
                        hi * d:(hi + 1) * d].astype(jnp.float32)
            lse = lse_ref[0, pl.ds(qb * block_q, block_q), :][:, hi:hi + 1]
            delta = delta_ref[0, pl.ds(qb * block_q, block_q), :][:, hi:hi + 1]
            s = _mm(q, k_blk, ((1,), (1,)), mm_dtype) * scale
            valid = col < n_real
            if mask_ref is not None:
                valid = jnp.logical_and(
                    valid, mask_ref[0, pl.ds(qb * block_q, block_q), :])
            p = jnp.where(valid, jnp.exp(s - lse), 0.0)
            dv = dv + _mm(p, do, ((0,), (0,)), mm_dtype)
            dp = _mm(do, v_blk, ((1,), (1,)), mm_dtype)
            ds = p * (dp - delta) * scale
            dk = dk + _mm(ds, q, ((0,), (0,)), mm_dtype)
            return dk, dv

        dk, dv = jax.lax.fori_loop(
            0, num_qb, body,
            (jnp.zeros((block_k, d), jnp.float32),
             jnp.zeros((block_k, d), jnp.float32)),
        )
        dks.append(dk)
        dvs.append(dv)
    dkv_ref[0] = jnp.concatenate(dks + dvs, axis=-1).astype(dkv_ref.dtype)


def _bwd_dkv_kernel_nomask(kv_ref, q_ref, do_ref, lse_ref, delta_ref,
                           dkv_ref, **kw):
    _bwd_dkv_kernel(kv_ref, q_ref, do_ref, lse_ref, delta_ref, None,
                    dkv_ref, **kw)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------
def _prep(qkv, mask, block_q, block_k):
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    n_pad = _round_up(n, max(block_q, block_k))
    mm_dtype = jnp.float32 if _interpret() else jnp.bfloat16
    pad = [(0, 0), (0, n_pad - n), (0, 0)]
    q_part = jnp.pad(qkv[..., :hd], pad)                      # (B, Np, HD) f32
    panel = jnp.pad(qkv.astype(mm_dtype), pad)                # (B, Np, 3HD)
    mp = None
    if mask is not None:
        if mask.ndim != 2:
            raise ValueError("flash_qkv_attention supports a shared (N, N) mask")
        mp = jnp.pad(mask.astype(jnp.bool_),
                     [(0, n_pad - n), (0, n_pad - n)])[None]
    return q_part, panel, mp, n_pad, hd, mm_dtype


def _vmem_request(n_pad, hd, block_q, block_k, mm_dtype, extra=0):
    # 1.35x margin: the estimate undershot a measured 8192-token compile by
    # ~5% (double-buffered q/out/lse windows beyond the modeled set)
    panel = n_pad * 3 * hd * (4 if mm_dtype == jnp.float32 else 2)
    blocks = 4 * block_q * (2 * hd + 3 * hd) * 4 + 16 * block_q * block_k
    return int(1.35 * (panel + blocks + extra))


def _vmem_limit(n_pad, hd, block_q, block_k, mm_dtype, extra=0):
    return min(128 * 1024 * 1024,
               max(48 * 1024 * 1024,
                   _vmem_request(n_pad, hd, block_q, block_k, mm_dtype,
                                 extra)))


def flash_qkv_fits(n, hd, block_q=512, block_k=512, num_heads=0) -> bool:
    """Panel-residency bound of this kernel: the whole (N_pad, 3HD) bf16
    panel must ride VMEM (~16k tokens at hidden 480). The dispatcher
    (ops/attention.py) falls back to the streaming separated-layout flash
    kernel beyond it — that one compiles at any N."""
    bq = min(block_q, _round_up(n, 128))
    bk = min(block_k, _round_up(n, 128))
    n_pad = _round_up(n, max(bq, bk))
    # the backward's request is the larger one (adds do + q_part residency
    # plus the lse/delta panels) — the extra term here must stay identical
    # to _flash_qkv_bwd's so the bound can't under-admit near the boundary
    return _vmem_request(n_pad, hd, bq, bk, jnp.bfloat16,
                         extra=2 * n_pad * (hd + num_heads) * 4) \
        <= 128 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4, 5))
def flash_qkv_attention(qkv, num_heads, mask=None, scale=None, block_q=512,
                        block_k=512):
    """Merged (B, N, H*D) context from the (B, N, 3*H*D) qkv panel, online
    softmax over key blocks — the beyond-VMEM attention tier."""
    out, _ = _flash_qkv_fwd(qkv, num_heads, mask, scale, block_q, block_k)
    return out


def _block_sizes(n, block_q, block_k):
    bq = min(block_q, _round_up(n, 128))
    bk = min(block_k, _round_up(n, 128))
    return bq, bk


def _flash_qkv_fwd(qkv, num_heads, mask, scale, block_q, block_k):
    b, n, three_hd = qkv.shape
    block_q, block_k = _block_sizes(n, block_q, block_k)
    q_part, panel, mp, n_pad, hd, mm_dtype = _prep(qkv, mask, block_q, block_k)
    d = hd // num_heads
    scale_v = d ** -0.5 if scale is None else scale

    in_specs = [
        pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, n_pad, 3 * hd), lambda i, j: (i, 0, 0)),
    ]
    args = [q_part, panel]
    if mp is not None:
        in_specs.append(pl.BlockSpec((1, block_q, n_pad),
                                     lambda i, j: (0, j, 0)))
        args.append(mp)
    kernel = functools.partial(
        _fwd_kernel if mp is not None else _fwd_kernel_nomask,
        num_heads=num_heads, head_dim=d, scale=scale_v, n_real=n,
        block_k=block_k, mm_dtype=mm_dtype,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, n_pad // block_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, num_heads), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, n_pad, num_heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(n_pad, hd, block_q, block_k,
                                         mm_dtype),
        ),
        interpret=_interpret(),
    )(*args)
    return out[:, :n, :], (qkv, mask, out, lse)


def _flash_qkv_bwd(num_heads, scale, block_q, block_k, res, g):
    qkv, mask, o_pad, lse = res
    b, n, three_hd = qkv.shape
    block_q, block_k = _block_sizes(n, block_q, block_k)
    q_part, panel, mp, n_pad, hd, mm_dtype = _prep(qkv, mask, block_q, block_k)
    d = hd // num_heads
    scale_v = d ** -0.5 if scale is None else scale

    gp = jnp.pad(g, [(0, 0), (0, n_pad - n), (0, 0)])
    # delta per head: rowwise sum(dO_h * O_h) -> (B, Np, H)
    delta = jnp.sum(
        gp.astype(jnp.float32).reshape(b, n_pad, num_heads, d)
        * o_pad.astype(jnp.float32).reshape(b, n_pad, num_heads, d), axis=-1)

    common = dict(num_heads=num_heads, head_dim=d, scale=scale_v, n_real=n,
                  mm_dtype=mm_dtype)
    # extra residency in the backward: do + q_part (+ lse/delta) panels
    vmem = _vmem_limit(n_pad, hd, block_q, block_k, mm_dtype,
                       extra=2 * n_pad * (hd + num_heads) * 4)

    # dQ: grid over query blocks, panel resident
    dq_specs = [
        pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, n_pad, 3 * hd), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, block_q, num_heads), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, block_q, num_heads), lambda i, j: (i, j, 0)),
    ]
    dq_args = [q_part, panel, gp, lse, delta]
    if mp is not None:
        dq_specs.append(pl.BlockSpec((1, block_q, n_pad),
                                     lambda i, j: (0, j, 0)))
        dq_args.append(mp)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel if mp is not None else _bwd_dq_kernel_nomask,
            block_k=block_k, **common),
        grid=(b, n_pad // block_q),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*dq_args)

    # dK/dV: grid over key blocks; q/do/lse/delta panels resident, mask
    # column-blocked per key block
    dkv_specs = [
        pl.BlockSpec((1, block_k, 3 * hd), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, n_pad, hd), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, n_pad, hd), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, n_pad, num_heads), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, n_pad, num_heads), lambda i, j: (i, 0, 0)),
    ]
    dkv_args = [panel, q_part, gp, lse, delta]
    if mp is not None:
        dkv_specs.append(pl.BlockSpec((1, n_pad, block_k),
                                      lambda i, j: (0, 0, j)))
        dkv_args.append(mp)
    dkv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel if mp is not None else _bwd_dkv_kernel_nomask,
            block_q=block_q, **common),
        grid=(b, n_pad // block_k),
        in_specs=dkv_specs,
        out_specs=pl.BlockSpec((1, block_k, 2 * hd), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, 2 * hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*dkv_args)

    dqkv = jnp.concatenate([dq[:, :n, :], dkv[:, :n, :]], axis=-1)
    return dqkv, None


flash_qkv_attention.defvjp(_flash_qkv_fwd, _flash_qkv_bwd)
