"""Block-wise flash attention (online softmax) as Pallas TPU kernels.

TPU-native replacement for the reference's fused attention backends
(torch SDPA, nn/vit.py:431-438; xformers memory_efficient_attention,
nn/vit.py:440-449): the (N, N) score matrix is never materialized in HBM.
Forward uses the online-softmax recurrence over key blocks; backward is the
FlashAttention-2 split — one kernel for dK/dV (grid over key blocks) and one
for dQ (grid over query blocks) — wired up as a `jax.custom_vjp`.

Supports arbitrary (non-power-of-two) sequence lengths via padding + in-kernel
masking, and an optional boolean (N, N) mask (True = attend) which covers the
reference's layer-causal attention mask (nn/vit.py:105-113).

TPU layout notes: softmax statistics (lse) and the backward delta are carried as
(BH, N_pad, 1) so every block shape satisfies the (8, 128)-tile constraint; all
in-kernel reductions keep 2-D shapes.

Shapes: q, k, v are (B, H, N, D); output (B, H, N, D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


from vit4hep_tpu.ops.pallas_utils import interpret as _interpret
from vit4hep_tpu.ops.pallas_utils import round_up as _round_up


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale, n_real, block_k):
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    def body(kb, carry):
        acc, m_i, l_i = carry  # (BQ, D), (BQ, 1), (BQ, 1)
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = col < n_real
        if mask_ref is not None:
            valid = jnp.logical_and(valid, mask_ref[0, :, pl.ds(kb * block_k, block_k)])
        s = jnp.where(valid, s, _NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        # pad guard: on a fully-masked row every s is _NEG_INF and
        # exp(s - m_new) = 1 everywhere INCLUDING the zero-padded columns;
        # zeroing the pads keeps the degenerate row at the uniform mean
        # over n_real columns, matching the unpadded XLA tier
        p = jnp.where(col < n_real, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))

    l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m_i + jnp.log(l_safe)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------
def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref, dk_ref, dv_ref,
    *, scale, n_real, block_q,
):
    k_blk = k_ref[0].astype(jnp.float32)  # (BK, D)
    v_blk = v_ref[0].astype(jnp.float32)
    block_k, d = k_blk.shape
    n_pad = q_ref.shape[1]
    num_qb = n_pad // block_q
    kb = pl.program_id(1)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), :]  # (BQ, 1)
        delta = delta_ref[0, pl.ds(qb * block_q, block_q), :]
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        valid = col < n_real
        if mask_ref is not None:
            valid = jnp.logical_and(valid, mask_ref[0, pl.ds(qb * block_q, block_q), :])
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref, dq_ref,
    *, scale, n_real, block_k,
):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (BQ, 1)
    delta = delta_ref[0]
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    def body(kb, dq):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = col < n_real
        if mask_ref is not None:
            valid = jnp.logical_and(valid, mask_ref[0, :, pl.ds(kb * block_k, block_k)])
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------
def _prep(q, k, v, mask, block_q, block_k):
    b, h, n, d = q.shape
    n_pad = _round_up(n, max(block_q, block_k))
    pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
    qp = jnp.pad(q, pad).reshape(b * h, n_pad, d)
    kp = jnp.pad(k, pad).reshape(b * h, n_pad, d)
    vp = jnp.pad(v, pad).reshape(b * h, n_pad, d)
    mp = None
    if mask is not None:
        if mask.ndim != 2:
            raise ValueError("flash_attention supports a shared (N, N) mask")
        mp = jnp.pad(mask.astype(jnp.bool_), [(0, n_pad - n), (0, n_pad - n)])
    return qp, kp, vp, mp, n_pad


def _block_sizes(n, block_q, block_k):
    bq = min(block_q, _round_up(n, 128))
    bk = min(block_k, _round_up(n, 128))
    return bq, bk


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, mask=None, block_q=256, block_k=256, scale=None):
    """scale overrides the 1/sqrt(head_dim) logit scale — needed when the head
    dim is zero-padded to the lane width (models/vit.py pad_attn_heads), where
    the true dim differs from q.shape[-1]."""
    out, _ = _flash_fwd(q, k, v, mask, block_q, block_k, scale)
    return out


def _flash_fwd(q, k, v, mask, block_q, block_k, scale=None):
    b, h, n, d = q.shape
    bq, bk = _block_sizes(n, block_q, block_k)
    qp, kp, vp, mp, n_pad = _prep(q, k, v, mask, bq, bk)
    bh = b * h
    grid = (bh, n_pad // bq)

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0)),
    ]
    args = [qp, kp, vp]
    if mp is not None:
        in_specs.append(pl.BlockSpec((1, bq, n_pad), lambda i, j: (0, j, 0)))
        args.append(mp[None])

    kernel = functools.partial(
        _fwd_kernel if mp is not None else _fwd_kernel_nomask,
        scale=d**-0.5 if scale is None else scale,
        n_real=n,
        block_k=bk,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    o = out[:, :n, :].reshape(b, h, n, d)
    return o, (q, k, v, mask, o, lse)


def _fwd_kernel_nomask(q_ref, k_ref, v_ref, o_ref, lse_ref, **kw):
    _fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref, **kw)


def _bwd_dkv_kernel_nomask(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, **kw):
    _bwd_dkv_kernel(
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, None, dk_ref, dv_ref, **kw
    )


def _bwd_dq_kernel_nomask(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, **kw):
    _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, None, dq_ref, **kw)


def _flash_bwd(block_q, block_k, scale, res, g):
    q, k, v, mask, o, lse = res
    b, h, n, d = q.shape
    bq, bk = _block_sizes(n, block_q, block_k)
    qp, kp, vp, mp, n_pad = _prep(q, k, v, mask, bq, bk)
    bh = b * h
    gp = jnp.pad(g, [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]).reshape(bh, n_pad, d)
    delta = jnp.einsum("bhnd,bhnd->bhn", g.astype(jnp.float32), o.astype(jnp.float32))
    delta = jnp.pad(delta, [(0, 0), (0, 0), (0, n_pad - n)]).reshape(bh, n_pad, 1)

    scale = d**-0.5 if scale is None else scale
    full_spec = pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0))
    stat_full_spec = pl.BlockSpec((1, n_pad, 1), lambda i, j: (i, 0, 0))

    # dK / dV: grid over key blocks
    dkv_in_specs = [
        full_spec,
        pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0)),
        full_spec,
        stat_full_spec,
        stat_full_spec,
    ]
    dkv_args = [qp, kp, vp, gp, lse, delta]
    if mp is not None:
        dkv_in_specs.append(pl.BlockSpec((1, n_pad, bk), lambda i, j: (0, 0, j)))
        dkv_args.append(mp[None])
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel if mp is not None else _bwd_dkv_kernel_nomask,
            scale=scale, n_real=n, block_q=bq,
        ),
        grid=(bh, n_pad // bk),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        ],
        interpret=_interpret(),
    )(*dkv_args)

    # dQ: grid over query blocks
    dq_in_specs = [
        pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        full_spec,
        full_spec,
        pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0)),
    ]
    dq_args = [qp, kp, vp, gp, lse, delta]
    if mp is not None:
        dq_in_specs.append(pl.BlockSpec((1, bq, n_pad), lambda i, j: (0, j, 0)))
        dq_args.append(mp[None])
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel if mp is not None else _bwd_dq_kernel_nomask,
            scale=scale, n_real=n, block_k=bk,
        ),
        grid=(bh, n_pad // bq),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        interpret=_interpret(),
    )(*dq_args)

    unpad = lambda x: x[:, :n, :].reshape(b, h, n, d)
    return unpad(dq), unpad(dk), unpad(dv), None


flash_attention.defvjp(_flash_fwd, _flash_bwd)
