"""Sequence-parallel (ring) attention over the mesh's ``model`` axis.

The reference never needed sequence parallelism — it scales sequence length by
patching (ds3: 40500 voxels -> 450 tokens; SURVEY.md section 5). This module is
the headroom beyond parity: the token axis is sharded across the ``model``
axis, each device holds a K/V shard, and K/V blocks rotate around the ring via
``jax.lax.ppermute`` (ICI neighbor exchanges on TPU) while an online-softmax
accumulator builds the exact attention output. Memory per device drops from
O(N^2) to O(N * N/n), enabling attention over the *unpatched* ds3 grid.

Usage (inside jit):
    out = ring_attention(q, k, v, mesh)   # q, k, v: (B, H, N, D) global arrays
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vit4hep_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_NEG_INF = -1e30


def _ring_shard(q, k, v, *, axis_name: str, n_dev: int, scale: float):
    """Per-device computation: local queries vs rotating K/V blocks."""

    def step(carry, _):
        acc, m, l, k_cur, v_cur = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_cur, preferred_element_type=jnp.float32
        ) * scale
        m_new = jnp.maximum(m, s.max(-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32,
        )
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (acc_new, m_new, l_new, k_next, v_next), None

    # derive the initial carries from q so shard_map marks them as varying
    # over the ring axis (constants would be invariant and fail the scan
    # carry type check)
    acc0 = q.astype(jnp.float32) * 0.0
    m0 = q[..., :1].astype(jnp.float32) * 0.0 + _NEG_INF
    l0 = q[..., :1].astype(jnp.float32) * 0.0
    (acc, m, l, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v), None, length=n_dev
    )
    return (acc / jnp.where(l == 0.0, 1.0, l)).astype(q.dtype)


def ring_attention(q, k, v, mesh, axis: str = MODEL_AXIS):
    """Exact attention with the token axis sharded over ``axis``.

    q, k, v: (B, H, N, D) with N divisible by the axis size. Returns (B, H, N, D).
    """
    n_dev = mesh.shape[axis]
    if n_dev == 1:
        from vit4hep_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v)
    if q.shape[2] % n_dev != 0:
        raise ValueError(f"sequence length {q.shape[2]} not divisible by {n_dev}")

    # keep the batch sharded over the data axis (when the mesh has one and the
    # batch divides it): P(None, ...) would force an all-gather that
    # replicates the whole batch across every data row
    batch_axis = None
    if DATA_AXIS in mesh.shape and DATA_AXIS != axis:
        if mesh.shape[DATA_AXIS] > 1 and q.shape[0] % mesh.shape[DATA_AXIS] == 0:
            batch_axis = DATA_AXIS
    spec = P(batch_axis, None, axis, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_shard, axis_name=axis, n_dev=n_dev, scale=q.shape[-1] ** -0.5
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    constrain = lambda x: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    return fn(constrain(q), constrain(k), constrain(v))
