"""Ring attention: exactness vs single-device attention on a sharded token axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit4hep_tpu.ops.attention import xla_attention
from vit4hep_tpu.parallel import mesh as mesh_lib
from vit4hep_tpu.parallel.sequence_parallel import ring_attention


@pytest.mark.parametrize("model_parallel", [2, 4])
def test_ring_attention_exact(model_parallel, rng):
    mesh = mesh_lib.create_mesh(model_parallel=model_parallel)
    b, h, n, d = 2, 2, 64, 8
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)

    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_ring_attention_grad(rng):
    mesh = mesh_lib.create_mesh(model_parallel=2)
    b, h, n, d = 1, 2, 32, 4
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)

    loss_ring = jax.jit(lambda q, k, v: jnp.sum(ring_attention(q, k, v, mesh) ** 2))
    loss_ref = jax.jit(lambda q, k, v: jnp.sum(xla_attention(q, k, v) ** 2))
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5)


def test_ring_attention_long_sequence(rng):
    """Unpatched-ds3-style long sequence stays exact under sharding."""
    mesh = mesh_lib.create_mesh(model_parallel=8)
    b, h, n, d = 1, 1, 1024, 8
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-6)


@pytest.mark.slow
def test_ring_attention_from_fused_qkv_layout(rng):
    """VERDICT r2 #6: ring attention fed from the fused-layout qkv panel.

    Long-sequence layers produce qkv in the Dense's native (B, N, 3*H*D)
    layout (ops/fused_qkv_attention.py, ordering [q/k/v, head, dim]); when
    the sequence is sharded for SP, the per-head split + transpose feeding
    ring_attention must agree with the fused-layout kernel on the same
    panel."""
    from vit4hep_tpu.ops.fused_qkv_attention import fused_qkv_attention

    mesh = mesh_lib.create_mesh(model_parallel=2)
    b, h, n, d = 2, 2, 128, 16
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * h * d)), jnp.float32)

    ref = np.asarray(fused_qkv_attention(qkv, h))  # (B, N, H*D)

    def split_heads(panel):
        q5 = panel.reshape(b, n, 3, h, d)
        return tuple(jnp.transpose(q5[:, :, i], (0, 2, 1, 3)) for i in range(3))

    @jax.jit
    def via_ring(panel):
        q, k, v = split_heads(panel)
        out = ring_attention(q, k, v, mesh)  # (B, H, N, D)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)

    np.testing.assert_allclose(np.asarray(via_ring(qkv)), ref,
                               rtol=5e-3, atol=5e-3)
