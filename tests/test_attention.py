"""Flash-attention kernel vs the XLA reference implementation (fwd + grads).

Runs in Pallas interpreter mode on CPU; the same code compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit4hep_tpu.ops.attention import xla_attention
from vit4hep_tpu.ops.flash_attention import flash_attention
from vit4hep_tpu.ops.pos_embed import layer_causal_mask


def _rand_qkv(rng, b, h, n, d, dtype=jnp.float32):
    qkv = [jnp.asarray(rng.normal(size=(b, h, n, d)), dtype) for _ in range(3)]
    return qkv


@pytest.mark.parametrize("n", [64, 135, 450])
def test_flash_matches_xla_forward(n):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, 2, 3, n, 16)
    out_flash = flash_attention(q, k, v)
    out_xla = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5)


def test_flash_matches_xla_with_layer_causal_mask():
    rng = np.random.default_rng(1)
    num_patches = (5, 4, 2)  # 40 tokens
    mask = jnp.asarray(layer_causal_mask(num_patches))
    q, k, v = _rand_qkv(rng, 2, 2, 40, 8)
    out_flash = flash_attention(q, k, v, mask)
    out_xla = xla_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5)


@pytest.mark.parametrize("use_mask", [False, True])
def test_flash_gradients_match_xla(use_mask):
    rng = np.random.default_rng(2)
    n = 72
    q, k, v = _rand_qkv(rng, 1, 2, n, 8)
    mask = jnp.asarray(layer_causal_mask((6, 4, 3))) if use_mask else None

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, mask) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=5e-4, err_msg=f"d{name} mismatch"
        )


def test_flash_multi_qblock_path():
    # force several q/k blocks to exercise the online-softmax recurrence
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, 1, 1, 300, 8)
    out_flash = flash_attention(q, k, v, None, 128, 128)
    out_xla = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5)


def test_flash_jit_and_vmapless_batch():
    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng, 4, 6, 135, 16)
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    out = f(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_attention(q, k, v)), atol=2e-5
    )
