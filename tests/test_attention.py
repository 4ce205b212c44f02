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


def test_scale_override_matches_default():
    # explicit scale equal to the default must be a no-op, for both impls
    rng = np.random.default_rng(5)
    q, k, v = _rand_qkv(rng, 2, 2, 64, 16)
    np.testing.assert_array_equal(
        np.asarray(xla_attention(q, k, v, scale=16**-0.5)),
        np.asarray(xla_attention(q, k, v)),
    )
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v, None, 256, 256, 16**-0.5)),
        np.asarray(xla_attention(q, k, v)),
        atol=2e-5,
    )


def test_pad_attn_heads_is_equivalent():
    """pad_attn_heads zero-pads head_dim to the 128-lane tile inside the QKV /
    out kernels; same param tree, numerically identical outputs and grads."""
    from vit4hep_tpu.models.vit import ViT

    param = dict(
        dim=3, condition_dim=7, hidden_dim=96, out_channels=1, depth=2,
        num_heads=2, mlp_ratio=2, learn_pos_embed=True, causal_attn=False,
        num_patches=[[3, 2, 2]], patch_dim=6,
    )
    net_a = ViT(dict(param))
    net_b = ViT(dict(param, pad_attn_heads=True))

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 12, 6))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (3,))
    c = jax.random.normal(jax.random.fold_in(key, 2), (3, 7))

    pa = net_a.init(jax.random.PRNGKey(7), x, t, c)
    pb = net_b.init(jax.random.PRNGKey(7), x, t, c)
    assert jax.tree.structure(pa) == jax.tree.structure(pb)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ya = net_a.apply(pa, x, t, c)
    yb = net_b.apply(pa, x, t, c)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(net_a.apply(p, x, t, c) ** 2))(pa)
    gb = jax.grad(lambda p: jnp.sum(net_b.apply(p, x, t, c) ** 2))(pa)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
