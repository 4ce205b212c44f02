"""Flash-attention kernel vs the XLA reference implementation (fwd + grads).

Runs in Pallas interpreter mode on CPU; the same code compiles on TPU.
"""

import functools

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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# one-shot VMEM-resident kernel (ops/vmem_attention.py)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("n", [64, 135, 450])
def test_vmem_matches_xla_forward(n):
    from vit4hep_tpu.ops.vmem_attention import vmem_attention

    rng = np.random.default_rng(10)
    q, k, v = _rand_qkv(rng, 2, 3, n, 16)
    out = vmem_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla_attention(q, k, v)),
                               atol=2e-5)


def test_vmem_matches_xla_with_layer_causal_mask():
    from vit4hep_tpu.ops.vmem_attention import vmem_attention

    rng = np.random.default_rng(11)
    mask = jnp.asarray(layer_causal_mask((5, 4, 2)))  # 40 tokens
    q, k, v = _rand_qkv(rng, 2, 2, 40, 8)
    out = vmem_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_attention(q, k, v, mask)), atol=2e-5)


@pytest.mark.parametrize("use_mask", [False, True])
def test_vmem_gradients_match_xla(use_mask):
    from vit4hep_tpu.ops.vmem_attention import vmem_attention

    rng = np.random.default_rng(12)
    q, k, v = _rand_qkv(rng, 1, 2, 72, 8)
    mask = jnp.asarray(layer_causal_mask((6, 4, 3))) if use_mask else None

    g_vmem = jax.grad(lambda q, k, v: jnp.sum(vmem_attention(q, k, v, mask) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(lambda q, k, v: jnp.sum(xla_attention(q, k, v, mask) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_vmem, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=5e-4, err_msg=f"d{name} mismatch"
        )


def test_vmem_scale_override_and_jit():
    from vit4hep_tpu.ops.vmem_attention import vmem_attention

    rng = np.random.default_rng(13)
    q, k, v = _rand_qkv(rng, 4, 6, 135, 16)
    out = jax.jit(lambda q, k, v: vmem_attention(q, k, v, None, 16**-0.5))(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_attention(q, k, v)), atol=2e-5)


# ---------------------------------------------------------------------------
# fused-layout qkv kernel (ops/fused_qkv_attention.py) + model-facing dispatch
# ---------------------------------------------------------------------------
def _xla_from_qkv(qkv, h, mask=None, scale=None):
    b, n, thd = qkv.shape
    d = thd // 3 // h
    qkv5 = qkv.reshape(b, n, 3, h, d)
    q, k, v = (jnp.transpose(qkv5[:, :, i], (0, 2, 1, 3)) for i in range(3))
    out = xla_attention(q, k, v, mask, scale=scale)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)


@pytest.mark.parametrize(
    "n,h,d",
    # d <= 64 runs the head-packed kernel, d = 80/120 the per-head loop
    # (ops/fused_qkv_attention.py: packed = d <= 64); d = 120 is the
    # round-3 `_tpu` config head shape (4 heads at hidden 480)
    [(64, 2, 16), (135, 6, 16), (450, 3, 16), (40, 5, 8), (40, 2, 80),
     (40, 2, 120)],
)
def test_fused_qkv_matches_xla_forward(n, h, d):
    from vit4hep_tpu.ops.fused_qkv_attention import fused_qkv_attention

    rng = np.random.default_rng(20)
    qkv = jnp.asarray(rng.normal(size=(2, n, 3 * h * d)), jnp.float32)
    out = fused_qkv_attention(qkv, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_xla_from_qkv(qkv, h)),
                               atol=2e-5)


def test_fused_qkv_matches_xla_with_layer_causal_mask():
    from vit4hep_tpu.ops.fused_qkv_attention import fused_qkv_attention

    rng = np.random.default_rng(21)
    mask = jnp.asarray(layer_causal_mask((5, 4, 2)))  # 40 tokens
    qkv = jnp.asarray(rng.normal(size=(2, 40, 3 * 2 * 8)), jnp.float32)
    out = fused_qkv_attention(qkv, 2, mask)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_xla_from_qkv(qkv, 2, mask)), atol=2e-5)


@pytest.mark.parametrize("use_mask", [False, True])
def test_fused_qkv_gradients_match_xla(use_mask):
    from vit4hep_tpu.ops.fused_qkv_attention import fused_qkv_attention

    rng = np.random.default_rng(22)
    qkv = jnp.asarray(rng.normal(size=(2, 72, 3 * 2 * 8)), jnp.float32)
    mask = jnp.asarray(layer_causal_mask((6, 4, 3))) if use_mask else None

    g_fused = jax.grad(lambda x: jnp.sum(fused_qkv_attention(x, 2, mask) ** 2))(qkv)
    g_xla = jax.grad(lambda x: jnp.sum(_xla_from_qkv(x, 2, mask) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla), atol=5e-4)


def test_fused_qkv_scale_override_and_jit():
    from vit4hep_tpu.ops.fused_qkv_attention import fused_qkv_attention

    rng = np.random.default_rng(23)
    qkv = jnp.asarray(rng.normal(size=(3, 135, 3 * 6 * 16)), jnp.float32)
    out = jax.jit(lambda x: fused_qkv_attention(x, 6, None, 16**-0.5))(qkv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_xla_from_qkv(qkv, 6)),
                               atol=2e-5)


@pytest.mark.parametrize("impl", ["fused", "xla", "vmem"])
def test_qkv_attention_dispatch_parity(impl):
    from vit4hep_tpu.ops.attention import qkv_attention

    rng = np.random.default_rng(24)
    qkv = jnp.asarray(rng.normal(size=(2, 135, 3 * 4 * 8)), jnp.float32)
    out = qkv_attention(qkv, 4, impl=impl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_xla_from_qkv(qkv, 4)),
                               atol=2e-5)


def test_attention_module_fused_matches_xla():
    """The full flax Attention module agrees across impls (fwd + grads)."""
    from vit4hep_tpu.models.vit import Attention

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 135, 48))
    net_x = Attention(hidden=48, num_heads=3, attn_impl="xla")
    net_f = Attention(hidden=48, num_heads=3, attn_impl="fused")
    params = net_x.init(key, x)
    np.testing.assert_allclose(
        np.asarray(net_f.apply(params, x)), np.asarray(net_x.apply(params, x)),
        atol=2e-5,
    )
    gx = jax.grad(lambda p: jnp.sum(net_x.apply(p, x) ** 2))(params)
    gf = jax.grad(lambda p: jnp.sum(net_f.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


# ---------------------------------------------------------------------------
# full-block megakernel (ops/fused_dit_block.py)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("use_mask", [False, True])
@pytest.mark.slow
def test_fused_dit_block_matches_composed(use_mask):
    """fused_block runs the whole DiT block as one kernel: identical param
    tree, elementwise-identical forward (interpret mode is f32), grads to
    float tolerance."""
    from vit4hep_tpu.models.vit import DiTBlock

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 40, 48))
    c = jax.random.normal(jax.random.fold_in(key, 1), (2, 48))
    mask = jnp.asarray(layer_causal_mask((5, 4, 2))) if use_mask else None

    ref = DiTBlock(hidden=48, num_heads=3)
    fus = DiTBlock(hidden=48, num_heads=3, fused_block=True)
    params = ref.init(key, x, c, mask)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        fus.init(key, x, c, mask)
    )
    np.testing.assert_allclose(
        np.asarray(fus.apply(params, x, c, mask)),
        np.asarray(ref.apply(params, x, c, mask)), atol=1e-5,
    )
    gr = jax.grad(lambda p: jnp.sum(ref.apply(p, x, c, mask) ** 2))(params)
    gf = jax.grad(lambda p: jnp.sum(fus.apply(p, x, c, mask) ** 2))(params)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.parametrize("heads,d", [(2, 80), (2, 120)])
@pytest.mark.slow
def test_fused_dit_block_per_head_loop_branch(heads, d):
    """d > 64 takes the per-head loop (not packed_attn_core) inside the
    megakernel — the production ds2/ds3 (d=80) and `_tpu` config (d=120)
    sampling branch; the packed-branch tests above never reach it."""
    from vit4hep_tpu.models.vit import DiTBlock

    hidden = heads * d
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (1, 24, hidden))
    c = jax.random.normal(jax.random.fold_in(key, 1), (1, hidden))

    ref = DiTBlock(hidden=hidden, num_heads=heads)
    fus = DiTBlock(hidden=hidden, num_heads=heads, fused_block=True)
    params = ref.init(key, x, c, None)
    np.testing.assert_allclose(
        np.asarray(fus.apply(params, x, c, None)),
        np.asarray(ref.apply(params, x, c, None)), atol=2e-5,
    )


@pytest.mark.slow
def test_fused_dit_block_in_vit_and_jit():
    """The flag threads through ViT; jitted fused forward equals unfused."""
    from vit4hep_tpu.models.vit import ViT

    param = dict(
        dim=3, condition_dim=7, hidden_dim=96, out_channels=1, depth=2,
        num_heads=2, mlp_ratio=2, learn_pos_embed=True, causal_attn=False,
        num_patches=[[3, 2, 2]], patch_dim=6,
    )
    net_a = ViT(dict(param))
    net_b = ViT(dict(param, fused_block=True))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 12, 6))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (3,))
    c = jax.random.normal(jax.random.fold_in(key, 2), (3, 7))
    p = net_a.init(jax.random.PRNGKey(7), x, t, c)
    out_a = net_a.apply(p, x, t, c)
    out_b = jax.jit(net_b.apply)(p, x, t, c)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a), atol=1e-5)


@pytest.mark.slow
def test_fused_block_sample_mode():
    """`fused_block: sample` routes only sample_batch through the megakernel:
    training loss/grads are bitwise the composed path, sampling matches it."""
    from vit4hep_tpu.models.calochallenge import CaloChallengeCFM
    from vit4hep_tpu.models.vit import ViT

    def build(fused):
        param = dict(
            dim=3, condition_dim=5, hidden_dim=96, out_channels=1, depth=2,
            num_heads=2, mlp_ratio=2, learn_pos_embed=True, causal_attn=False,
            num_patches=[[3, 2, 1]], patch_dim=6, fused_block=fused,
        )
        return CaloChallengeCFM(
            net=ViT(param), in_channels=1, shape=[3, 4, 3],
            patch_shape=[1, 2, 3],
            odeint_kwargs={"method": "rk4", "options": {"step_size": 0.5}},
        )

    m_ref = build(False)
    m_smp = build("sample")
    assert m_smp.sample_net.cfg.fused_block is True
    assert m_smp.net.cfg.fused_block == "sample"

    key = jax.random.PRNGKey(0)
    params = m_ref.init_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 1, 3, 4, 3))
    c = jax.random.normal(jax.random.fold_in(key, 2), (4, 5))

    # training path: bitwise identical (same composed program)
    g_ref = jax.grad(lambda p: m_ref.batch_loss(p, x, c, key))(params)
    g_smp = jax.grad(lambda p: m_smp.batch_loss(p, x, c, key))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_smp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # sampling path: megakernel (interpret mode is f32 => tight)
    s_ref = m_ref.sample_batch(params, c, jax.random.fold_in(key, 3))
    s_smp = m_smp.sample_batch(params, c, jax.random.fold_in(key, 3))
    np.testing.assert_allclose(np.asarray(s_smp), np.asarray(s_ref), atol=1e-4)


@pytest.mark.parametrize("use_mask", [False, True])
@pytest.mark.slow
def test_fused_dit_block_bwd_matches_reference_vjp(use_mask):
    """The backward megakernel's grads equal the VJP of the composed
    reference for EVERY input (x, mod6, and all eight weight/bias leaves)."""
    from vit4hep_tpu.ops.fused_dit_block import (
        dit_block_reference, fused_dit_block)

    rng = np.random.default_rng(30)
    h, d, f, n, b = 2, 8, 32, 40, 3
    hid = h * d
    x = jnp.asarray(rng.normal(size=(b, n, hid)), jnp.float32)
    mod6 = jnp.asarray(rng.normal(size=(b, 6, hid)) * 0.3, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32) for s in
          [(hid, 3 * hid), (3 * hid,), (hid, hid), (hid,),
           (hid, f), (f,), (f, hid), (hid,)]]
    mask = jnp.asarray(layer_causal_mask((5, 4, 2))) if use_mask else None
    scale = d**-0.5

    def loss_kernel(*a):
        return jnp.sum(fused_dit_block(*a, mask, h, scale) ** 2)

    def loss_ref(*a):
        return jnp.sum(dit_block_reference(*a, mask, h, scale) ** 2)

    gk = jax.grad(loss_kernel, argnums=tuple(range(10)))(x, mod6, *ws)
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(x, mod6, *ws)
    names = ["x", "mod6", "wqkv", "bqkv", "wout", "bout", "w1", "b1", "w2", "b2"]
    for a, b_, name in zip(gk, gr, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-4,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.slow
def test_fused_block_stack_deep_with_mask():
    """Depth-3 ViT with a causal mask through the block-STACK kernel equals
    the composed path, fwd + grads (grads ride the composed-reference VJP)."""
    from vit4hep_tpu.models.vit import ViT

    param = dict(
        dim=3, condition_dim=7, hidden_dim=96, out_channels=1, depth=3,
        num_heads=2, mlp_ratio=2, learn_pos_embed=True, causal_attn=True,
        num_patches=[[3, 2, 2]], patch_dim=6,
    )
    net_a = ViT(dict(param))
    net_b = ViT(dict(param, fused_block=True))
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (3, 12, 6))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (3,))
    c = jax.random.normal(jax.random.fold_in(key, 2), (3, 7))
    pa = net_a.init(jax.random.PRNGKey(7), x, t, c)
    assert jax.tree.structure(pa) == jax.tree.structure(
        net_b.init(jax.random.PRNGKey(7), x, t, c))
    np.testing.assert_allclose(
        np.asarray(net_b.apply(pa, x, t, c)), np.asarray(net_a.apply(pa, x, t, c)),
        atol=1e-5,
    )
    ga = jax.grad(lambda p: jnp.sum(net_a.apply(p, x, t, c) ** 2))(pa)
    gb = jax.grad(lambda p: jnp.sum(net_b.apply(p, x, t, c) ** 2))(pa)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.slow
def test_cinn_fused_block_sample_mode():
    """cINN `fused_block: sample` in vit_kwargs: the training/likelihood
    direction is bitwise the composed path; the inverse (sampling)
    direction rides the block-stack megakernel and matches."""
    from vit4hep_tpu.models.calochallenge import CaloChallengeCINN

    def build(fused):
        vit_kwargs = dict(
            dim=1, condition_dim=4, hidden_dim=32, out_channels=1, depth=2,
            num_heads=2, mlp_ratio=2, learn_pos_embed=True, causal_attn=False,
        )
        if fused:
            vit_kwargs["fused_block"] = fused
        return CaloChallengeCINN(
            shape=[4, 4, 2], patch_shape=[1, 2, 1], in_channels=1,
            coupling_block="CaloRQSplineFrEIA", nblocks=2,
            is_spatial=[False, False],
            cinn_kwargs={"bins": 4, "min_bin_sizes": [0.001, 0.001],
                         "default_domain": [-8.0, 8.0, -8.0, 8.0],
                         "identity_tails": False, "domain_clamping": None},
            vit_kwargs=vit_kwargs,
        )

    m_ref = build(False)
    m_smp = build("sample")
    assert m_smp.sample_net is not None and m_ref.sample_net is None

    key = jax.random.PRNGKey(0)
    params = m_ref.init_params(key)
    assert jax.tree.structure(params) == jax.tree.structure(
        m_smp.init_params(key))
    x = jax.random.normal(jax.random.fold_in(key, 1), (3, 1, 4, 4, 2))
    c = jax.random.normal(jax.random.fold_in(key, 2), (3, 4))

    np.testing.assert_array_equal(
        np.asarray(m_ref.batch_loss(params, x, c)),
        np.asarray(m_smp.batch_loss(params, x, c)),
    )
    s_ref = m_ref.sample_batch(params, c, jax.random.fold_in(key, 3))
    s_smp = m_smp.sample_batch(params, c, jax.random.fold_in(key, 3))
    np.testing.assert_allclose(np.asarray(s_smp), np.asarray(s_ref), atol=1e-4)


def test_fused_stack_escape_hatch():
    """fused_stack: false forces per-block megakernels; output unchanged."""
    from vit4hep_tpu.models.vit import ViT

    param = dict(
        dim=3, condition_dim=7, hidden_dim=96, out_channels=1, depth=2,
        num_heads=2, mlp_ratio=2, learn_pos_embed=True, causal_attn=False,
        num_patches=[[3, 2, 2]], patch_dim=6, fused_block=True,
    )
    net_stack = ViT(dict(param))
    net_per_block = ViT(dict(param, fused_stack=False))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 12, 6))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (3,))
    c = jax.random.normal(jax.random.fold_in(key, 2), (3, 7))
    p = net_stack.init(jax.random.PRNGKey(7), x, t, c)
    np.testing.assert_allclose(
        np.asarray(net_per_block.apply(p, x, t, c)),
        np.asarray(net_stack.apply(p, x, t, c)), atol=1e-5,
    )


def test_explicit_fused_impl_raises_beyond_vmem_bound():
    """ADVICE r2: an explicit `attn_impl: fused` (or vmem) config past the
    kernel's VMEM working set must raise a clear ValueError naming the flash
    fallback instead of a raw Mosaic scoped-VMEM compile failure."""
    from vit4hep_tpu.ops.attention import dot_product_attention, qkv_attention

    qkv = jnp.zeros((1, 4096, 3 * 2 * 64), jnp.float32)  # N=4096 > 2048 cap
    with pytest.raises(ValueError, match="flash"):
        qkv_attention(qkv, num_heads=2, impl="fused")

    q = jnp.zeros((1, 2, 2048, 64), jnp.float32)  # N=2048 > vmem's 1024 cap
    with pytest.raises(ValueError, match="flash"):
        dot_product_attention(q, q, q, impl="vmem")


def test_checkpoint_grads_wins_over_fused_block():
    """ADVICE r2: enabling remat must not be silently dropped by the stack
    kernel — `fused_block: true` + `checkpoint_grads: true` runs the remat'd
    composed path (same numerics), and sampling twins built by
    sampling_variant() clear checkpoint_grads so `fused_block: sample` keeps
    the kernel where it wins."""
    from vit4hep_tpu.models.vit import ViT, sampling_variant

    param = dict(
        dim=3, condition_dim=5, hidden_dim=96, out_channels=1, depth=2,
        num_heads=2, mlp_ratio=2, learn_pos_embed=True,
        num_patches=[[3, 2, 1]], patch_dim=6,
    )
    net_plain = ViT(dict(param))
    net_both = ViT(dict(param, fused_block=True, checkpoint_grads=True))

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 6))
    t = jnp.full((2, 1), 0.3)
    c = jax.random.normal(jax.random.fold_in(key, 2), (2, 5))
    params = net_plain.init(key, x, t, c)

    # remat'd composed path: gradients bitwise-match the plain composed net
    # (the megakernel backward would differ through its recompute)
    def loss(net):
        return lambda p: jnp.sum(net.apply(p, x, t, c) ** 2)

    g_plain = jax.grad(loss(net_plain))(params)
    g_both = jax.grad(loss(net_both))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_both)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the sampling twin drops checkpoint_grads (forward-only: remat is
    # pointless and would veto the kernel the twin exists for)
    twin = sampling_variant(
        ViT(dict(param, fused_block="sample", checkpoint_grads=True)))
    assert twin.cfg.fused_block is True
    assert twin.cfg.checkpoint_grads is False


def test_odeint_grid_steps_share_arithmetic():
    """ADVICE r2: grid_steps() is the single source of truth for odeint()'s
    step count — net-eval accounting can never drift from execution."""
    from vit4hep_tpu.ops.ode import grid_steps, odeint

    for step_size, expected in [(0.05, 20), (0.3, 4), (1.0, 1), (0.07, 15)]:
        assert grid_steps(step_size) == expected
        y = odeint(lambda t, y: -y, jnp.ones(3), method="euler",
                   step_size=step_size, unroll=1)
        # euler dy = -y dt per invocation: the analytic product verifies the
        # executed step count (full steps + truncated remainder) matches
        expected_y = float(np.prod([1 - dt for dt in _euler_dts(step_size)]))
        np.testing.assert_allclose(float(y[0]), expected_y, rtol=1e-5)


def _euler_dts(step_size, t0=0.0, t1=1.0):
    n_full = int((t1 - t0) / step_size + 1e-9)
    rem = (t1 - t0) - n_full * step_size
    dts = [step_size] * n_full
    if rem > 1e-9:
        dts.append(rem)
    return dts


# ---------------------------------------------------------------------------
# grouped megakernels (fused_group: G batch elements per grid cell)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("use_mask", [False, True])
@pytest.mark.slow
def test_fused_dit_stack_grouped_matches_ungrouped(use_mask):
    """group > 1 (incl. a ragged batch needing zero-pad) is elementwise
    equal to the per-element stack kernel to f32 roundoff (the batched
    dot_general reduces in a different order than the flat matmul)."""
    from vit4hep_tpu.ops.fused_dit_block import fused_dit_stack

    rng = np.random.default_rng(41)
    h, d, f, n, b, depth = 2, 8, 32, 40, 5, 2  # b=5, group=2 => pad to 6
    hid = h * d
    x = jnp.asarray(rng.normal(size=(b, n, hid)), jnp.float32)
    mods = jnp.asarray(rng.normal(size=(b, depth, 6, hid)) * 0.3, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(depth,) + s) * 0.1, jnp.float32) for s in
          [(hid, 3 * hid), (3 * hid,), (hid, hid), (hid,),
           (hid, f), (f,), (f, hid), (hid,)]]
    mask = jnp.asarray(layer_causal_mask((5, 4, 2))) if use_mask else None
    scale = d**-0.5

    out1 = fused_dit_stack(x, mods, *ws, mask, h, scale, 1)
    out2 = fused_dit_stack(x, mods, *ws, mask, h, scale, 2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=1e-5)

    # grads thread through the grouped forward's custom VJP unchanged
    # (the backward itself is group-independent => bitwise)
    g1 = jax.grad(lambda a: jnp.sum(
        fused_dit_stack(a, mods, *ws, mask, h, scale, 1) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(
        fused_dit_stack(a, mods, *ws, mask, h, scale, 2) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-4)


def test_safe_group_snaps_to_mosaic_alignment():
    """Groups whose flat (G*N) panel row count is not a multiple of 8 round
    up to the next multiple of 8 (regression: group=4 at the cINN's N=135
    produced a 540-row sublane block Mosaic refuses to lower — the same
    constraint fused_spline/fused_energy_decoder already guard)."""
    from vit4hep_tpu.ops.fused_dit_block import _safe_group

    assert _safe_group(4, 135) == 8     # 540 % 8 != 0 -> snap
    assert _safe_group(2, 135) == 8     # 270 % 8 != 0 -> snap
    assert _safe_group(2, 40) == 2      # 80 % 8 == 0 -> keep
    assert _safe_group(8, 135) == 8     # 1080 % 8 == 0 -> keep
    assert _safe_group(1, 135) == 1     # ungrouped path untouched
    assert _safe_group(0, 7) == 1
    # minimal rounding: the target is (G*N) % 8 == 0, i.e. multiples of
    # 8/gcd(N, 8) — NOT of 8 (over-rounding would inflate the quadratic
    # (G*N)^2 score VMEM and make _fit_group drop viable groups)
    assert _safe_group(2, 6) == 4       # gcd 2 -> multiples of 4
    assert _safe_group(3, 4) == 4       # gcd 4 -> multiples of 2
    assert _safe_group(5, 2) == 8       # gcd 2 -> multiples of 4
    assert _safe_group(3, 16) == 3      # N already 8-aligned -> keep
    for n in (2, 4, 6, 135):
        for g in range(1, 20):
            eff = _safe_group(g, n)
            assert eff >= g and (eff == 1 or (eff * n) % 8 == 0)
            # minimality: no smaller aligned G' in [g, eff)
            assert not any((k * n) % 8 == 0 for k in range(g, eff)), (g, n)


@pytest.mark.parametrize("n,group", [
    (27, 4),   # odd N: snaps to 8 (multiples of 8)
    (6, 2),    # even N, gcd(N,8)=2: minimal snap to 4, NOT 8
    (12, 3),   # gcd(N,8)=4: minimal snap to 4 (multiples of 2)
])
@pytest.mark.slow
def test_fused_dit_stack_unaligned_group_matches_ungrouped(n, group):
    """A Mosaic-unaligned requested group runs at the (minimally) snapped
    group and stays elementwise equal to the per-element stack kernel —
    pad rows sliced off."""
    from vit4hep_tpu.ops.fused_dit_block import fused_dit_stack

    rng = np.random.default_rng(43)
    h, d, f, b, depth = 2, 8, 32, 5, 2
    hid = h * d
    x = jnp.asarray(rng.normal(size=(b, n, hid)), jnp.float32)
    mods = jnp.asarray(rng.normal(size=(b, depth, 6, hid)) * 0.3, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(depth,) + s) * 0.1, jnp.float32) for s in
          [(hid, 3 * hid), (3 * hid,), (hid, hid), (hid,),
           (hid, f), (f,), (f, hid), (hid,)]]
    scale = d**-0.5

    out1 = fused_dit_stack(x, mods, *ws, None, h, scale, 1)
    outg = fused_dit_stack(x, mods, *ws, None, h, scale, group)
    assert outg.shape == (b, n, hid)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(out1), atol=1e-5)


@pytest.mark.parametrize("use_mask", [False, True])
@pytest.mark.slow
def test_fused_vit_forward_grouped_matches_reference(use_mask):
    """The grouped whole-ViT kernel (ragged batch) equals the composed jnp
    reference and the per-element kernel."""
    from vit4hep_tpu.ops.fused_dit_block import (
        fused_vit_forward, vit_forward_reference)

    rng = np.random.default_rng(42)
    h, d, f, n, b, depth, pdim, odim = 2, 8, 32, 40, 3, 2, 6, 12
    hid = h * d
    tokens = jnp.asarray(rng.normal(size=(b, n, pdim)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(n, hid)), jnp.float32)
    mods = jnp.asarray(rng.normal(size=(b, depth, 6, hid)) * 0.3, jnp.float32)
    fmod = jnp.asarray(rng.normal(size=(b, 2, hid)) * 0.3, jnp.float32)
    wemb = jnp.asarray(rng.normal(size=(pdim, hid)) * 0.1, jnp.float32)
    bemb = jnp.asarray(rng.normal(size=(hid,)) * 0.1, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(depth,) + s) * 0.1, jnp.float32) for s in
          [(hid, 3 * hid), (3 * hid,), (hid, hid), (hid,),
           (hid, f), (f,), (f, hid), (hid,)]]
    wfin = jnp.asarray(rng.normal(size=(hid, odim)) * 0.1, jnp.float32)
    bfin = jnp.asarray(rng.normal(size=(odim,)) * 0.1, jnp.float32)
    mask = jnp.asarray(layer_causal_mask((5, 4, 2))) if use_mask else None
    scale = d**-0.5

    args = (tokens, pos, mods, fmod, wemb, bemb, *ws, wfin, bfin, mask, h, scale)
    ref = vit_forward_reference(*args)
    out1 = fused_vit_forward(*args, 1)
    out2 = fused_vit_forward(*args, 2)  # b=3, group=2 => ragged pad to 4
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_vit_fused_group_threads_through_model():
    """fused_group in the net param dict reaches the whole-ViT kernel and
    leaves the output identical to the composed path (ragged batch)."""
    from vit4hep_tpu.models.vit import ViT

    param = dict(
        dim=3, condition_dim=7, hidden_dim=96, out_channels=1, depth=2,
        num_heads=2, mlp_ratio=2, learn_pos_embed=True, causal_attn=True,
        num_patches=[[3, 2, 2]], patch_dim=6,
    )
    net_a = ViT(dict(param))
    net_b = ViT(dict(param, fused_block=True, fused_group=4))
    assert net_b.cfg.fused_group == 4
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (6, 12, 6))  # 6 % 4 != 0: ragged
    t = jax.random.uniform(jax.random.fold_in(key, 1), (6,))
    c = jax.random.normal(jax.random.fold_in(key, 2), (6, 7))
    p = net_a.init(jax.random.PRNGKey(7), x, t, c)
    np.testing.assert_allclose(
        np.asarray(net_b.apply(p, x, t, c)), np.asarray(net_a.apply(p, x, t, c)),
        atol=1e-5,
    )


@pytest.mark.parametrize("use_mask", [False, True])
@pytest.mark.slow
def test_residual_saving_backward_matches_recompute(use_mask):
    """The TRAIN-mode residual-saving backward (VERDICT r3 #1) produces the
    same grads as the recompute backward and the composed-reference VJP, on
    BOTH the whole-ViT and block-stack entry points; the VMEM-fallback
    branch (residuals too big) is forced and must agree too."""
    from vit4hep_tpu.ops import fused_dit_block as fdb

    rng = np.random.default_rng(7)
    h, d, f, n, b, depth, pdim, odim = 2, 8, 32, 40, 2, 2, 6, 12
    hid = h * d
    tokens = jnp.asarray(rng.normal(size=(b, n, pdim)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(n, hid)), jnp.float32)
    mods = jnp.asarray(rng.normal(size=(b, depth, 6, hid)) * 0.3, jnp.float32)
    fmod = jnp.asarray(rng.normal(size=(b, 2, hid)) * 0.3, jnp.float32)
    wemb = jnp.asarray(rng.normal(size=(pdim, hid)) * 0.1, jnp.float32)
    bemb = jnp.asarray(rng.normal(size=(hid,)) * 0.1, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(depth,) + s) * 0.1, jnp.float32) for s in
          [(hid, 3 * hid), (3 * hid,), (hid, hid), (hid,),
           (hid, f), (f,), (f, hid), (hid,)]]
    wfin = jnp.asarray(rng.normal(size=(hid, odim)) * 0.1, jnp.float32)
    bfin = jnp.asarray(rng.normal(size=(odim,)) * 0.1, jnp.float32)
    mask = jnp.asarray(layer_causal_mask((5, 4, 2))) if use_mask else None
    scale = d**-0.5

    vit_args = (tokens, pos, mods, fmod, wemb, bemb, *ws, wfin, bfin)
    argnums = tuple(range(len(vit_args)))

    def vit_loss(kernel_fn, *a):
        return jnp.sum(kernel_fn(*a, mask, h, scale, 1) ** 2)

    def vit_loss_ref(*a):
        return jnp.sum(fdb.vit_forward_reference(*a, mask, h, scale) ** 2)

    # residual-saving branch engages at these shapes (assert it does)
    out, (res, saved) = fdb._vit_fwd_train(*vit_args, mask, h, scale, 1)
    assert saved is not None, "train kernel did not engage"
    assert len(saved) == 5 and saved[0].shape == (b, depth + 1, n, hid)

    g_sav = jax.grad(functools.partial(vit_loss, fdb.fused_vit_forward),
                     argnums=argnums)(*vit_args)
    g_ref = jax.grad(vit_loss_ref, argnums=argnums)(*vit_args)
    for gs, gr in zip(g_sav, g_ref):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   atol=2e-3, rtol=1e-4)

    # force the no-a1 residual tier (a1 recomputed from h2 @ w1 in-kernel)
    orig = fdb.train_residual_bytes
    fdb.train_residual_bytes = (
        lambda n_, h_, f_, d_, rb, save_a1=True:
        (1 << 40) if save_a1 else orig(n_, h_, f_, d_, rb, save_a1))
    try:
        _, (_, saved_na) = fdb._vit_fwd_train(*vit_args, mask, h, scale, 1)
        assert saved_na is not None and saved_na[3] is None
        g_na = jax.grad(functools.partial(vit_loss, fdb.fused_vit_forward),
                        argnums=argnums)(*vit_args)
    finally:
        fdb.train_residual_bytes = orig
    for gs, gn in zip(g_sav, g_na):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gn),
                                   atol=2e-3, rtol=1e-4)

    # force the VMEM fallback (recompute backward) and require agreement
    fdb.train_residual_bytes = lambda *a, **k: 1 << 40
    try:
        out_fb, (_, saved_fb) = fdb._vit_fwd_train(*vit_args, mask, h, scale, 1)
        assert saved_fb is None
        g_fb = jax.grad(functools.partial(vit_loss, fdb.fused_vit_forward),
                        argnums=argnums)(*vit_args)
    finally:
        fdb.train_residual_bytes = orig
    np.testing.assert_allclose(np.asarray(out_fb), np.asarray(out), atol=1e-5)
    for gs, gf in zip(g_sav, g_fb):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                                   atol=2e-3, rtol=1e-4)

    # block-stack entry point: saved branch vs composed reference grads
    x0 = jnp.asarray(rng.normal(size=(b, n, hid)), jnp.float32)
    sargs = (x0, mods, *ws)

    def stack_loss(*a):
        return jnp.sum(fdb.fused_dit_stack(*a, mask, h, scale, 1) ** 2)

    def stack_ref(x, m, *w):
        y = x
        for li in range(depth):
            y = fdb.dit_block_reference(y, m[:, li], *[wi[li] for wi in w],
                                        mask, h, scale)
        return jnp.sum(y ** 2)

    _, (_, ssaved) = fdb._stack_fwd_train(*sargs, mask, h, scale, 1)
    assert ssaved is not None
    gs_k = jax.grad(stack_loss, argnums=tuple(range(len(sargs))))(*sargs)
    gs_r = jax.grad(stack_ref, argnums=tuple(range(len(sargs))))(*sargs)
    for a, r in zip(gs_k, gs_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("use_mask", [False, True])
@pytest.mark.slow
def test_hybrid_xla_residual_backward_matches(use_mask):
    """The hybrid train arm (VERDICT r4 next #2) — megakernel forward
    writing the residual set + composed-XLA backward consuming it
    (bwd="xla") — produces the same grads as the all-Pallas residual
    backward and the composed-reference VJP, on both the whole-ViT and
    block-stack entry points, including the no-a1 residual tier."""
    from vit4hep_tpu.ops import fused_dit_block as fdb

    rng = np.random.default_rng(13)
    h, d, f, n, b, depth, pdim, odim = 2, 8, 32, 40, 2, 2, 6, 12
    hid = h * d
    tokens = jnp.asarray(rng.normal(size=(b, n, pdim)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(n, hid)), jnp.float32)
    mods = jnp.asarray(rng.normal(size=(b, depth, 6, hid)) * 0.3, jnp.float32)
    fmod = jnp.asarray(rng.normal(size=(b, 2, hid)) * 0.3, jnp.float32)
    wemb = jnp.asarray(rng.normal(size=(pdim, hid)) * 0.1, jnp.float32)
    bemb = jnp.asarray(rng.normal(size=(hid,)) * 0.1, jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(depth,) + s) * 0.1, jnp.float32) for s in
          [(hid, 3 * hid), (3 * hid,), (hid, hid), (hid,),
           (hid, f), (f,), (f, hid), (hid,)]]
    wfin = jnp.asarray(rng.normal(size=(hid, odim)) * 0.1, jnp.float32)
    bfin = jnp.asarray(rng.normal(size=(odim,)) * 0.1, jnp.float32)
    mask = jnp.asarray(layer_causal_mask((5, 4, 2))) if use_mask else None
    scale = d**-0.5

    vit_args = (tokens, pos, mods, fmod, wemb, bemb, *ws, wfin, bfin)
    argnums = tuple(range(len(vit_args)))

    def vit_loss(bwd, *a):
        return jnp.sum(fdb.fused_vit_forward(*a, mask, h, scale, 1, bwd) ** 2)

    def vit_loss_ref(*a):
        return jnp.sum(fdb.vit_forward_reference(*a, mask, h, scale) ** 2)

    # the residual-saving forward must engage (the hybrid arm exists only
    # over saved residuals)
    _, (_, saved) = fdb._vit_fwd_train(*vit_args, mask, h, scale, 1, "xla")
    assert saved is not None, "train kernel did not engage"

    g_xla = jax.grad(functools.partial(vit_loss, "xla"),
                     argnums=argnums)(*vit_args)
    g_pal = jax.grad(functools.partial(vit_loss, "pallas"),
                     argnums=argnums)(*vit_args)
    g_ref = jax.grad(vit_loss_ref, argnums=argnums)(*vit_args)
    for gx, gp, gr in zip(g_xla, g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gp),
                                   atol=2e-3, rtol=1e-4)

    # no-a1 tier: the XLA backward recomputes a1 with one h2 @ w1 matmul
    orig = fdb.train_residual_bytes
    fdb.train_residual_bytes = (
        lambda n_, h_, f_, d_, rb, save_a1=True:
        (1 << 40) if save_a1 else orig(n_, h_, f_, d_, rb, save_a1))
    try:
        _, (_, saved_na) = fdb._vit_fwd_train(*vit_args, mask, h, scale, 1,
                                              "xla")
        assert saved_na is not None and saved_na[3] is None
        g_na = jax.grad(functools.partial(vit_loss, "xla"),
                        argnums=argnums)(*vit_args)
    finally:
        fdb.train_residual_bytes = orig
    for gx, gn in zip(g_xla, g_na):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gn),
                                   atol=2e-3, rtol=1e-4)

    # block-stack entry point with bwd="xla" vs composed reference
    x0 = jnp.asarray(rng.normal(size=(b, n, hid)), jnp.float32)
    sargs = (x0, mods, *ws)

    def stack_loss(*a):
        return jnp.sum(fdb.fused_dit_stack(*a, mask, h, scale, 1, "xla") ** 2)

    def stack_ref(x, m, *w):
        y = x
        for li in range(depth):
            y = fdb.dit_block_reference(y, m[:, li], *[wi[li] for wi in w],
                                        mask, h, scale)
        return jnp.sum(y ** 2)

    gs_k = jax.grad(stack_loss, argnums=tuple(range(len(sargs))))(*sargs)
    gs_r = jax.grad(stack_ref, argnums=tuple(range(len(sargs))))(*sargs)
    for a, r in zip(gs_k, gs_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-4)

    # ViTParams accepts the new mode and routes it
    from vit4hep_tpu.models.vit import ViTParams

    p = ViTParams.create(dict(
        dim=3, condition_dim=7, hidden_dim=96, out_channels=1, depth=2,
        num_heads=2, mlp_ratio=2, num_patches=[[3, 2, 2]], patch_dim=6,
        fused_block="hybrid",
    ))
    assert p.fused_block == "hybrid"


@pytest.mark.parametrize("use_mask", [False, True])
def test_flash_qkv_attention_matches_xla(use_mask):
    """The fused-layout flash tier (panel-native online softmax) equals XLA
    attention and the fused-layout one-shot kernel, forward and grads, at a
    length that spans multiple key blocks (N=150, blocks 128 -> pad 256)."""
    from vit4hep_tpu.ops.flash_qkv_attention import flash_qkv_attention
    from vit4hep_tpu.ops.fused_qkv_attention import fused_qkv_attention

    rng = np.random.default_rng(11)
    b, h, d, n = 2, 2, 8, 150
    hd = h * d
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * hd)), jnp.float32)
    mask = None
    if use_mask:
        m = rng.random((n, n)) > 0.2
        np.fill_diagonal(m, True)  # no fully-masked rows
        mask = jnp.asarray(m)

    out = flash_qkv_attention(qkv, h, mask, None, 128, 128)

    qkv5 = qkv.reshape(b, n, 3, h, d)
    q, k, v = (jnp.transpose(qkv5[:, :, i], (0, 2, 1, 3)) for i in range(3))
    ref = xla_attention(q, k, v, mask)
    ref = jnp.transpose(ref, (0, 2, 1, 3)).reshape(b, n, hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(fused_qkv_attention(qkv, h, mask, None)),
        atol=2e-5, rtol=1e-5)

    def loss_flash(x):
        return jnp.sum(flash_qkv_attention(x, h, mask, None, 128, 128) ** 2)

    def loss_ref(x):
        x5 = x.reshape(b, n, 3, h, d)
        q, k, v = (jnp.transpose(x5[:, :, i], (0, 2, 1, 3)) for i in range(3))
        o = xla_attention(q, k, v, mask)
        return jnp.sum(jnp.transpose(o, (0, 2, 1, 3)).reshape(b, n, hd) ** 2)

    gf = jax.grad(loss_flash)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=5e-4, rtol=1e-4)


def test_qkv_attention_auto_routes_flash_beyond_vmem():
    """`auto` hands sequences past the fused-layout VMEM bound to the
    panel-native flash tier (not the separated-layout fallback)."""
    import vit4hep_tpu.ops.flash_qkv_attention as fq
    from vit4hep_tpu.ops.attention import qkv_attention

    called = {}
    orig = fq.flash_qkv_attention

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    fq.flash_qkv_attention = spy
    try:
        b, h, d, n = 1, 2, 8, 2176  # > 2048 => beyond the fused bound
        qkv = jnp.zeros((b, n, 3 * h * d), jnp.float32)
        out = qkv_attention(qkv, h)
        assert out.shape == (b, n, h * d)
    finally:
        fq.flash_qkv_attention = orig
    assert called.get("yes"), "auto did not route to flash_qkv_attention"


def test_qkv_attention_flash_falls_back_beyond_panel_bound():
    """Past the panel-residency bound of flash_qkv_attention the dispatcher
    must route to the streaming separated-layout kernel (which compiles at
    any N) instead of producing a raw Mosaic VMEM compile error. Trace-only
    via eval_shape — no 32k-token program actually runs."""
    import vit4hep_tpu.ops.flash_attention as fa
    import vit4hep_tpu.ops.flash_qkv_attention as fq
    from vit4hep_tpu.ops.attention import qkv_attention
    from vit4hep_tpu.ops.flash_qkv_attention import flash_qkv_fits

    h, hd = 6, 480
    n_big = 32768
    assert not flash_qkv_fits(n_big, hd)
    assert flash_qkv_fits(8192, hd)

    called = {}
    orig = fa.flash_attention

    def spy(*a, **k):
        called["streaming"] = True
        return orig(*a, **k)

    fa.flash_attention = spy
    try:
        out = jax.eval_shape(
            lambda x: qkv_attention(x, h),
            jax.ShapeDtypeStruct((1, n_big, 3 * hd), jnp.float32))
    finally:
        fa.flash_attention = orig
    assert out.shape == (1, n_big, hd)
    assert called.get("streaming"), \
        "beyond-bound sequence did not fall back to the streaming kernel"


def test_flash_fully_masked_row_matches_xla():
    """A fully-masked row must produce the XLA tier's output (uniform mean
    over the n_real columns) — NOT a mean polluted by the zero-padded
    columns (regression: round-4 review)."""
    from vit4hep_tpu.ops.flash_qkv_attention import flash_qkv_attention

    rng = np.random.default_rng(21)
    b, h, d, n = 1, 2, 8, 150  # pads to 256: degenerate rows see 106 pad cols
    hd = h * d
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * hd)), jnp.float32)
    m = np.ones((n, n), bool)
    m[7, :] = False  # row 7 attends nothing
    mask = jnp.asarray(m)

    out = flash_qkv_attention(qkv, h, mask, None, 128, 128)

    qkv5 = qkv.reshape(b, n, 3, h, d)
    q, k, v = (jnp.transpose(qkv5[:, :, i], (0, 2, 1, 3)) for i in range(3))
    ref = jnp.transpose(xla_attention(q, k, v, mask),
                        (0, 2, 1, 3)).reshape(b, n, hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    # the separated-layout streaming kernel got the same pad guard
    out_old = flash_attention(q, k, v, mask, 128, 128)
    np.testing.assert_allclose(
        np.asarray(out_old),
        np.asarray(xla_attention(q, k, v, mask)), atol=2e-5)
