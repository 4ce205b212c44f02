"""Energy-decoder megakernel (ops/fused_energy_decoder.py): parity with the
composed ParallelTransformer, param-tree interchangeability, and the
`fused_block: sample` twin mechanism on the energy CFM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit4hep_tpu.models.energy_transformer import ParallelTransformer


def _param(embeds=True, fused=False, dims_c=1, group=16):
    # ds2-energy geometry (configs/model/cfm/cfm_ds2_energy.yaml)
    return dict(
        dims_in=45, dims_c=dims_c, dim_embedding=64, nhead=4,
        num_encoder_layers=2, num_decoder_layers=3, dim_feedforward=256,
        dropout=0.0, activation="relu", embeds=embeds, encode_t_scale=30,
        fused_block=fused, fused_group=group,
    )


def _inputs(key, b=5, dims_in=45, dims_c=1):
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, dims_in))
    t = jax.random.uniform(jax.random.fold_in(key, 2), (b, 1))
    c = jax.random.normal(jax.random.fold_in(key, 3), (b, dims_c))
    return x, t, c


def test_fused_decoder_matches_composed():
    """Same params through both paths: the kernel (interpret mode, f32) must
    reproduce the composed decoder + head elementwise-tightly; group=4 on
    batch 5 also exercises the padding path."""
    net_ref = ParallelTransformer(_param())
    net_fus = ParallelTransformer(_param(fused=True, group=4))

    key = jax.random.PRNGKey(0)
    x, t, c = _inputs(key)
    params = net_ref.init(key, x, t, c)
    # identical param trees: checkpoints interchangeable
    pf = net_fus.init(key, x, t, c)
    assert jax.tree.structure(params) == jax.tree.structure(pf)
    for a, b_ in zip(jax.tree.leaves(params), jax.tree.leaves(pf)):
        assert a.shape == b_.shape

    out_ref = net_ref.apply(params, x, t, c)
    out_fus = net_fus.apply(params, x, t, c)
    np.testing.assert_allclose(np.asarray(out_fus), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_decoder_unconditional_and_jit():
    """condition=None: the zero memory is all-identical tokens, so the
    cross-attention still collapses to a bias — parity must hold there too."""
    net_ref = ParallelTransformer(_param())
    net_fus = ParallelTransformer(_param(fused=True, group=8))

    key = jax.random.PRNGKey(1)
    x, t, _ = _inputs(key, b=8)
    params = net_ref.init(key, x, t, None)
    out_ref = np.asarray(net_ref.apply(params, x, t, None))
    out_fus = np.asarray(jax.jit(
        lambda p, x, t: net_fus.apply(p, x, t, None))(params, x, t))
    np.testing.assert_allclose(out_fus, out_ref, atol=2e-5, rtol=1e-5)


def test_fused_decoder_grads_match_composed():
    """`fused_block: true` training stays functional: the custom VJP
    backpropagates through the composed-math reference."""
    net_ref = ParallelTransformer(_param())
    net_fus = ParallelTransformer(_param(fused=True, group=4))

    key = jax.random.PRNGKey(2)
    x, t, c = _inputs(key, b=4)
    params = net_ref.init(key, x, t, c)

    g_ref = jax.grad(lambda p: jnp.sum(net_ref.apply(p, x, t, c) ** 2))(params)
    g_fus = jax.grad(lambda p: jnp.sum(net_fus.apply(p, x, t, c) ** 2))(params)
    flat_ref = jax.tree.leaves(g_ref)
    flat_fus = jax.tree.leaves(g_fus)
    for a, b_ in zip(flat_ref, flat_fus):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_energy_cfm_sample_mode_twin():
    """`fused_block: sample` on the energy CFM: training loss/grads are
    bitwise the composed program; sample_batch routes through the kernel twin
    and matches the composed sampler."""
    from vit4hep_tpu.models.cfm import CFM

    def build(fused):
        return CFM(
            net=ParallelTransformer(_param(fused=fused)),
            shape=[45],
            odeint_kwargs={"method": "rk4", "options": {"step_size": 0.5}},
        )

    m_ref = build(False)
    m_smp = build("sample")
    assert m_smp.sample_net.cfg.fused_block is True
    assert m_smp.net.cfg.fused_block == "sample"

    key = jax.random.PRNGKey(3)
    params = m_ref.init_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (6, 45))
    c = jax.random.normal(jax.random.fold_in(key, 2), (6, 1))

    g_ref = jax.grad(lambda p: m_ref.batch_loss(p, x, c, key))(params)
    g_smp = jax.grad(lambda p: m_smp.batch_loss(p, x, c, key))(params)
    for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_smp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    s_ref = m_ref.sample_batch(params, c, jax.random.fold_in(key, 4))
    s_smp = m_smp.sample_batch(params, c, jax.random.fold_in(key, 4))
    np.testing.assert_allclose(np.asarray(s_smp), np.asarray(s_ref),
                               atol=1e-4, rtol=1e-4)
