"""Networks and CFM model wrappers: shapes, init contracts, loss/sampler."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from vit4hep_tpu.models.calochallenge import CaloChallengeCFM, CaloChallengeCFM_DS1
from vit4hep_tpu.models.cfm import CFM
from vit4hep_tpu.models.energy_transformer import ParallelTransformer
from vit4hep_tpu.models.trajectories import linear_trajectory, vp_trajectory
from vit4hep_tpu.models.vit import ViT, ViT1D

VIT_PARAM = {
    "dim": 3,
    "condition_dim": 6,
    "hidden_dim": 48,
    "depth": 2,
    "num_heads": 4,
    "mlp_ratio": 2,
    "num_patches": [[5, 2, 3]],
    "patch_dim": 8,
    "attn_impl": "xla",
}


def test_vit_forward_shape_and_zero_init():
    net = ViT(VIT_PARAM)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 30, 8)), jnp.float32)
    t = jnp.zeros((4, 1))
    c = jnp.ones((4, 6))
    params = net.init(jax.random.PRNGKey(0), x, t, c)
    out = net.apply(params, x, t, c)
    assert out.shape == (4, 30, 8)
    # adaLN-Zero + zero-init final layer => output is exactly zero at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_vit_causal_mask_blocks_future_layers():
    param = dict(VIT_PARAM, causal_attn=True, num_patches=[5, 2, 3])
    net = ViT(param)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 30, 8)), jnp.float32)
    t = jnp.full((2, 1), 0.5)
    c = jnp.ones((2, 6))
    params = net.init(jax.random.PRNGKey(1), x, t, c)

    # perturbing the LAST layer's tokens must not change the FIRST layer's
    # output; the final layer is zero-init so compare through the gradient:
    # d out[first-layer tokens] / d x[last-layer tokens] == 0
    x_pert = x.at[:, -6:, :].add(10.0)

    def first_layer_sum(xin):
        return jnp.sum(net.apply(params, xin, t, c)[:, :6, :] ** 2)

    g = jax.grad(first_layer_sum)(x_pert)
    np.testing.assert_array_equal(np.asarray(g[:, -6:, :]), 0.0)


def test_vit1d_forward_shape():
    param = dict(VIT_PARAM, prod_num_patches=30, x_out=2)
    net = ViT1D(param)
    x = jnp.zeros((3, 30, 8))
    c = jnp.ones((3, 6))
    params = net.init(jax.random.PRNGKey(0), x, c)
    out = net.apply(params, x, c)
    assert out.shape == (3, 30, 16)  # out_channels * x_out * patch_dim


def test_energy_transformer_embeds_true():
    net = ParallelTransformer(
        {"dims_in": 12, "dims_c": 1, "dim_embedding": 16, "nhead": 4,
         "num_encoder_layers": 1, "num_decoder_layers": 2, "dim_feedforward": 32,
         "embeds": True, "encode_t_dim": 16}
    )
    x = jnp.zeros((5, 12))
    t = jnp.full((5, 1), 0.3)
    c = jnp.ones((5, 1))
    params = net.init(jax.random.PRNGKey(0), x, t, c)
    out = net.apply(params, x, t, c)
    assert out.shape == (5, 12)
    assert np.all(np.isfinite(np.asarray(out)))


def test_energy_transformer_onehot_mode_and_unconditional():
    net = ParallelTransformer(
        {"dims_in": 8, "dims_c": 1, "dim_embedding": 16, "nhead": 2,
         "num_encoder_layers": 1, "num_decoder_layers": 1, "dim_feedforward": 32,
         "embeds": False, "encode_t_dim": 32}
    )
    x = jnp.zeros((3, 8))
    t = jnp.full((3, 1), 0.5)
    params = net.init(jax.random.PRNGKey(0), x, t, jnp.ones((3, 1)))
    out_cond = net.apply(params, x, t, jnp.ones((3, 1)))
    assert out_cond.shape == (3, 8)


@pytest.mark.slow
def test_cfm_loss_and_sampler():
    net = ParallelTransformer(
        {"dims_in": 6, "dims_c": 1, "dim_embedding": 16, "nhead": 2,
         "num_encoder_layers": 1, "num_decoder_layers": 1, "dim_feedforward": 32,
         "embeds": True, "encode_t_dim": 16}
    )
    model = CFM(net, shape=[6], odeint_kwargs={"method": "rk4", "options": {"step_size": 0.25}})
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 6)), jnp.float32)
    c = jnp.ones((8, 1))
    loss = model.batch_loss(params, x, c, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    sample = model.sample_batch(params, c, jax.random.PRNGKey(2))
    assert sample.shape == (8, 6)
    assert model.net_evals_per_sample() == 16  # 4 evals x 4 steps
    # non-dividing step sizes cost one truncated extra step (torchdiffeq
    # fixed-grid semantics mirrored by ops/ode.py:grid_steps)
    model_frac = CFM(net, shape=[6],
                     odeint_kwargs={"method": "rk4", "options": {"step_size": 0.4}})
    assert model_frac.net_evals_per_sample() == 12  # 2 full + 1 remainder


def test_calochallenge_cfm_patching_model():
    net = ViT(dict(VIT_PARAM, patch_dim=6))  # 3*2*1 voxels per patch
    model = CaloChallengeCFM(
        net,
        patch_shape=[3, 2, 1],
        shape=[15, 4, 3],
        in_channels=1,
        odeint_kwargs={"method": "euler", "options": {"step_size": 0.5}},
    )
    assert model.num_patches == (5, 2, 3)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 1, 15, 4, 3)), jnp.float32)
    c = jnp.ones((4, 6))
    loss = model.batch_loss(params, x, c, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    sample = model.sample_batch(params, c, jax.random.PRNGKey(2))
    assert sample.shape == (4, 1, 15, 4, 3)


def test_calochallenge_ds1_multisection_model():
    param = dict(VIT_PARAM, condition_dim=4, patch_dim=2)  # 2*1*1 voxels per patch
    net = ViT(param)
    model = CaloChallengeCFM_DS1(
        net,
        list_shape=[[2, 2, 2], [4, 2, 2]],
        list_edges=[8, 16],
        patch_shape=[2, 1, 1],
        shape=[24],
        odeint_kwargs={"method": "euler", "options": {"step_size": 0.5}},
    )
    # net config rebuilt with per-section patch grids
    assert model.net.cfg.num_patches == ((1, 2, 2), (2, 2, 2))
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 24)), jnp.float32)
    c = jnp.ones((2, 4))
    loss = model.batch_loss(params, x, c, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    s = model.sample_batch(params, c, jax.random.PRNGKey(2))
    assert s.shape == (2, 1, 24)


def test_trajectories():
    x0 = jnp.zeros((4, 3))
    x1 = jnp.ones((4, 3))
    t = jnp.full((4, 1), 0.25)
    xt, xdot = linear_trajectory(x0, x1, t)
    np.testing.assert_allclose(np.asarray(xt), 0.25)
    np.testing.assert_allclose(np.asarray(xdot), 1.0)
    xt, xdot = vp_trajectory(x0, x1, t)
    assert np.all(np.isfinite(np.asarray(xt))) and np.all(np.isfinite(np.asarray(xdot)))


@pytest.mark.slow
def test_ar_transformer_loss_and_sampling():
    """Legacy AR energy net: teacher-forced loss + dimension-by-dimension sampling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit4hep_tpu.models.ar_transformer import ARtransformer

    model = ARtransformer({
        "shape": [4], "n_con": 1, "dim_embedding": 32, "n_head": 2,
        "n_encoder_layers": 1, "n_decoder_layers": 1, "dim_feedforward": 64,
        "intermediate_dim": 64, "layers_per_block": 3,
        "solver_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
    })
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 4)), jnp.float32)
    c = jnp.asarray(np.random.default_rng(1).normal(size=(6, 1)), jnp.float32)
    loss = model.batch_loss(params, x, c, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    sample = model.sample_batch(params, c, jax.random.PRNGKey(2))
    assert sample.shape == (6, 4)
    assert np.isfinite(np.asarray(sample)).all()


@pytest.mark.slow
def test_fused_mlp_block_equivalence():
    """fused_mlp=True produces the same outputs and the same param tree as the
    unfused DiT block (checkpoint compatible)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit4hep_tpu.models.vit import ViT

    base = {"dim": 3, "condition_dim": 4, "hidden_dim": 48, "depth": 2,
            "num_heads": 2, "mlp_ratio": 2.0, "num_patches": [[3, 2, 2]],
            "patch_dim": 6, "learn_pos_embed": True}
    net_a = ViT(base)
    net_b = ViT({**base, "fused_mlp": True})
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(k, 1), (4, 12, 6))
    t = jnp.full((4, 1), 0.3)
    c = jax.random.normal(jax.random.fold_in(k, 2), (4, 4))
    params = net_a.init(k, x, t, c)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        net_b.init(k, x, t, c)
    )
    params["params"]["final_layer"]["Dense_0"]["kernel"] = (
        jax.random.normal(k, params["params"]["final_layer"]["Dense_0"]["kernel"].shape) * 0.1
    )
    out_a = net_a.apply(params, x, t, c)
    out_b = net_b.apply(params, x, t, c)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a), rtol=5e-4, atol=1e-5)
    # gradients flow through the custom VJP
    g = jax.grad(lambda p: jnp.mean(net_b.apply(p, x, t, c) ** 2))(params)
    g_ref = jax.grad(lambda p: jnp.mean(net_a.apply(p, x, t, c) ** 2))(params)
    np.testing.assert_allclose(
        np.asarray(g["params"]["block_0"]["MlpBlock_0"]["Dense_0"]["kernel"]),
        np.asarray(g_ref["params"]["block_0"]["MlpBlock_0"]["Dense_0"]["kernel"]),
        rtol=1e-3, atol=1e-6,
    )


@pytest.mark.slow
def test_ar_transformer_layer_cond_and_embeds():
    """layer_cond appends the per-dimension one-hot in BOTH training and
    sampling (the reference does, transformer.py:166-173); learned x/c embeds
    exercise the Linear(-ReLU)-Linear embedding nets."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit4hep_tpu.models.ar_transformer import ARtransformer

    model = ARtransformer({
        "shape": [3], "n_con": 1, "dim_embedding": 32, "n_head": 2,
        "n_encoder_layers": 1, "n_decoder_layers": 1, "dim_feedforward": 64,
        "intermediate_dim": 64, "layers_per_block": 3,
        "layer_cond": True, "x_embed": True, "c_embed": True,
        "solver_kwargs": {"method": "euler", "options": {"step_size": 0.5}},
    })
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)
    c = jnp.asarray(np.random.default_rng(1).normal(size=(4, 1)), jnp.float32)
    loss = model.batch_loss(params, x, c, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    sample = model.sample_batch(params, c, jax.random.PRNGKey(2))
    assert sample.shape == (4, 3)
    assert np.isfinite(np.asarray(sample)).all()
