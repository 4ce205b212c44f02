"""Fine-tuning machinery: embedder surgery, param transfer, 3-group optimizer."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from vit4hep_tpu.models import finetuning as ft
from vit4hep_tpu.models.vit import ViTNet, ViTParams


BACKBONE_PARAM = {
    "dim": 3, "condition_dim": 6, "hidden_dim": 48, "depth": 2, "num_heads": 2,
    "mlp_ratio": 2.0, "learn_pos_embed": True, "num_patches": [[5, 1, 3]],
    "patch_dim": 8,
}
TARGET_PARAM = {"num_patches": [[3, 2, 2]], "patch_dim": 12, "condition_dim": 9}


def _init_backbone():
    net = ViTNet(cfg=ViTParams.create(BACKBONE_PARAM))
    x = jnp.zeros((2, 15, 8))
    t = jnp.zeros((2, 1))
    c = jnp.zeros((2, 6))
    return net, net.init(jax.random.PRNGKey(0), x, t, c)


def _ft_cfg(**kw):
    base = dict(
        map_x_embedding=False, map_c_embedding=False,
        reinitialize_x_embedding=False, reinitialize_c_embedding=False,
        reinitialize_pos_embedding=False, reinitialize_final_layer=True,
        interpolate=False,
    )
    base.update(kw)
    return base


def _init_ft(cfg):
    net_cfg = ft.build_ft_vit_params(BACKBONE_PARAM, TARGET_PARAM, cfg)
    net = ViTNet(cfg=net_cfg)
    x = jnp.zeros((2, 12, net_cfg.in_patch_dim or net_cfg.patch_dim))
    t = jnp.zeros((2, 1))
    c = jnp.zeros((2, net_cfg.in_condition_dim or net_cfg.condition_dim))
    return net, net.init(jax.random.PRNGKey(1), x, t, c)


def test_mapper_mode_forward():
    """map_x/map_c: mappers in front of the untouched backbone embedders."""
    cfg = _ft_cfg(map_x_embedding=True, map_c_embedding=True)
    net, params = _init_ft(cfg)
    assert "x_mapper" in params["params"] and "c_mapper" in params["params"]
    # backbone embedder keeps backbone dims
    assert params["params"]["x_embedder"]["kernel"].shape == (8, 48)
    out = net.apply(params, jnp.ones((2, 12, 12)), jnp.zeros((2, 1)), jnp.ones((2, 9)))
    assert out.shape == (2, 12, 12)  # out_patch_dim = target patch_dim


def test_transfer_copies_backbone():
    _, bb_params = _init_backbone()
    cfg = _ft_cfg(map_x_embedding=True, reinitialize_c_embedding=True)
    net, ft_params = _init_ft(cfg)
    merged = ft.transfer_backbone_params(ft_params, bb_params, cfg)
    # blocks + t_embedder transferred verbatim
    for mod in ("block_0", "block_1", "t_embedder", "x_embedder"):
        np.testing.assert_array_equal(
            jax.tree.leaves(merged["params"][mod])[0],
            jax.tree.leaves(bb_params["params"][mod])[0],
        )
    # fresh c_embedder with target condition dim
    assert merged["params"]["c_embedder"]["Dense_0"]["kernel"].shape == (9, 48)
    out = net.apply(merged, jnp.ones((2, 12, 12)), jnp.zeros((2, 1)), jnp.ones((2, 9)))
    assert np.isfinite(np.asarray(out)).all()


def test_transfer_interpolates_x_embedder():
    _, bb_params = _init_backbone()
    cfg = _ft_cfg(interpolate=True)
    net, ft_params = _init_ft(cfg)
    merged = ft.transfer_backbone_params(ft_params, bb_params, cfg)
    k = merged["params"]["x_embedder"]["kernel"]
    assert k.shape == (12, 48)  # resized from (8, 48) to target patch_dim
    # interpolation preserves the mean activation scale approximately
    bb_k = bb_params["params"]["x_embedder"]["kernel"]
    assert abs(float(k.mean()) - float(bb_k.mean())) < 0.1


def test_param_groups_and_optimizer():
    cfg = _ft_cfg(map_x_embedding=True)
    _, ft_params = _init_ft(cfg)
    labels = ft.param_group_labels(ft_params)
    assert labels["params"]["final_layer"]["adaLN_modulation"]["kernel"] == "head"
    assert labels["params"]["x_mapper"]["kernel"] == "embedder"
    assert labels["params"]["block_0"]["adaLN_modulation"]["kernel"] == "backbone"

    class TCfg(dict):
        __getattr__ = dict.get

    tcfg = TCfg(lr=1e-4)
    ft_cfg = TCfg(backbone_lr=1e-5, head_lr=1e-3, embedder_lr=1e-3, **cfg)
    tx = ft.make_ft_optimizer(tcfg, ft_cfg, ft_params)
    opt_state = tx.init(ft_params)

    grads = jax.tree.map(jnp.ones_like, ft_params)
    updates, _ = tx.update(grads, opt_state, ft_params)
    # heads step ~100x larger than backbone (lr ratio)
    head_step = float(jnp.abs(updates["params"]["final_layer"]["adaLN_modulation"]["kernel"]).mean())
    bb_step = float(jnp.abs(updates["params"]["block_0"]["adaLN_modulation"]["kernel"]).mean())
    assert head_step > 10 * bb_step


@pytest.mark.slow
def test_reinit_wins_over_interpolate():
    """ds2tods3_ft sets reinitialize_x_embedding AND interpolate; the
    reference reinitializes (its interpolate is a no-op on the fresh layer),
    so the fine-tune net must KEEP its fresh x_embedder init."""
    import jax
    import numpy as np

    from vit4hep_tpu.models import finetuning as FT
    from vit4hep_tpu.models.vit import ViT

    bb_param = dict(
        dim=3, condition_dim=5, hidden_dim=36, out_channels=1, depth=1,
        num_heads=2, mlp_ratio=2, learn_pos_embed=True,
        num_patches=[[2, 2, 2]], patch_dim=6,
    )
    tgt_param = dict(bb_param, num_patches=[[3, 2, 2]], patch_dim=10)
    cfg = _ft_cfg(reinitialize_x_embedding=True, interpolate=True)

    bb_net = ViT(dict(bb_param))
    x = np.zeros((2, 8, 6), np.float32)
    t = np.zeros((2,), np.float32)
    c = np.zeros((2, 5), np.float32)
    bb_params = bb_net.init(jax.random.PRNGKey(0), x, t, c)

    ft_vit = FT.build_ft_vit_params(bb_param, tgt_param, cfg)
    from vit4hep_tpu.models.vit import ViTNet

    ft_net = ViTNet(cfg=ft_vit)
    xf = np.zeros((2, 12, 10), np.float32)
    ft_params = ft_net.init(jax.random.PRNGKey(1), xf, t, c)
    fresh_kernel = np.array(ft_params["params"]["x_embedder"]["kernel"])

    out = FT.transfer_backbone_params(ft_params, bb_params, cfg)
    np.testing.assert_array_equal(
        np.array(out["params"]["x_embedder"]["kernel"]), fresh_kernel
    )
    # blocks still transferred from the backbone
    np.testing.assert_array_equal(
        np.array(out["params"]["block_0"]["adaLN_modulation"]["kernel"]),
        np.array(bb_params["params"]["block_0"]["adaLN_modulation"]["kernel"]),
    )


def test_map_c_embedding_init_through_cfm():
    """CFM.init_params must build example conditions of the TARGET width when
    the net has a c_mapper (in_condition_dim), or the mapper kernel is created
    against the backbone width and real batches crash."""
    from vit4hep_tpu.models.calochallenge import CaloChallengeCFM
    from vit4hep_tpu.models.finetuning import build_ft_vit_params

    cfg = _ft_cfg(map_x_embedding=False, map_c_embedding=True)
    net_cfg = build_ft_vit_params(BACKBONE_PARAM, TARGET_PARAM, cfg)
    # target grid [[3,2,2]] with patch (1,2,6) -> 12 tokens x patch_dim 12
    model = CaloChallengeCFM(
        net=ViTNet(cfg=net_cfg), shape=[3, 4, 12], patch_shape=[1, 2, 6],
        in_channels=1,
    )
    assert model.condition_dim == TARGET_PARAM["condition_dim"]
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 1, 3, 4, 12))
    t = jnp.zeros((2, 1))
    c = jnp.zeros((2, TARGET_PARAM["condition_dim"]))
    out = model.forward(params, x, t, c)  # target-width conditions must work
    assert out.shape == x.shape
