"""Cross-framework numerical parity vs the actual reference implementation.

These tests import the reference's torch modules from ``/root/reference``
(read-only mount), transfer their randomly-initialized weights into our Flax
models via :mod:`vit4hep_tpu.utils.torch_migration`, and assert the two
frameworks compute the same function. This is a stronger statement than the
self-goldens in ``test_golden.py``: it pins our numerics to the reference's,
and it exercises the torch->flax checkpoint migration path end to end.

The reference imports ``timm`` and ``xformers`` at module scope (neither is in
this image); both are stubbed with behavior-identical shims before import.
Everything skips cleanly when ``/root/reference`` is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "nn")),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_vit_module():
    """Import the reference ``nn.vit`` with timm/xformers shims installed."""
    import torch.nn as tnn

    if "timm" not in sys.modules:
        # timm.models.vision_transformer.Mlp: fc1 -> act -> drop -> fc2 -> drop
        # (we only need eval-mode numerics and the fc1/fc2 param names)
        class Mlp(tnn.Module):
            def __init__(self, in_features, hidden_features, act_layer, drop=0.0):
                super().__init__()
                self.fc1 = tnn.Linear(in_features, hidden_features)
                self.act = act_layer()
                self.fc2 = tnn.Linear(hidden_features, in_features)
                self.drop = tnn.Dropout(drop)

            def forward(self, x):
                return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_vt = types.ModuleType("timm.models.vision_transformer")
        timm_vt.Mlp = Mlp
        timm.models = timm_models
        timm_models.vision_transformer = timm_vt
        sys.modules.update({
            "timm": timm,
            "timm.models": timm_models,
            "timm.models.vision_transformer": timm_vt,
        })
    if "xformers" not in sys.modules:
        xf = types.ModuleType("xformers")
        xf_ops = types.ModuleType("xformers.ops")

        def memory_efficient_attention(*a, **k):  # tests use use_torch_sdpa=True
            raise RuntimeError("xformers stub: set use_torch_sdpa=True")

        xf_ops.memory_efficient_attention = memory_efficient_attention
        xf.ops = xf_ops
        sys.modules.update({"xformers": xf, "xformers.ops": xf_ops})

    sys.path.insert(0, REFERENCE)
    try:
        import nn.vit as ref_vit
    finally:
        sys.path.remove(REFERENCE)
    return ref_vit


VIT_PARAM = {
    "dim": 3,
    "condition_dim": 7,
    "hidden_dim": 48,
    "out_channels": 1,
    "depth": 2,
    "num_heads": 4,
    "mlp_ratio": 2.0,
    "learn_pos_embed": True,
    "causal_attn": False,
    "patch_dim": 10,
    "num_patches": [[4, 2, 3]],
    "use_torch_sdpa": True,
}


def _forward_pair(ref_vit_module, param, vit1d=False, seed=0):
    """Build the reference net, migrate weights, run both forwards."""
    import jax.numpy as jnp

    from vit4hep_tpu.models.vit import ViT, ViT1D
    from vit4hep_tpu.utils.torch_migration import convert_vit_state_dict

    torch.manual_seed(seed)
    gen = np.random.default_rng(seed)
    n_tokens = int(np.prod(param["num_patches"]))
    x = gen.standard_normal((3, n_tokens, param["patch_dim"]), dtype=np.float32)
    c = gen.standard_normal((3, param["condition_dim"]), dtype=np.float32)

    if vit1d:
        ref = ref_vit_module.ViT1D({**param, "prod_num_patches": n_tokens})
        ours = ViT1D({**param, "prod_num_patches": n_tokens})
        args_t = (torch.from_numpy(x), torch.from_numpy(c))
        args_j = (jnp.asarray(x), jnp.asarray(c))
    else:
        ref = ref_vit_module.ViT(param)
        ours = ViT(param)
        t = gen.uniform(0, 1, (3, 1)).astype(np.float32)
        args_t = (torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(c))
        args_j = (jnp.asarray(x), jnp.asarray(t), jnp.asarray(c))

    ref.eval()
    with torch.no_grad():
        out_ref = ref(*args_t).numpy()

    variables = convert_vit_state_dict(ref.state_dict(), vit1d=vit1d)
    out_ours = np.asarray(ours.apply(variables, *args_j))
    return out_ref, out_ours


def test_vit_forward_matches_reference(ref_vit_module):
    """Same weights -> same velocity field, across frameworks (<=1e-5 abs).

    adaLN/final layers are zero-init upstream, so perturb them to expose the
    full depth of the network, not just the skip path.
    """
    torch.manual_seed(3)
    param = dict(VIT_PARAM)
    ref = ref_vit_module.ViT(param)
    for name, p in ref.named_parameters():
        if "adaLN" in name or "final_layer.linear" in name:
            with torch.no_grad():
                p.copy_(0.05 * torch.randn_like(p))

    import jax.numpy as jnp

    from vit4hep_tpu.models.vit import ViT
    from vit4hep_tpu.utils.torch_migration import convert_vit_state_dict

    gen = np.random.default_rng(1)
    x = gen.standard_normal((2, 24, 10), dtype=np.float32)
    t = gen.uniform(0, 1, (2, 1)).astype(np.float32)
    c = gen.standard_normal((2, 7), dtype=np.float32)
    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(c)).numpy()
    out_ours = np.asarray(
        ViT(param).apply(
            convert_vit_state_dict(ref.state_dict()),
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(c),
        )
    )
    assert out_ref.shape == out_ours.shape
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5, rtol=1e-4)


def test_vit_zero_init_parity(ref_vit_module):
    """At init both frameworks output exactly zero (adaLN-Zero final layer)."""
    out_ref, out_ours = _forward_pair(ref_vit_module, VIT_PARAM, seed=11)
    assert np.all(out_ref == 0.0)
    assert np.all(out_ours == 0.0)


def test_vit_sincos_and_causal_parity(ref_vit_module):
    """Fixed sin-cos cylindrical pos-embed + layer-causal mask, full forward."""
    # the reference's sincos + causal paths unpack a FLAT [L, A, R]
    # (nn/vit.py:107,497) while create_meshgrid wants the nested form —
    # our ViTParams normalizes both, so feed the flat form to each side
    param = {
        **VIT_PARAM,
        "learn_pos_embed": False,
        "pos_embedding_coords": "cylindrical",
        "causal_attn": True,
        "num_patches": [4, 2, 3],
    }
    torch.manual_seed(5)
    ref = ref_vit_module.ViT(param)
    for name, p in ref.named_parameters():
        if "adaLN" in name or "final_layer.linear" in name:
            with torch.no_grad():
                p.copy_(0.05 * torch.randn_like(p))

    import jax.numpy as jnp

    from vit4hep_tpu.models.vit import ViT
    from vit4hep_tpu.utils.torch_migration import convert_vit_state_dict

    gen = np.random.default_rng(2)
    x = gen.standard_normal((2, 24, 10), dtype=np.float32)
    t = gen.uniform(0, 1, (2, 1)).astype(np.float32)
    c = gen.standard_normal((2, 7), dtype=np.float32)
    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(c)).numpy()
    out_ours = np.asarray(
        ViT(param).apply(
            convert_vit_state_dict(ref.state_dict()),
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(c),
        )
    )
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5, rtol=1e-4)


def test_finetuned_vit_forward_matches_reference(ref_vit_module):
    """Fine-tuned checkpoints (embedder mappers from add_embedding_layers,
    experiment_finetuning.py:78-118) convert to our x_mapper/c_mapper layout
    and produce the same forward."""
    import torch.nn as tnn

    import jax.numpy as jnp

    from vit4hep_tpu.models.vit import ViT
    from vit4hep_tpu.utils.torch_migration import convert_vit_state_dict

    NEW_PATCH, NEW_COND = 6, 3
    torch.manual_seed(61)
    ref = ref_vit_module.ViT(VIT_PARAM)
    for name, p in ref.named_parameters():
        if "adaLN" in name or "final_layer.linear" in name:
            with torch.no_grad():
                p.copy_(0.05 * torch.randn_like(p))
    # replicate add_embedding_layers' map_x/c_embedding surgery
    ref.x_embedder = tnn.Sequential(
        tnn.Linear(NEW_PATCH, VIT_PARAM["patch_dim"]), tnn.SiLU(), ref.x_embedder
    )
    ref.c_embedder = tnn.Sequential(
        tnn.Linear(NEW_COND, VIT_PARAM["condition_dim"]), tnn.SiLU(), ref.c_embedder
    )
    ref.eval()

    gen = np.random.default_rng(7)
    x = gen.standard_normal((2, 24, NEW_PATCH), dtype=np.float32)
    t = gen.uniform(0, 1, (2, 1)).astype(np.float32)
    c = gen.standard_normal((2, NEW_COND), dtype=np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(c)).numpy()

    ours = ViT({**VIT_PARAM, "in_patch_dim": NEW_PATCH, "in_condition_dim": NEW_COND})
    out_ours = np.asarray(
        ours.apply(
            convert_vit_state_dict(ref.state_dict()),
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(c),
        )
    )
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5, rtol=1e-4)


def test_vit1d_forward_matches_reference(ref_vit_module):
    """ViT1D (cINN subnet backbone): same weights -> same output."""
    param = {**VIT_PARAM, "x_out": 2}
    torch.manual_seed(7)
    n_tokens = int(np.prod(param["num_patches"]))
    ref = ref_vit_module.ViT1D({**param, "prod_num_patches": n_tokens})
    for name, p in ref.named_parameters():
        if "adaLN" in name or "final_layer.linear" in name:
            with torch.no_grad():
                p.copy_(0.05 * torch.randn_like(p))

    import jax.numpy as jnp

    from vit4hep_tpu.models.vit import ViT1D
    from vit4hep_tpu.utils.torch_migration import convert_vit_state_dict

    gen = np.random.default_rng(3)
    x = gen.standard_normal((2, n_tokens, 10), dtype=np.float32)
    c = gen.standard_normal((2, 7), dtype=np.float32)
    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(c)).numpy()
    out_ours = np.asarray(
        ViT1D({**param, "prod_num_patches": n_tokens}).apply(
            convert_vit_state_dict(ref.state_dict(), vit1d=True),
            jnp.asarray(x), jnp.asarray(c),
        )
    )
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5, rtol=1e-4)


def test_timestep_embedding_parity(ref_vit_module):
    from vit4hep_tpu.ops.pos_embed import timestep_embedding

    t = np.linspace(0, 1, 9, dtype=np.float32).reshape(-1, 1)
    ref = ref_vit_module.TimestepEmbedder.timestep_embedding(
        torch.from_numpy(t), 256
    ).numpy()
    ours = np.asarray(timestep_embedding(t, 256))
    np.testing.assert_allclose(ours, ref.reshape(ours.shape), atol=1e-6)


@pytest.fixture(scope="module")
def ref_energy_module():
    sys.path.insert(0, REFERENCE)
    try:
        import nn.cfm.transformer_cfm as ref_energy
    finally:
        sys.path.remove(REFERENCE)
    return ref_energy


ENERGY_PARAM = {
    "dims_in": 5,
    "dims_c": 1,
    "dim_embedding": 16,
    "nhead": 2,
    "num_encoder_layers": 1,
    "num_decoder_layers": 2,
    "dim_feedforward": 32,
    "embeds": True,
    "encode_t_dim": 16,
}


def _energy_forward_pair(ref_energy_module, param, conditional=True, seed=0):
    import jax.numpy as jnp

    from vit4hep_tpu.models.energy_transformer import ParallelTransformer
    from vit4hep_tpu.utils.torch_migration import convert_energy_state_dict

    torch.manual_seed(seed)
    ref = ref_energy_module.ParallelTransformer(param)
    ref.eval()

    gen = np.random.default_rng(seed)
    x = gen.standard_normal((4, param["dims_in"]), dtype=np.float32)
    t = gen.uniform(0, 1, (4, 1)).astype(np.float32)
    c = gen.standard_normal((4, param["dims_c"]), dtype=np.float32) if conditional else None
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x), torch.from_numpy(t),
            None if c is None else torch.from_numpy(c),
        ).numpy()

    variables, config_patch = convert_energy_state_dict(ref.state_dict())
    ours = ParallelTransformer({**param, **config_patch})
    out_ours = np.asarray(
        ours.apply(variables, jnp.asarray(x), jnp.asarray(t),
                   None if c is None else jnp.asarray(c))
    )
    return out_ref, out_ours


def test_energy_transformer_parity_embeds(ref_energy_module):
    """Conditional embeds=true (the live ds2/ds3 energy configs' mode)."""
    out_ref, out_ours = _energy_forward_pair(ref_energy_module, ENERGY_PARAM, seed=13)
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5, rtol=1e-4)


def test_energy_transformer_parity_onehot(ref_energy_module):
    """Conditional embeds=false (one-hot + zero-padding embedding mode)."""
    param = {**ENERGY_PARAM, "embeds": False, "dim_embedding": 16}
    out_ref, out_ours = _energy_forward_pair(ref_energy_module, param, seed=17)
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5, rtol=1e-4)


def test_energy_transformer_parity_unconditional(ref_energy_module):
    """Decoder-only unconditional path (reference transformer_cfm.py:100-108;
    only well-formed for embeds=true, where d_model == 2 * dim_embedding)."""
    out_ref, out_ours = _energy_forward_pair(
        ref_energy_module, ENERGY_PARAM, conditional=False, seed=19
    )
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5, rtol=1e-4)


def test_sincos_pos_embed_parity(ref_vit_module):
    from vit4hep_tpu.ops.pos_embed import get_sincos_pos_embed

    for coords in ("cylindrical", "cartesian"):
        ref = ref_vit_module.get_sincos_pos_embed(coords, [5, 4, 3], 48, 3, 10000)
        ours = np.asarray(get_sincos_pos_embed(coords, [5, 4, 3], 48, 3, 10000))
        np.testing.assert_allclose(
            ours, np.asarray(ref), atol=1e-5, err_msg=f"coords={coords}"
        )


# ---------------------------------------------------------------------------
# warm start directly from a reference .pt checkpoint
# ---------------------------------------------------------------------------
def test_torch_checkpoint_warm_start(ref_vit_module, tmp_path):
    """_restore_state_from_torch migrates model + EMA from a reference-format
    model_run<i>.pt (keys net.<param>; torch_ema shadow list) into TrainState."""
    import jax
    import optax

    from vit4hep_tpu.experiments.base import BaseExperiment
    from vit4hep_tpu.experiments.train_state import create_train_state
    from vit4hep_tpu.models.vit import ViT
    from vit4hep_tpu.utils.config import Config
    from vit4hep_tpu.utils.torch_migration import convert_vit_state_dict

    torch.manual_seed(23)
    ref = ref_vit_module.ViT(VIT_PARAM)
    for name, p in ref.named_parameters():
        if "adaLN" in name or "final_layer.linear" in name:
            with torch.no_grad():
                p.copy_(0.05 * torch.randn_like(p))
    ckpt = {
        "model": {f"net.{k}": v for k, v in ref.state_dict().items()},
        "optimizer": {},
        "scheduler": None,
        "ema": {
            "decay": 0.9999,
            "num_updates": 7,
            "shadow_params": [
                0.5 * p.detach().clone() for p in ref.parameters() if p.requires_grad
            ],
        },
    }
    path = tmp_path / "model_run0.pt"
    torch.save(ckpt, str(path))

    ours = ViT(VIT_PARAM)
    k = jax.random.PRNGKey(0)
    gen = np.random.default_rng(0)
    params = ours.init(
        k,
        gen.standard_normal((2, 24, 10), dtype=np.float32),
        gen.uniform(0, 1, (2, 1)).astype(np.float32),
        gen.standard_normal((2, 7), dtype=np.float32),
    )
    state = create_train_state(params, optax.adam(1e-3), use_ema=True)

    class _Shim:
        cfg = Config({"model": {"net": {"_target_": "nn.vit.ViT"}}})
        use_ema = True
        model = None

    new_state = BaseExperiment._restore_state_from_torch(_Shim(), state, str(path))

    expected = convert_vit_state_dict(
        {k[len("net."):]: v for k, v in ckpt["model"].items()}
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, atol=1e-7),
        new_state.params, expected,
    )
    # EMA shadows were 0.5 * params
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), 0.5 * np.asarray(b), atol=1e-7),
        new_state.ema_params, new_state.params,
    )
    assert int(new_state.ema_updates) == 7


@pytest.mark.slow
def test_finetune_from_torch_backbone(ref_vit_module, tmp_path):
    """Fine-tuning (FTMixin.init_model) accepts a reference torch backbone run
    dir: the backbone .pt is converted before transfer_backbone_params."""
    from tests.test_finetuning_e2e import BB, TG, _geo, _shape_cfg

    from vit4hep_tpu.experiments.calochallenge_finetuning import CaloChallengeFTCFM
    from vit4hep_tpu.utils.config import Config, OmegaConf

    bb_geo = _geo(tmp_path, "bb", seed=0, **BB)
    bb_cfg = Config(_shape_cfg(
        tmp_path, bb_geo, "FT_backbone", "bb", cond_dim=BB["n_layers"] + 1,
        patch_grid=[4, 1, 3], patch_dim=4,
    ))
    bb_run = tmp_path / "runs" / "FT_backbone" / "bb"
    (bb_run / "models").mkdir(parents=True)
    bb_cfg.run_dir = str(bb_run)
    bb_cfg.run_idx = 0
    (bb_run / "config_0.yaml").write_text(OmegaConf.to_yaml(bb_cfg))

    torch.manual_seed(73)
    ref_backbone = ref_vit_module.ViT(bb_cfg.model.net.param.to_container())
    torch.save(
        {"model": {f"net.{k}": v for k, v in ref_backbone.state_dict().items()},
         "optimizer": {}, "scheduler": None, "ema": None},
        str(bb_run / "models" / "model_run0.pt"),
    )

    tg_geo = _geo(tmp_path, "tg", seed=1, **TG)
    ft_cfg = _shape_cfg(
        tmp_path, tg_geo, "FT_target", "ft", cond_dim=TG["n_layers"] + 1,
        patch_grid=[4, 1, 3], patch_dim=2,
    )
    ft_cfg["exp_type"] = "calochallenge_ft_cfm"
    ft_cfg["training"]["iterations"] = 5
    ft_cfg["finetuning"] = {
        "backbone_cfg": str(bb_run / "config_0.yaml"),
        "backbone_lr": 1e-5, "head_lr": 1e-3, "embedder_lr": 1e-3,
        "map_x_embedding": True, "map_c_embedding": False,
        "reinitialize_x_embedding": False, "reinitialize_c_embedding": False,
        "reinitialize_pos_embedding": True, "reinitialize_final_layer": True,
        "interpolate": False,
    }
    exp = CaloChallengeFTCFM(Config(ft_cfg))
    exp()
    assert all(np.isfinite(v) for v in exp.train_loss)
    # the backbone block weights came from the torch checkpoint and are
    # frozen-ish under the tiny backbone_lr (5 steps at 1e-5 move them ~5e-5;
    # x_embedder belongs to the embedder group and trains at embedder_lr)
    got = np.asarray(
        exp.state.params["params"]["block_0"]["Attention_0"]["Dense_0"]["kernel"]
    )
    want = ref_backbone.blocks[0].attn.qkv.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.slow
def test_torch_pt_warm_start_e2e(ref_energy_module, tmp_path, shower_file, geometry):
    """Drop-in migration: a run dir holding only a reference-format
    models/model_run0.pt warm-starts `train=false` sampling end to end."""
    from tests.test_experiment_e2e import make_cfg

    from vit4hep_tpu.experiments.calochallenge import CaloChallenge

    cfg = make_cfg(tmp_path, shower_file, geometry)
    net_param = cfg.model.net.param.to_container()

    torch.manual_seed(31)
    ref = ref_energy_module.ParallelTransformer(net_param)
    run_dir = tmp_path / "runs" / "TestE2E" / "run_torchpt"
    (run_dir / "models").mkdir(parents=True)
    torch.save(
        {
            "model": {f"net.{k}": v for k, v in ref.state_dict().items()},
            "optimizer": {},
            "scheduler": None,
            "ema": {
                "decay": 0.999,
                "num_updates": 11,
                "shadow_params": [
                    p.detach().clone() for p in ref.parameters() if p.requires_grad
                ],
            },
        },
        str(run_dir / "models" / "model_run0.pt"),
    )

    cfg.run_name = "run_torchpt"
    cfg.use_mlflow = False
    cfg.train = False
    cfg.warm_start_idx = 0
    cfg.run_idx = 0
    cfg.run_dir = str(run_dir)
    exp = CaloChallenge(cfg)
    exp()
    assert int(exp.state.ema_updates) == 11
    assert exp.cfg.model.net.param.fourier_w is not None
    # the fourier_w patch must be re-snapshotted so later orbax resumes of
    # this run rebuild the same time features (full_run saves config.yaml
    # before the warm-start restore applies the patch)
    assert "fourier_w" in (run_dir / "config.yaml").read_text()
    samples, conds = exp.sample_n()
    assert samples.shape == (300, 5)
    assert np.all(np.isfinite(samples))


def test_grad_clip_parity():
    """Global-norm and value clipping match torch.nn.utils semantics."""
    import jax
    import jax.numpy as jnp

    from vit4hep_tpu.experiments.train_state import (
        _clip_by_global_norm,
        _clip_by_value,
        global_norm,
    )

    gen = np.random.default_rng(103)
    grads = {"a": gen.standard_normal((4, 5)).astype(np.float32),
             "b": gen.standard_normal(7).astype(np.float32)}

    params_t = [torch.nn.Parameter(torch.zeros_like(torch.from_numpy(g)))
                for g in grads.values()]
    for p, g in zip(params_t, grads.values()):
        p.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_norm_(params_t, max_norm=1.5)
    clipped_t = [p.grad.numpy() for p in params_t]

    grads_j = jax.tree.map(jnp.asarray, grads)
    clipped_j = _clip_by_global_norm(grads_j, global_norm(grads_j), 1.5)
    for ours, theirs in zip(clipped_j.values(), clipped_t):
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)

    for p, g in zip(params_t, grads.values()):
        p.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_value_(params_t, clip_value=0.5)
    clipped_t = [p.grad.numpy() for p in params_t]
    clipped_j = _clip_by_value(grads_j, 0.5)
    for ours, theirs in zip(clipped_j.values(), clipped_t):
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=0)


@pytest.mark.parametrize("opt_name", ["Adam", "AdamW", "RAdam"])
def test_optimizer_step_parity(opt_name):
    """One optimizer step on identical params/grads matches torch, including
    the coupled-L2 weight decay of torch Adam/RAdam (AdamW is decoupled)."""
    import jax.numpy as jnp

    from vit4hep_tpu.experiments.train_state import make_optimizer
    from vit4hep_tpu.utils.config import Config

    gen = np.random.default_rng(101)
    p0 = gen.standard_normal(32).astype(np.float32)
    g = gen.standard_normal(32).astype(np.float32)
    lr, wd = 1e-2, 0.1

    p_t = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt_cls = {"Adam": torch.optim.Adam, "AdamW": torch.optim.AdamW,
               "RAdam": torch.optim.RAdam}[opt_name]
    opt = opt_cls([p_t], lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd)
    n_steps = 3
    for _ in range(n_steps):
        opt.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt.step()

    cfg = Config({"optimizer": opt_name, "lr": lr, "betas": [0.9, 0.999],
                  "eps": 1e-8, "weight_decay": wd, "iterations": 10,
                  "scheduler": None})
    tx = make_optimizer(cfg)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for _ in range(n_steps):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates
    np.testing.assert_allclose(
        np.asarray(params), p_t.detach().numpy(), atol=1e-6, rtol=1e-5
    )


def test_net_kind_classification():
    from vit4hep_tpu.utils.torch_migration import net_kind_from_target

    assert net_kind_from_target("nn.vit.ViT") == "vit"
    assert net_kind_from_target("vit4hep_tpu.models.vit.ViT") == "vit"
    assert net_kind_from_target("nn.vit.ViT1D") == "vit1d"
    assert net_kind_from_target("nn.cfm.transformer_cfm.ParallelTransformer") == "energy"
    # the native path contains "vit" in the package prefix — must NOT match ViT
    assert net_kind_from_target(
        "vit4hep_tpu.models.energy_transformer.ParallelTransformer"
    ) == "energy"
    with pytest.raises(ValueError):
        net_kind_from_target("models.base_model.CINN")


def test_strip_prefixes_ddp_stacked():
    """DDP-saved reference checkpoints carry net.module.<param> keys."""
    from vit4hep_tpu.utils.torch_migration import strip_state_dict_prefixes

    sd = {"net.module.x_embedder.weight": 1, "net.pos_embed_freqs": 2, "plain": 3}
    out = strip_state_dict_prefixes(sd)
    assert set(out) == {"x_embedder.weight", "pos_embed_freqs", "plain"}


@pytest.mark.slow
def test_two_stage_from_torch_run_dirs(ref_vit_module, ref_energy_module, tmp_path):
    """The full framework-switch scenario: run dirs for BOTH stages contain
    only reference-format artifacts (config.yaml, models/model_run0.pt,
    stats .npy) — no orbax checkpoints. `train=false warm_start_idx=0
    sample_us=true` must load the shape model via the torch warm-start path,
    load + migrate the energy model inside sample_us, and produce finite
    physical showers."""
    from tests.test_two_stage_e2e import (
        N_ALPHA,
        N_LAYERS,
        N_R,
        N_VOX,
        _energy_cfg,
        _shape_cfg,
    )
    from tests.conftest import make_binning_xml, make_shower_hdf5

    from vit4hep_tpu.experiments.calochallenge import CaloChallenge
    from vit4hep_tpu.utils.config import OmegaConf

    xml = make_binning_xml(tmp_path / "binning.xml", n_layers=N_LAYERS, n_r=N_R,
                           n_alpha=N_ALPHA)
    h5 = make_shower_hdf5(tmp_path / "showers.hdf5", n_events=256, n_voxels=N_VOX)
    geo = {"xml": str(xml), "h5": str(h5)}

    def write_pt(run_dir, cfg, net_sd):
        run_dir.mkdir(parents=True)
        (run_dir / "models").mkdir()
        cfg.run_dir = str(run_dir)
        (run_dir / "config.yaml").write_text(OmegaConf.to_yaml(cfg))
        torch.save(
            {"model": {f"net.{k}": v for k, v in net_sd.items()},
             "optimizer": {}, "scheduler": None, "ema": None},
            str(run_dir / "models" / "model_run0.pt"),
        )

    # --- energy run dir (reference ParallelTransformer weights + u stats)
    e_cfg = _energy_cfg(tmp_path, geo)
    torch.manual_seed(53)
    ref_energy = ref_energy_module.ParallelTransformer(
        e_cfg.model.net.param.to_container()
    )
    e_dir = tmp_path / "runs" / "E2E_energy" / "energy"
    write_pt(e_dir, e_cfg, ref_energy.state_dict())
    np.save(e_dir / "means_u.npy", np.zeros(N_LAYERS, np.float32))
    np.save(e_dir / "stds_u.npy", np.ones(N_LAYERS, np.float32))

    # --- shape run dir (reference ViT weights + voxel stats)
    s_cfg = _shape_cfg(tmp_path, geo)
    torch.manual_seed(59)
    ref_vit = ref_vit_module.ViT(s_cfg.model.net.param.to_container())
    s_dir = tmp_path / "runs" / "E2E_shape" / "shape"
    write_pt(s_dir, s_cfg, ref_vit.state_dict())
    np.save(s_dir / "means.npy", np.zeros((), np.float32))
    np.save(s_dir / "stds.npy", np.ones((), np.float32))

    # --- sample through both migrated models
    cfg = _shape_cfg(tmp_path, geo)
    cfg.train = False
    cfg.warm_start_idx = 0
    cfg.run_idx = 0
    cfg.run_dir = str(s_dir)
    exp = CaloChallenge(cfg)
    exp()
    samples, conds = exp.sample_n()
    assert samples.shape == (48, 1, N_LAYERS, N_ALPHA, N_R)
    assert np.isfinite(np.asarray(samples)).all()
    # the energy net's frozen Fourier weights came from the torch checkpoint
    fourier_w = np.asarray(exp.energy_model.net.cfg.fourier_w)
    np.testing.assert_allclose(
        fourier_w, ref_energy.time_embed[0].W.detach().numpy(), atol=1e-7
    )


def test_energy_ema_shadow_mapping(ref_energy_module):
    """torch_ema shadow ordering for the energy net (shared head module,
    frozen Fourier weights) maps onto the same tree as the model weights."""
    from vit4hep_tpu.utils.torch_migration import (
        convert_ema_state_dict,
        convert_energy_state_dict,
    )

    torch.manual_seed(29)
    ref = ref_energy_module.ParallelTransformer(ENERGY_PARAM)
    model_sd = ref.state_dict()
    ema_sd = {
        "decay": 0.9999,
        "num_updates": 3,
        "shadow_params": [
            0.5 * p.detach().clone() for p in ref.parameters() if p.requires_grad
        ],
    }
    model_vars, _ = convert_energy_state_dict(dict(model_sd))
    ema_vars = convert_ema_state_dict(ema_sd, dict(model_sd), "energy")

    import jax

    jax.tree.map(
        lambda e, m: np.testing.assert_allclose(e, 0.5 * m, atol=1e-7),
        ema_vars, model_vars,
    )


# ---------------------------------------------------------------------------
# patching parity (token ordering must match or migrated weights are wrong)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_cfm_model_module():
    if "torchdiffeq" not in sys.modules:
        tde = types.ModuleType("torchdiffeq")

        def odeint(*a, **k):
            raise RuntimeError("torchdiffeq stub: sampling not exercised here")

        tde.odeint = odeint
        sys.modules["torchdiffeq"] = tde
    sys.path.insert(0, REFERENCE)
    try:
        import experiments.calochallenge.calochallenge_cfm.model as ref_model
    finally:
        sys.path.remove(REFERENCE)
    return ref_model


def test_patching_parity_ds2(ref_cfm_model_module):
    """Single-section 3-D patching produces the identical token layout."""
    from vit4hep_tpu.ops import patching

    ref = object.__new__(ref_cfm_model_module.CaloChallengeCFM)
    ref.patch_shape = [3, 2, 1]
    ref.num_patches = [2, 2, 3]
    ref.in_channels = 1
    gen = np.random.default_rng(37)
    x = gen.standard_normal((2, 1, 6, 4, 3), dtype=np.float32)
    tokens_ref = ref.to_patches(torch.from_numpy(x)).numpy()
    tokens_ours = np.asarray(patching.to_patches(x, (3, 2, 1)))
    np.testing.assert_array_equal(tokens_ours, tokens_ref)
    back_ref = ref.from_patches(torch.from_numpy(tokens_ref)).numpy()
    back_ours = np.asarray(patching.from_patches(tokens_ours, (2, 2, 3), (3, 2, 1)))
    np.testing.assert_array_equal(back_ours, back_ref)
    np.testing.assert_array_equal(back_ours, x)


def test_patching_parity_ds1_multisection(ref_cfm_model_module):
    """Multi-section (ds1-style) patching: same section split, token order,
    and flat-voxel reconstruction as the reference."""
    from vit4hep_tpu.ops.patching import MultiSectionPatcher

    list_shape = [(2, 4, 3), (4, 2, 3)]
    list_edges = [24, 24]
    patch_shape = [2, 2, 3]

    ref = object.__new__(ref_cfm_model_module.CaloChallengeCFM_DS1)
    ref.patch_shape = patch_shape
    ref.in_channels = 1
    ref.list_shape = [list(s) for s in list_shape]
    ref.list_edges = list(list_edges)
    ref.num_patches_per_dim = [
        tuple(s // p for s, p in zip(shape, patch_shape)) for shape in list_shape
    ]
    ref.num_patches_per_layer = [int(np.prod(d)) for d in ref.num_patches_per_dim]

    ours = MultiSectionPatcher(list_shape, list_edges, patch_shape, in_channels=1)

    gen = np.random.default_rng(41)
    x = gen.standard_normal((2, 1, sum(list_edges)), dtype=np.float32)
    tokens_ref = ref.to_patches(torch.from_numpy(x)).numpy()
    tokens_ours = np.asarray(ours.to_patches(x))
    np.testing.assert_array_equal(tokens_ours, tokens_ref)
    back_ref = ref.from_patches(torch.from_numpy(tokens_ref)).numpy()
    back_ours = np.asarray(ours.from_patches(tokens_ours))
    np.testing.assert_array_equal(back_ours, back_ref)
    np.testing.assert_array_equal(back_ours, x)


def test_patching_parity_calogan_per_section(ref_cfm_model_module):
    """CaloGAN's per-section patch shapes (list_patch_shape) produce the same
    token layout as the reference (experiments/calogan/model.py:55-88)."""
    from vit4hep_tpu.ops.patching import MultiSectionPatcher

    ref_model = _import_ref("experiments.calogan.model")

    # CaloGAN: 3 layers (3,96), (12,12), (12,6) flattened -> per-section
    # shapes with patch shapes that share one patch_dim (here 8)
    list_shape = [(1, 3, 96), (1, 12, 12), (1, 12, 6)]
    list_edges = [288, 144, 72]
    list_patch_shape = [(1, 1, 8), (1, 4, 2), (1, 4, 2)]

    ref = object.__new__(ref_model.CaloGANCFM)
    ref.in_channels = 1
    ref.list_shape = [list(s) for s in list_shape]
    ref.list_edges = list(list_edges)
    ref.list_patch_shape = [list(p) for p in list_patch_shape]
    ref.num_patches_per_dim = [
        tuple(s // p for s, p in zip(shape, pshape))
        for shape, pshape in zip(list_shape, list_patch_shape)
    ]
    ref.num_patches_per_layer = [int(np.prod(d)) for d in ref.num_patches_per_dim]

    ours = MultiSectionPatcher(list_shape, list_edges, list_patch_shape, in_channels=1)

    gen = np.random.default_rng(127)
    x = gen.standard_normal((2, 1, sum(list_edges)), dtype=np.float32)
    tokens_ref = ref.to_patches(torch.from_numpy(x)).numpy()
    tokens_ours = np.asarray(ours.to_patches(x))
    np.testing.assert_array_equal(tokens_ours, tokens_ref)
    back_ref = ref.from_patches(torch.from_numpy(tokens_ref)).numpy()
    back_ours = np.asarray(ours.from_patches(tokens_ours))
    np.testing.assert_array_equal(back_ours, back_ref)
    np.testing.assert_array_equal(back_ours, x)


# ---------------------------------------------------------------------------
# RQS spline parity (the cINN numerics core)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_inn_modules():
    """Import the reference nn.inn spline modules with a FrEIA shim."""
    import torch.nn as tnn

    if "FrEIA" not in sys.modules:
        class InvertibleModule(tnn.Module):
            def __init__(self, dims_in, dims_c=None):
                super().__init__()
                self.dims_in = dims_in
                self.dims_c = dims_c or []

        def sum_except_batch(x):
            return x.reshape(x.shape[0], -1).sum(-1)

        freia = types.ModuleType("FrEIA")
        freia_modules = types.ModuleType("FrEIA.modules")
        freia_base = types.ModuleType("FrEIA.modules.base")
        freia_utils = types.ModuleType("FrEIA.utils")
        freia_modules.InvertibleModule = InvertibleModule
        freia_base.InvertibleModule = InvertibleModule
        freia_modules.base = freia_base
        freia_utils.sum_except_batch = sum_except_batch
        freia.modules = freia_modules
        freia.utils = freia_utils
        sys.modules.update({
            "FrEIA": freia,
            "FrEIA.modules": freia_modules,
            "FrEIA.modules.base": freia_base,
            "FrEIA.utils": freia_utils,
        })

    sys.path.insert(0, REFERENCE)
    try:
        import nn.inn.rqs_nflows as ref_nflows
        import nn.inn.rqs_v2 as ref_v2
    finally:
        sys.path.remove(REFERENCE)
    return ref_nflows, ref_v2


def test_nflows_spline_parity(ref_inn_modules):
    """Our f32 nflows-style RQS (Citardauq + Newton inverse) matches the
    reference's float64 implementation, forward and inverse, incl. the
    event-level tail gating and per-event log|J|."""
    import jax.numpy as jnp

    from vit4hep_tpu.ops.rqs import nflows_rqs

    ref_nflows, _ = ref_inn_modules
    import torch.nn as tnn

    spline = ref_nflows.SimpleRationalQuadraticSpline(
        dims_in=[(6,)], dims_c=[], len_splits=(3, 3),
        subnet_constructor=lambda cin, cout: tnn.Linear(cin, cout),
        num_bins=8, bounds_init=1.0, bounds_type="LIN",
    )
    gen = np.random.default_rng(29)
    n, c, nb = 64, 3, 8
    theta = (2.0 * gen.standard_normal((n, c, 3 * nb - 1))).astype(np.float32)
    x = gen.uniform(-1.4, 1.4, (n, c)).astype(np.float32)  # some rows outside

    for rev in (False, True):
        with torch.no_grad():
            out_ref, ld_ref = spline._unconstrained_rational_quadratic_spline(
                torch.from_numpy(x), torch.from_numpy(theta), rev=rev
            )
        out_ours, ld_ours = nflows_rqs(
            jnp.asarray(x), jnp.asarray(theta), nb, 1.0, rev=rev, event_mask=True
        )
        np.testing.assert_allclose(
            np.asarray(out_ours), out_ref.numpy(), atol=2e-6, rtol=1e-5,
            err_msg=f"rev={rev}",
        )
        np.testing.assert_allclose(
            np.asarray(ld_ours), ld_ref.numpy(), atol=1e-4, rtol=1e-4,
            err_msg=f"rev={rev}",
        )


def test_rqs_v2_bin_parity(ref_inn_modules):
    """Per-bin rational-quadratic evaluation (rqs_v2.rational_quadratic_spline)
    vs our _rq_bin: forward, f64-reference inverse, and forward log-derivative."""
    import jax.numpy as jnp

    from vit4hep_tpu.ops.rqs import _rq_bin

    _, ref_v2 = ref_inn_modules
    gen = np.random.default_rng(31)
    n = 256
    xk = gen.uniform(-2, 0, n).astype(np.float32)
    xkp = xk + gen.uniform(0.2, 2.0, n).astype(np.float32)
    yk = gen.uniform(-2, 0, n).astype(np.float32)
    ykp = yk + gen.uniform(0.2, 2.0, n).astype(np.float32)
    dk = gen.uniform(0.1, 3.0, n).astype(np.float32)
    dkp = gen.uniform(0.1, 3.0, n).astype(np.float32)
    frac = gen.uniform(0.01, 0.99, n).astype(np.float32)

    tt = torch.from_numpy
    x = xk + frac * (xkp - xk)
    with torch.no_grad():
        y_ref, ld_ref = ref_v2.rational_quadratic_spline(
            tt(x), tt(xk), tt(xkp), tt(yk), tt(ykp), tt(dk), tt(dkp), rev=False
        )
    y_ours, ld_ours = _rq_bin(
        jnp.asarray(x), jnp.asarray(xk), jnp.asarray(xkp), jnp.asarray(yk),
        jnp.asarray(ykp), jnp.asarray(dk), jnp.asarray(dkp), rev=False
    )
    np.testing.assert_allclose(np.asarray(y_ours), y_ref.numpy(), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_ours), ld_ref.numpy(), atol=1e-5, rtol=1e-5)

    # inverse: our f32 Citardauq+Newton vs the reference's float64 root
    y = yk + frac * (ykp - yk)
    with torch.no_grad():
        x_ref, ld_ref = ref_v2.rational_quadratic_spline(
            tt(y), tt(xk), tt(xkp), tt(yk), tt(ykp), tt(dk), tt(dkp),
            rev=True, use_float64=True,
        )
    x_ours, ld_ours = _rq_bin(
        jnp.asarray(y), jnp.asarray(xk), jnp.asarray(xkp), jnp.asarray(yk),
        jnp.asarray(ykp), jnp.asarray(dk), jnp.asarray(dkp), rev=True
    )
    np.testing.assert_allclose(np.asarray(x_ours), x_ref.numpy(), atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_ours), ld_ref.numpy(), atol=1e-4, rtol=1e-4)


def test_cinn_coupling_block_parity(ref_vit_module, ref_inn_modules):
    """Full two-sided nflows coupling block (CaloRQSplineNFlows) with ViT1D
    subnets: even/odd token split, two-stage coupling composition, and
    per-event log|J| match the reference with transferred subnet weights,
    forward and inverse."""
    import jax.numpy as jnp

    from vit4hep_tpu.models.bijectors import NFlowsRQSCouplingBlock
    from vit4hep_tpu.models.vit import ViT1D
    from vit4hep_tpu.utils.torch_migration import (
        convert_vit_state_dict,
        strip_state_dict_prefixes,
    )

    ref_nflows, _ = ref_inn_modules
    sys.path.insert(0, REFERENCE)
    try:
        from nn.inn.subnets import SubnetViT
    finally:
        sys.path.remove(REFERENCE)

    T, P, COND, NB = 6, 8, 4, 8
    vit_kwargs = {
        "dim": 3, "condition_dim": COND, "hidden_dim": 48, "depth": 1,
        "num_heads": 2, "mlp_ratio": 2.0, "learn_pos_embed": True,
        "use_torch_sdpa": True,
    }

    def ref_subnet_ctor(x_in, x_out):
        # freia_utils.py:72-80 (non-spatial): full patch_dim, half the tokens
        return SubnetViT(
            x_out=x_out, patch_dim=P, num_patches=[[3, 1, 2]],
            prod_num_patches=T // 2, **vit_kwargs,
        )

    torch.manual_seed(37)
    ref_block = ref_nflows.CaloRationalQuadraticSplineBlock(
        dims_in=[(T, P)], dims_c=[(COND,)], subnet_constructor=ref_subnet_ctor,
        num_bins=NB, bounds_init=1.0, tails="linear", bounds_type="SOFTPLUS",
        spatial=False,
    )
    # zero-init FinalLayers make the block the identity; perturb to expose it
    for name, p in ref_block.named_parameters():
        if "adaLN" in name or "final_layer.linear" in name:
            with torch.no_grad():
                p.copy_(0.3 * torch.randn_like(p))

    def our_subnet_ctor(n_params):
        return ViT1D({
            **{k: v for k, v in vit_kwargs.items() if k != "use_torch_sdpa"},
            "x_out": n_params, "patch_dim": P, "num_patches": [[3, 1, 2]],
            "prod_num_patches": T // 2,
        })

    our_block = NFlowsRQSCouplingBlock(
        subnet_ctor=our_subnet_ctor, num_bins=NB, bounds_init=1.0, spatial=False,
    )
    ref_sd = ref_block.state_dict()
    variables = {"params": {}}
    for ours, theirs in (("subnet1", "_spline1.subnet.vit."),
                         ("subnet2", "_spline2.subnet.vit.")):
        sub_sd = strip_state_dict_prefixes(
            {k: v for k, v in ref_sd.items() if k.startswith(theirs)},
            prefixes=(theirs,),
        )
        variables["params"][ours] = convert_vit_state_dict(sub_sd, vit1d=True)["params"]

    gen = np.random.default_rng(79)
    x = gen.uniform(-1.2, 1.2, (5, T, P)).astype(np.float32)
    c = gen.standard_normal((5, COND)).astype(np.float32)

    with torch.no_grad():
        (y_ref,), j_ref = ref_block((torch.from_numpy(x),), c=[torch.from_numpy(c)])
    y_ours, j_ours = our_block.apply(variables, jnp.asarray(x), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ours), j_ref.numpy(), atol=1e-4, rtol=1e-4)

    # inverse round-trips through the same weights
    with torch.no_grad():
        (x_ref,), jr_ref = ref_block((y_ref,), c=[torch.from_numpy(c)], rev=True)
    x_ours, jr_ours = our_block.apply(
        variables, jnp.asarray(np.asarray(y_ours)), jnp.asarray(c),
        method=our_block.inverse,
    )
    np.testing.assert_allclose(np.asarray(x_ours), x_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_ours), x, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jr_ours), jr_ref.numpy(), atol=1e-4, rtol=1e-4)


def test_one_sided_coupling_block_parity(ref_vit_module, ref_inn_modules):
    """OneSidedCaloRQSplineNFlows: only the odd tokens transform, conditioned
    on the even ones; parity with transferred ViT1D subnet weights."""
    import jax.numpy as jnp

    from vit4hep_tpu.models.bijectors import NFlowsRQSCouplingBlock
    from vit4hep_tpu.models.vit import ViT1D
    from vit4hep_tpu.utils.torch_migration import (
        convert_vit_state_dict,
        strip_state_dict_prefixes,
    )

    ref_nflows, _ = ref_inn_modules
    sys.path.insert(0, REFERENCE)
    try:
        from nn.inn.subnets import SubnetViT
    finally:
        sys.path.remove(REFERENCE)

    T, P, COND, NB = 6, 8, 4, 8
    vit_kwargs = {
        "dim": 3, "condition_dim": COND, "hidden_dim": 48, "depth": 1,
        "num_heads": 2, "mlp_ratio": 2.0, "learn_pos_embed": True,
        "use_torch_sdpa": True,
    }

    torch.manual_seed(41)
    ref_block = ref_nflows.OneSidedCaloRationalQuadraticSplineBlock(
        dims_in=[(T, P)], dims_c=[(COND,)],
        subnet_constructor=lambda x_in, x_out: SubnetViT(
            x_out=x_out, patch_dim=P, num_patches=[[3, 1, 2]],
            prod_num_patches=T // 2, **vit_kwargs,
        ),
        num_bins=NB, bounds_init=1.0, tails="linear", bounds_type="SOFTPLUS",
        spatial=False,
    )
    for name, p in ref_block.named_parameters():
        if "adaLN" in name or "final_layer.linear" in name:
            with torch.no_grad():
                p.copy_(0.3 * torch.randn_like(p))

    our_block = NFlowsRQSCouplingBlock(
        subnet_ctor=lambda n_params: ViT1D({
            **{k: v for k, v in vit_kwargs.items() if k != "use_torch_sdpa"},
            "x_out": n_params, "patch_dim": P, "num_patches": [[3, 1, 2]],
            "prod_num_patches": T // 2,
        }),
        num_bins=NB, bounds_init=1.0, spatial=False, one_sided=True,
    )
    sub_sd = strip_state_dict_prefixes(
        {k: v for k, v in ref_block.state_dict().items()
         if k.startswith("_spline.subnet.vit.")},
        prefixes=("_spline.subnet.vit.",),
    )
    variables = {"params": {"subnet1": convert_vit_state_dict(sub_sd, vit1d=True)["params"]}}

    gen = np.random.default_rng(83)
    x = gen.uniform(-1.2, 1.2, (5, T, P)).astype(np.float32)
    c = gen.standard_normal((5, COND)).astype(np.float32)
    with torch.no_grad():
        (y_ref,), j_ref = ref_block((torch.from_numpy(x),), c=[torch.from_numpy(c)])
    y_ours, j_ours = our_block.apply(variables, jnp.asarray(x), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ours), j_ref.numpy(), atol=1e-4, rtol=1e-4)
    # even tokens pass through untouched
    np.testing.assert_array_equal(np.asarray(y_ours)[:, ::2], x[:, ::2])


def test_binned_rqs_block_parity(ref_vit_module, ref_inn_modules):
    """CaloRQSplineFrEIA (binned spline with predicted domain + affine tails):
    constraint pipeline, two-sided composition, and log|J| match the reference
    with transferred ViT1D subnet weights, forward and inverse."""
    import jax.numpy as jnp

    from vit4hep_tpu.models.bijectors import BinnedRQSCouplingBlock
    from vit4hep_tpu.models.vit import ViT1D
    from vit4hep_tpu.utils.torch_migration import (
        convert_vit_state_dict,
        strip_state_dict_prefixes,
    )

    _, ref_v2 = ref_inn_modules
    sys.path.insert(0, REFERENCE)
    try:
        from nn.inn.subnets import SubnetViT
    finally:
        sys.path.remove(REFERENCE)

    T, P, COND, NB = 6, 8, 4, 8
    vit_kwargs = {
        "dim": 3, "condition_dim": COND, "hidden_dim": 48, "depth": 1,
        "num_heads": 2, "mlp_ratio": 2.0, "learn_pos_embed": True,
        "use_torch_sdpa": True,
    }

    torch.manual_seed(47)
    ref_block = ref_v2.RationalQuadraticSpline(
        [(T, P)], [(COND,)],
        subnet_constructor=lambda x_in, x_out: SubnetViT(
            x_out=x_out, patch_dim=P, num_patches=[[3, 1, 2]],
            prod_num_patches=T // 2, **vit_kwargs,
        ),
        bins=NB, spatial=False,
    )
    for name, p in ref_block.named_parameters():
        if "adaLN" in name or "final_layer.linear" in name:
            with torch.no_grad():
                p.copy_(0.1 * torch.randn_like(p))

    our_block = BinnedRQSCouplingBlock(
        subnet_ctor=lambda n_params: ViT1D({
            **{k: v for k, v in vit_kwargs.items() if k != "use_torch_sdpa"},
            "x_out": n_params, "patch_dim": P, "num_patches": [[3, 1, 2]],
            "prod_num_patches": T // 2,
        }),
        bins=NB, spatial=False,
    )
    ref_sd = ref_block.state_dict()
    variables = {"params": {}}
    for name in ("subnet1", "subnet2"):
        sub_sd = strip_state_dict_prefixes(
            {k: v for k, v in ref_sd.items() if k.startswith(f"{name}.vit.")},
            prefixes=(f"{name}.vit.",),
        )
        variables["params"][name] = convert_vit_state_dict(sub_sd, vit1d=True)["params"]

    gen = np.random.default_rng(97)
    x = gen.standard_normal((5, T, P)).astype(np.float32) * 2.0
    c = gen.standard_normal((5, COND)).astype(np.float32)
    with torch.no_grad():
        (y_ref,), j_ref = ref_block((torch.from_numpy(x),), c=[torch.from_numpy(c)])
    y_ours, j_ours = our_block.apply(variables, jnp.asarray(x), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ours), j_ref.numpy(), atol=1e-3, rtol=1e-4)

    with torch.no_grad():
        (x_ref,), _ = ref_block((y_ref,), c=[torch.from_numpy(c)], rev=True)
    x_ours, _ = our_block.apply(
        variables, jnp.asarray(np.asarray(y_ours)), jnp.asarray(c),
        method=our_block.inverse,
    )
    np.testing.assert_allclose(np.asarray(x_ours), x_ref.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_ours), x, atol=1e-3, rtol=1e-3)


def test_simple_rqs_block_parity(ref_inn_modules):
    """SimpleRQSplineNFlows (energy cINN): half/half split with the reference's
    [floor(d/2), ceil(d/2)] ordering (odd dims!) and MLP subnets over
    [passive, condition]; parity with transferred weights, fwd + inverse."""
    import jax.numpy as jnp

    from vit4hep_tpu.models.bijectors import SimpleRQSCouplingBlock
    from vit4hep_tpu.utils.torch_migration import _linear

    ref_nflows, _ = ref_inn_modules
    sys.path.insert(0, REFERENCE)
    try:
        from nn.inn.subnets import SubnetMLP
    finally:
        sys.path.remove(REFERENCE)

    D, COND, NB = 7, 2, 6  # odd dims: split must be [3, 4] like the reference
    subnet_kwargs = {"n_layers": 2, "hidden_channels": [32, 32], "dropout": 0.0}

    torch.manual_seed(43)
    ref_block = ref_nflows.SimpleRationalQuadraticSplineBlock(
        dims_in=[(D,)], dims_c=[(COND,)],
        subnet_constructor=lambda x_in, x_out: SubnetMLP(
            x_in=x_in, x_out=x_out, subnet_kwargs=subnet_kwargs
        ),
        num_bins=NB, bounds_init=1.0, tails="linear", bounds_type="SOFTPLUS",
    )

    our_block = SimpleRQSCouplingBlock(
        dims_in=D, num_bins=NB, bounds_init=1.0,
        subnet_kwargs={"hidden_channels": (32, 32), "n_layers": 2},
    )
    ref_sd = ref_block.state_dict()
    variables = {"params": {}}
    for ours, theirs in (("subnet1", "_spline1.subnet.mlp."),
                         ("subnet2", "_spline2.subnet.mlp.")):
        sub = {k[len(theirs):]: v for k, v in ref_sd.items() if k.startswith(theirs)}
        # Sequential indices 0/2/4 (Linear, ReLU, Linear, ReLU, Linear)
        variables["params"][ours] = {
            f"Dense_{j}": _linear(sub, str(i)) for j, i in enumerate((0, 2, 4))
        }

    gen = np.random.default_rng(89)
    x = gen.uniform(-1.2, 1.2, (6, D)).astype(np.float32)
    c = gen.standard_normal((6, COND)).astype(np.float32)
    with torch.no_grad():
        (y_ref,), j_ref = ref_block((torch.from_numpy(x),), c=[torch.from_numpy(c)])
    y_ours, j_ours = our_block.apply(variables, jnp.asarray(x), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(y_ours), y_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ours), j_ref.numpy(), atol=1e-4, rtol=1e-4)

    with torch.no_grad():
        (x_ref,), _ = ref_block((y_ref,), c=[torch.from_numpy(c)], rev=True)
    x_ours, _ = our_block.apply(
        variables, jnp.asarray(np.asarray(y_ours)), jnp.asarray(c),
        method=our_block.inverse,
    )
    np.testing.assert_allclose(np.asarray(x_ours), x_ref.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_ours), x, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# transform-pipeline and high-level-features parity (the physics core)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_transforms_module():
    sys.path.insert(0, REFERENCE)
    try:
        import experiments.calochallenge.transforms as ref_transforms
    finally:
        sys.path.remove(REFERENCE)
    return ref_transforms


def _synthetic_geometry(tmp_path):
    from tests.conftest import make_binning_xml

    xml = make_binning_xml(tmp_path / "binning.xml", particle="photon")
    rng = np.random.default_rng(23)
    n, n_vox = 64, 60
    energy = 10 ** rng.uniform(3, 5, (n, 1)).astype(np.float32)
    shower = rng.exponential(1.0, (n, n_vox)).astype(np.float32)
    shower *= (rng.random((n, n_vox)) > 0.3).astype(np.float32)
    # vary E_tot / E_inc per event so u_0 isn't a constant column (a constant
    # u_0 makes its standardization 0/0-degenerate in both frameworks)
    frac = rng.uniform(0.5, 0.9, (n, 1)).astype(np.float32)
    shower = shower / shower.sum(1, keepdims=True).clip(1e-9) * energy * frac
    return str(xml), shower, energy


def _build_pipelines(ref_transforms_module, xml, tmp_path):
    """Same transform spec (the ds1-photons energy pipeline) in both frameworks."""
    import vit4hep_tpu.data.calochallenge.transforms as our_transforms

    spec = [
        ("NormalizeByElayer", {"ptype": xml, "xml_file": "photon"}),
        ("ScaleTotalEnergy", {"factor": 0.25, "n_layers": 5}),
        ("SelectDims", {"start": -5, "end": 0}),
        ("ExclusiveLogitTransform", {"delta": 1.0e-6, "rescale": True}),
        ("StandardizeUsFromFile", {"n_us": 5, "model_dir": None}),
        ("LogEnergy", {}),
        ("ScaleEnergy", {"e_min": 5.5452, "e_max": 15.2492}),
    ]
    pipelines = []
    for module, sub in ((ref_transforms_module, "ref"), (our_transforms, "ours")):
        run_dir = tmp_path / sub
        run_dir.mkdir(exist_ok=True)
        steps = []
        for name, kwargs in spec:
            kw = dict(kwargs)
            if name.endswith("FromFile"):
                kw["model_dir"] = str(run_dir)
            steps.append(getattr(module, name)(**kw))
        pipelines.append(steps)
    return pipelines


def test_energy_pipeline_parity(ref_transforms_module, tmp_path):
    """Forward + inverse of the ds1 energy-model preprocessing chain
    (NormalizeByElayer u-construction through ScaleEnergy) agree elementwise
    with the reference torch implementation on the same synthetic geometry."""
    xml, shower, energy = _synthetic_geometry(tmp_path)
    ref_steps, our_steps = _build_pipelines(ref_transforms_module, xml, tmp_path)

    s_ref, e_ref = torch.from_numpy(shower.copy()), torch.from_numpy(energy.copy())
    for fn in ref_steps:
        s_ref, e_ref = fn(s_ref, e_ref)
    s_ours, e_ours = shower.copy(), energy.copy()
    for fn in our_steps:
        s_ours, e_ours = fn(s_ours, e_ours)

    np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(e_ours), e_ref.numpy(), atol=1e-5, rtol=1e-5)

    # inverse of the u-side steps (what sample_us actually inverts — the full
    # chain's NormalizeByElayer reverse needs voxels the energy pipeline drops,
    # reference experiment.py:225-247): recover the physical u's identically
    for fn in reversed(ref_steps[1:]):
        s_ref, e_ref = fn(s_ref, e_ref, rev=True)
    for fn in reversed(our_steps[1:]):
        s_ours, e_ours = fn(s_ours, e_ours, rev=True)
    np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(e_ours), e_ref.numpy(), rtol=1e-5)


def test_shape_pipeline_parity(ref_transforms_module, tmp_path):
    """Voxel-side steps (scale, logit, cut) match the reference elementwise."""
    xml, shower, energy = _synthetic_geometry(tmp_path)
    import vit4hep_tpu.data.calochallenge.transforms as our_transforms

    spec = [
        ("ScaleVoxels", {"factor": 1.0e-3}),
        ("ExclusiveLogitTransform", {"delta": 1.0e-6}),
        ("CutValues", {"cut": 0.0, "n_layers": 5}),
    ]
    s_ref, e_ref = torch.from_numpy(shower.copy()), torch.from_numpy(energy.copy())
    s_ours, e_ours = shower.copy(), energy.copy()
    for name, kwargs in spec:
        s_ref, e_ref = getattr(ref_transforms_module, name)(**kwargs)(s_ref, e_ref)
        s_ours, e_ours = getattr(our_transforms, name)(**kwargs)(s_ours, e_ours)
        np.testing.assert_allclose(
            np.asarray(s_ours), s_ref.numpy(), atol=1e-5, rtol=1e-4, err_msg=name
        )


def test_add_angular_bins_parity(ref_transforms_module, tmp_path):
    """ds1-pions style alpha-bin padding (forward) and group max-pool (reverse)
    match the reference, including the u-column passthrough."""
    from tests.conftest import make_binning_xml

    import vit4hep_tpu.data.calochallenge.transforms as our_mod

    # 5 layers x 3 r-bins x 1 alpha bin, padded 1 -> 4 alpha bins: the scheme
    # is only self-consistent for layers with a single alpha bin (the ds1-pions
    # contract — padded layers have num_bins 1; others have add_bins==num_bins)
    xml = str(make_binning_xml(tmp_path / "binning.xml", particle="pion", n_alpha=1))
    # NB the reference's kwargs are swapped: xml_filename carries the particle
    # and ptype the XML path (its positional XMLHandler(particle, filename)
    # call absorbs the swap; our implementation keeps the same convention)
    kwargs = {"xml_filename": "pion", "ptype": xml,
              "num_bins": [1] * 5, "add_bins": [4] * 5}
    ref_fn = ref_transforms_module.AddAngularBins(**kwargs)
    our_fn = our_mod.AddAngularBins(**kwargs)

    gen = np.random.default_rng(59)
    shower = gen.exponential(1.0, (6, 20)).astype(np.float32)  # 15 voxels + 5 u's
    energy = gen.uniform(1e3, 1e6, (6, 1)).astype(np.float32)

    s_ref, _ = ref_fn(torch.from_numpy(shower.copy()), torch.from_numpy(energy.copy()))
    s_ours, _ = our_fn(shower.copy(), energy.copy())
    np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy(), atol=0)

    r_ref, _ = ref_fn(s_ref, torch.from_numpy(energy.copy()), rev=True)
    r_ours, _ = our_fn(np.asarray(s_ours), energy.copy(), rev=True)
    np.testing.assert_allclose(np.asarray(r_ours), r_ref.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(r_ours), shower, atol=0)


def _import_ref(modname):
    """Import a reference module, undoing its process-wide side effects
    (evaluate.py sets torch's default dtype to float64 and matplotlib's
    usetex/font rcParams at import time)."""
    import matplotlib

    rc_before = dict(matplotlib.rcParams)
    dtype_before = torch.get_default_dtype()
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        return importlib.import_module(modname)
    finally:
        sys.path.remove(REFERENCE)
        torch.set_default_dtype(dtype_before)
        matplotlib.rcParams.update(rc_before)


def test_lemurs_normalize_by_elayer_parity():
    """LEMURS u-space construction on (B, H, W, L) showers matches the
    reference's vectorized right-to-left-cumsum implementation, fwd + rev."""
    ref_mod = _import_ref("experiments.lemurs.transforms")
    import vit4hep_tpu.data.lemurs.transforms as our_mod

    gen = np.random.default_rng(43)
    shower = gen.exponential(1.0, (8, 5, 5, 4)).astype(np.float32)
    energy = gen.uniform(10, 100, (8, 1)).astype(np.float32)

    d_ref = {"showers": torch.from_numpy(shower.copy()),
             "incident_energy": torch.from_numpy(energy.copy())}
    d_ours = {"showers": shower.copy(), "incident_energy": energy.copy()}
    ref_fn, our_fn = ref_mod.LEMURSNormalizeByElayer(), our_mod.LEMURSNormalizeByElayer()
    d_ref = ref_fn(d_ref)
    d_ours = our_fn(d_ours)
    np.testing.assert_allclose(
        np.asarray(d_ours["extra_dims"]), d_ref["extra_dims"].numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_ours["showers"]), d_ref["showers"].numpy(), rtol=1e-5, atol=1e-7
    )

    d_ref = ref_fn(d_ref, rev=True)
    d_ours = our_fn(d_ours, rev=True)
    np.testing.assert_allclose(
        np.asarray(d_ours["showers"]), d_ref["showers"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(d_ours["showers"]), shower, rtol=1e-3, atol=1e-4)


def test_calogan_normalize_layer_energy_parity():
    """CaloGAN 3-layer u-construction (layer_0/1/2 dict protocol), fwd + rev."""
    ref_mod = _import_ref("experiments.calogan.transforms")
    import vit4hep_tpu.data.calogan.transforms as our_mod

    gen = np.random.default_rng(47)
    layers = {
        f"layer_{i}": gen.exponential(1.0, (8, n)).astype(np.float32)
        for i, n in enumerate((288, 144, 72))
    }
    energy = gen.uniform(1, 100, (8, 1)).astype(np.float32)

    d_ref = {k: torch.from_numpy(v.copy()) for k, v in layers.items()}
    d_ref["energy"] = torch.from_numpy(energy.copy())
    d_ours = {k: v.copy() for k, v in layers.items()}
    d_ours["energy"] = energy.copy()
    ref_fn, our_fn = ref_mod.NormalizeLayerEnergyGAN(), our_mod.NormalizeLayerEnergyGAN()
    d_ref = ref_fn(d_ref)
    d_ours = our_fn(d_ours)
    np.testing.assert_allclose(
        np.asarray(d_ours["extra_dims"]), d_ref["extra_dims"].numpy(), rtol=1e-5
    )
    for k in layers:
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), rtol=1e-5, atol=1e-7, err_msg=k
        )

    d_ref = ref_fn(d_ref, rev=True)
    d_ours = our_fn(d_ours, rev=True)
    for k in layers:
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), rtol=1e-4, atol=1e-5, err_msg=k
        )
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), layers[k], rtol=1e-3, atol=1e-4, err_msg=k
        )


def test_lemurs_pipeline_parity(tmp_path):
    """Full LEMURS preprocessing chain (u-construction -> u-scale -> logit ->
    standardize u/global -> condition min-max) matches the reference forward
    and reverse on the same dict batch."""
    ref_mod = _import_ref("experiments.lemurs.transforms")
    import vit4hep_tpu.data.lemurs.transforms as our_mod

    gen = np.random.default_rng(61)
    base = {
        "showers": gen.exponential(1.0, (8, 5, 5, 4)).astype(np.float32),
        "incident_energy": gen.uniform(1e3, 1e6, (8, 1)).astype(np.float32),
        "incident_theta": gen.uniform(0.9, 2.2, (8, 1)).astype(np.float32),
        "incident_phi": gen.uniform(-3.1, 3.1, (8, 1)).astype(np.float32),
    }
    spec = [
        ("LEMURSNormalizeByElayer", {}),
        ("LEMURSScaleTotalEnergy", {"factor": 0.35}),
        ("LEMURSExclusiveLogitTransform", {"delta": 1.0e-6, "rescale": True}),
        ("LEMURSStandardizeUsFromFile", {"n_us": 4, "model_dir": None}),
        ("LEMURSGlobalStandardizeFromFile", {"model_dir": None}),
        ("LEMURSPreprocessConds", {}),
    ]
    chains = []
    for module, sub in ((ref_mod, "ref"), (our_mod, "ours")):
        run_dir = tmp_path / sub
        run_dir.mkdir(exist_ok=True)
        steps = []
        for name, kwargs in spec:
            kw = dict(kwargs)
            if "model_dir" in kw:
                kw["model_dir"] = str(run_dir)
            steps.append(getattr(module, name)(**kw))
        chains.append(steps)
    ref_steps, our_steps = chains

    d_ref = {k: torch.from_numpy(v.copy()) for k, v in base.items()}
    d_ours = {k: v.copy() for k, v in base.items()}
    for fn in ref_steps:
        d_ref = fn(d_ref)
    for fn in our_steps:
        d_ours = fn(d_ours)
    for k in ("showers", "extra_dims", "incident_energy", "incident_theta", "incident_phi"):
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), atol=1e-4, rtol=1e-4, err_msg=k
        )

    for fn in reversed(ref_steps):
        d_ref = fn(d_ref, rev=True)
    for fn in reversed(our_steps):
        d_ours = fn(d_ours, rev=True)
    for k in ("showers", "incident_energy", "incident_theta", "incident_phi"):
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), atol=1e-3, rtol=1e-3, err_msg=k
        )


def test_calogan_pipeline_parity(tmp_path):
    """Full CaloGAN chain (u-construction -> logit -> standardize -> log/scale
    energy) matches the reference forward and reverse on the same dict batch."""
    ref_mod = _import_ref("experiments.calogan.transforms")
    import vit4hep_tpu.data.calogan.transforms as our_mod

    gen = np.random.default_rng(71)
    base = {
        f"layer_{i}": gen.exponential(1.0, (8, n)).astype(np.float32)
        for i, n in enumerate((288, 144, 72))
    }
    base["energy"] = gen.uniform(1, 100, (8, 1)).astype(np.float32)
    spec = [
        ("NormalizeLayerEnergyGAN", {}),
        ("ExclusiveLogitTransformGAN", {"delta": 1.0e-6, "rescale": True}),
        ("GlobalStandardizeFromFileGAN", {"model_dir": None}),
        ("LogEnergyGAN", {}),
        ("ScaleEnergyGAN", {"e_min": 0.0, "e_max": 4.7}),
    ]
    chains = []
    for module, sub in ((ref_mod, "ref"), (our_mod, "ours")):
        run_dir = tmp_path / sub
        run_dir.mkdir(exist_ok=True)
        steps = []
        for name, kwargs in spec:
            kw = dict(kwargs)
            if "model_dir" in kw:
                kw["model_dir"] = str(run_dir)
            steps.append(getattr(module, name)(**kw))
        chains.append(steps)
    ref_steps, our_steps = chains

    d_ref = {k: torch.from_numpy(v.copy()) for k, v in base.items()}
    d_ours = {k: v.copy() for k, v in base.items()}
    for fn in ref_steps:
        d_ref = fn(d_ref)
    for fn in our_steps:
        d_ours = fn(d_ours)
    for k in list(base) + ["extra_dims"]:
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), atol=1e-4, rtol=1e-4, err_msg=k
        )
    for fn in reversed(ref_steps):
        d_ref = fn(d_ref, rev=True)
    for fn in reversed(our_steps):
        d_ours = fn(d_ours, rev=True)
    for k in base:
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), atol=1e-3, rtol=1e-3, err_msg=k
        )


def test_calohadronic_pipeline_parity(tmp_path):
    """CaloHadronic chain (ECal downsample -> joint u-construction -> u-scale ->
    logit -> standardize -> condition scaling) matches forward and reverse."""
    ref_mod = _import_ref("experiments.calohadronic.transforms")
    import vit4hep_tpu.data.calohadronic.transforms as our_mod

    gen = np.random.default_rng(73)
    energy = gen.uniform(10, 90, (6, 1)).astype(np.float32)
    ecal = gen.exponential(1.0, (6, 6, 24, 24)).astype(np.float32)
    hcal = gen.exponential(1.0, (6, 5, 3, 3)).astype(np.float32)
    # keep E_tot/E_inc < 1 so u_0 stays in logit's domain (physical showers)
    total = ecal.sum((1, 2, 3), keepdims=True) + hcal.sum((1, 2, 3), keepdims=True)
    frac = gen.uniform(0.5, 0.9, (6, 1, 1, 1)).astype(np.float32)
    base = {
        "ecal": ecal / total * energy[..., None, None] * frac,
        "hcal": hcal / total * energy[..., None, None] * frac,
        "energy": energy,
    }
    spec = [
        ("SumPool3dDownScale", {"calo": "ecal", "kernel": (3, 12, 12)}),
        ("CaloHadNormalizeByElayer", {}),
        ("CaloHadScaleTotalEnergy", {"factor": 0.35}),
        ("CaloHadExclusiveLogitTransform", {"delta": 1.0e-6, "rescale": True}),
        ("CaloHadStandardizeUsFromFile", {"n_us": 7, "model_dir": None}),
        ("CaloHadGlobalStandardizeFromFile", {"model_dir": None}),
        ("CaloHadPreprocessConds", {}),
    ]
    ref_names = {c for c in dir(ref_mod)}
    spec = [(n, kw) for n, kw in spec if n in ref_names]
    chains = []
    for module, sub in ((ref_mod, "ref"), (our_mod, "ours")):
        run_dir = tmp_path / sub
        run_dir.mkdir(exist_ok=True)
        steps = []
        for name, kwargs in spec:
            kw = dict(kwargs)
            if "model_dir" in kw:
                kw["model_dir"] = str(run_dir)
            steps.append(getattr(module, name)(**kw))
        chains.append(steps)
    ref_steps, our_steps = chains

    d_ref = {k: torch.from_numpy(v.copy()) for k, v in base.items()}
    d_ours = {k: v.copy() for k, v in base.items()}
    for fn in ref_steps:
        d_ref = fn(d_ref)
    for fn in our_steps:
        d_ours = fn(d_ours)
    for k in ("ecal", "hcal", "extra_dims", "energy"):
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), atol=1e-4, rtol=1e-4, err_msg=k
        )
    for fn in reversed(ref_steps):
        d_ref = fn(d_ref, rev=True)
    for fn in reversed(our_steps):
        d_ours = fn(d_ours, rev=True)
    for k in ("ecal", "hcal", "energy"):
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), atol=1e-3, rtol=1e-3, err_msg=k
        )


def test_sumpool_downscale_parity():
    """CaloHadronic's irreversible ECal AvgPool3d-x-volume downsample matches."""
    ref_mod = _import_ref("experiments.calohadronic.transforms")
    import vit4hep_tpu.data.calohadronic.transforms as our_mod

    gen = np.random.default_rng(67)
    ecal = gen.exponential(1.0, (4, 6, 24, 24)).astype(np.float32)
    d_ref = {"ecal": torch.from_numpy(ecal.copy())}
    d_ours = {"ecal": ecal.copy()}
    ref_out = ref_mod.SumPool3dDownScale(calo="ecal", kernel=(3, 12, 12))(d_ref)
    our_out = our_mod.SumPool3dDownScale(calo="ecal", kernel=(3, 12, 12))(d_ours)
    assert np.asarray(our_out["ecal"]).shape == (4, 2, 2, 2)
    np.testing.assert_allclose(
        np.asarray(our_out["ecal"]), ref_out["ecal"].numpy(), rtol=1e-5, atol=1e-5
    )


def test_calohadronic_normalize_by_elayer_parity():
    """Joint ECal+HCal u-construction (u's span both calorimeters), fwd + rev."""
    ref_mod = _import_ref("experiments.calohadronic.transforms")
    import vit4hep_tpu.data.calohadronic.transforms as our_mod

    gen = np.random.default_rng(53)
    ecal = gen.exponential(1.0, (8, 3, 4, 4)).astype(np.float32)
    hcal = gen.exponential(1.0, (8, 5, 3, 3)).astype(np.float32)
    energy = gen.uniform(10, 90, (8, 1)).astype(np.float32)

    d_ref = {"ecal": torch.from_numpy(ecal.copy()), "hcal": torch.from_numpy(hcal.copy()),
             "energy": torch.from_numpy(energy.copy())}
    d_ours = {"ecal": ecal.copy(), "hcal": hcal.copy(), "energy": energy.copy()}
    ref_fn, our_fn = ref_mod.CaloHadNormalizeByElayer(), our_mod.CaloHadNormalizeByElayer()
    d_ref = ref_fn(d_ref)
    d_ours = our_fn(d_ours)
    np.testing.assert_allclose(
        np.asarray(d_ours["extra_dims"]), d_ref["extra_dims"].numpy(), rtol=1e-5
    )
    for k in ("ecal", "hcal"):
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), rtol=1e-5, atol=1e-7, err_msg=k
        )

    d_ref = ref_fn(d_ref, rev=True)
    d_ours = our_fn(d_ours, rev=True)
    for k, orig in (("ecal", ecal), ("hcal", hcal)):
        np.testing.assert_allclose(
            np.asarray(d_ours[k]), d_ref[k].numpy(), rtol=1e-4, atol=1e-5, err_msg=k
        )
        np.testing.assert_allclose(np.asarray(d_ours[k]), orig, rtol=1e-3, atol=1e-4, err_msg=k)


def test_resnet3d_classifier_parity():
    """Eval-suite comparability: the 3-D ResNet real/fake classifier computes
    the same eval-mode forward as the reference with transferred weights
    (stem/blocks/downsample/BN/global-pool/e_norm-concat)."""
    import jax
    import jax.numpy as jnp

    ref_resnet = _import_ref("experiments.calo_utils.ugr_evaluation.resnet")
    from vit4hep_tpu.evaluation.classifiers import generate_model

    IMG = (8, 12, 12)
    torch.manual_seed(67)
    ref = ref_resnet.generate_model(10, img_shape=IMG)
    ref.eval()

    ours = generate_model(10, img_shape=IMG)
    gen = np.random.default_rng(107)
    x = gen.standard_normal((4, 1 + int(np.prod(IMG)))).astype(np.float32)

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])

    def conv_w(t):
        return t.detach().numpy().transpose(2, 3, 4, 1, 0)

    sd = ref.state_dict()
    params["stem"]["kernel"] = conv_w(sd["conv1.weight"])
    params["BatchNorm_0"]["scale"] = sd["bn1.weight"].numpy()
    params["BatchNorm_0"]["bias"] = sd["bn1.bias"].numpy()
    params["e_norm"]["scale"] = sd["e_norm.weight"].numpy()
    params["e_norm"]["bias"] = sd["e_norm.bias"].numpy()
    params["Dense_0"]["kernel"] = sd["fc.weight"].numpy().T
    params["Dense_0"]["bias"] = sd["fc.bias"].numpy()
    # 4 BasicBlocks (ResNet-10), in layer order; downsample -> Conv_2/BN_2
    for i in range(4):
        b = params[f"BasicBlock3D_{i}"]
        pre = f"layer{i + 1}.0"
        b["Conv_0"]["kernel"] = conv_w(sd[f"{pre}.conv1.weight"])
        b["BatchNorm_0"]["scale"] = sd[f"{pre}.bn1.weight"].numpy()
        b["BatchNorm_0"]["bias"] = sd[f"{pre}.bn1.bias"].numpy()
        b["Conv_1"]["kernel"] = conv_w(sd[f"{pre}.conv2.weight"])
        b["BatchNorm_1"]["scale"] = sd[f"{pre}.bn2.weight"].numpy()
        b["BatchNorm_1"]["bias"] = sd[f"{pre}.bn2.bias"].numpy()
        if f"{pre}.downsample.0.weight" in sd:
            b["Conv_2"]["kernel"] = conv_w(sd[f"{pre}.downsample.0.weight"])
            b["BatchNorm_2"]["scale"] = sd[f"{pre}.downsample.1.weight"].numpy()
            b["BatchNorm_2"]["bias"] = sd[f"{pre}.downsample.1.bias"].numpy()

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out_ours = np.asarray(
        ours.apply({"params": params, "batch_stats": variables["batch_stats"]},
                   jnp.asarray(x))
    )
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-5, rtol=1e-4)


def test_dnn_classifier_parity():
    """The low/high-level DNN classifier forward matches the reference."""
    import jax
    import jax.numpy as jnp

    ref_eval = _import_ref("experiments.calo_utils.ugr_evaluation.evaluate")
    # importing the reference evaluate module sets torch's default dtype to
    # float64 process-wide (evaluate.py:28) — undo before building models
    torch.set_default_dtype(torch.float32)
    from vit4hep_tpu.evaluation.classifiers import DNN

    torch.manual_seed(71)
    ref = ref_eval.DNN(num_layer=2, num_hidden=32, input_dim=10).float()
    ref.eval()
    ours = DNN(num_layer=2, num_hidden=32)

    gen = np.random.default_rng(109)
    x = gen.standard_normal((8, 10)).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])
    linear_idx = [i for i, m in enumerate(ref.layers) if isinstance(m, torch.nn.Linear)]
    for j, i in enumerate(linear_idx):
        params[f"Dense_{j}"]["kernel"] = ref.layers[i].weight.detach().numpy().T
        params[f"Dense_{j}"]["bias"] = ref.layers[i].bias.detach().numpy()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_histogram_suite_chi2_parity(tmp_path):
    """Output-level parity of the histogram engine: run the REFERENCE plotters
    and ours on identical showers (each with its own HLF implementation) and
    compare every chi^2 separation power they record — locking the binning
    conventions, not just the formulas."""
    import re as _re
    from types import SimpleNamespace

    from tests.conftest import make_binning_xml

    ref_plots = _import_ref("experiments.calo_utils.ugr_evaluation.evaluate_plotting_helper")
    from vit4hep_tpu.evaluation import plots as our_plots
    from vit4hep_tpu.evaluation.high_level_features import HighLevelFeatures as OurHLF

    sys.path.insert(0, REFERENCE)
    try:
        from experiments.calo_utils.ugr_evaluation.HighLevelFeatures import (
            HighLevelFeatures as RefHLF,
        )
    finally:
        sys.path.remove(REFERENCE)

    xml = str(make_binning_xml(tmp_path / "binning.xml", particle="electron"))
    gen = np.random.default_rng(113)
    n, n_vox = 400, 60
    energy = 10 ** gen.uniform(3, 5, (n, 1)).astype(np.float32)
    frac = gen.uniform(0.6, 1.2, (n, 1)).astype(np.float32)

    def showers(seed):
        g = np.random.default_rng(seed)
        s = g.exponential(1.0, (n, n_vox)).astype(np.float32)
        s *= (g.random((n, n_vox)) > 0.3).astype(np.float32)
        return s / s.sum(1, keepdims=True).clip(1e-9) * energy * frac

    sample, reference = showers(1), showers(2)

    def run_suite(plots_mod, hlf_cls, out_dir):
        out_dir.mkdir()
        hlf, ref_hlf = hlf_cls("electron", xml), hlf_cls("electron", xml)
        hlf.CalculateFeatures(sample)
        hlf.Einc = energy
        ref_hlf.CalculateFeatures(reference)
        ref_hlf.Einc = energy
        arg = SimpleNamespace(
            output_dir=str(out_dir), dataset="2", x_scale="log",
            min_energy=0.5e-3 / 0.033,
        )
        common = ([hlf], ref_hlf, arg, ["model"], ["m0"], "")
        plots_mod.plot_Etot_Einc(*common)
        plots_mod.plot_E_layers(*common)
        plots_mod.plot_ECEtas(*common)
        plots_mod.plot_ECPhis(*common)
        plots_mod.plot_ECWidthEtas(*common)
        plots_mod.plot_ECWidthPhis(*common)
        plots_mod.plot_sparsity(*common)
        plots_mod.plot_weighted_depth_a(*common)
        plots_mod.plot_weighted_depth_r(*common)
        plots_mod.plot_z_profile(*common)
        plots_mod.plot_r_profile(*common)
        plots_mod.plot_cell_dist([sample], reference, arg, ["model"], ["m0"], "")
        chi2 = (out_dir / "histogram_chi2_2_m0.txt").read_text()
        return [float(v) for v in _re.findall(r"([0-9]*\.[0-9]+(?:e-?\d+)?)", chi2)]

    seps_ref = run_suite(ref_plots, RefHLF, tmp_path / "ref_out")
    seps_ours = run_suite(our_plots, OurHLF, tmp_path / "our_out")
    # call-order layout: 1 Etot + 5 E_layer + 5 ECEta + 5 ECPhi + 5 WidthEta
    # + 5 WidthPhi + 5 sparsity + 3 depth_a + 4 depth_r + z + r + cell = 41
    assert len(seps_ref) == len(seps_ours) == 41
    # depth_r middle alpha slices (indices 35, 36) differ BY DESIGN: the
    # reference's CalculateWeightedDepthR has a precedence bug —
    # `(edge_idx + 1) * len(self.r_edges[0]) - 1` instead of
    # `(edge_idx + 1) * (len(self.r_edges[0]) - 1)` (HighLevelFeatures.py:112-115)
    # — so its middle slices overlap their neighbours; ours are disjoint
    # (first and last slice agree because the overlap clips at the layer edge)
    mask = np.ones(41, bool)
    mask[[35, 36]] = False
    np.testing.assert_allclose(np.asarray(seps_ours)[mask],
                               np.asarray(seps_ref)[mask], rtol=1e-4, atol=1e-7)
    assert not np.allclose(seps_ours[35], seps_ref[35])  # the documented delta


def test_high_level_features_parity(tmp_path):
    """HLF observables (Etot, per-layer E, EC/width eta-phi, sparsity) match
    the reference numpy implementation on the same geometry + showers."""
    xml, shower, energy = _synthetic_geometry(tmp_path)
    sys.path.insert(0, REFERENCE)
    try:
        from experiments.calo_utils.ugr_evaluation.HighLevelFeatures import (
            HighLevelFeatures as RefHLF,
        )
    finally:
        sys.path.remove(REFERENCE)
    from vit4hep_tpu.evaluation.high_level_features import HighLevelFeatures

    ref = RefHLF("photon", filename=xml)
    ours = HighLevelFeatures("photon", filename=xml)
    ref.CalculateFeatures(shower)
    ours.CalculateFeatures(shower)

    np.testing.assert_allclose(ours.GetEtot(), ref.GetEtot(), rtol=1e-6)
    for layer in ref.GetElayers():
        np.testing.assert_allclose(
            ours.GetElayers()[layer], ref.GetElayers()[layer], rtol=1e-6
        )
    for layer in ref.GetECEtas():
        np.testing.assert_allclose(
            ours.GetECEtas()[layer], ref.GetECEtas()[layer], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            ours.GetECPhis()[layer], ref.GetECPhis()[layer], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            ours.GetWidthEtas()[layer], ref.GetWidthEtas()[layer], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            ours.GetWidthPhis()[layer], ref.GetWidthPhis()[layer], rtol=1e-4, atol=1e-5
        )
    for layer in ref.GetSparsity():
        np.testing.assert_allclose(
            ours.GetSparsity()[layer], ref.GetSparsity()[layer], rtol=1e-6
        )


def test_cinn_graphinn_run_dir_migration(ref_vit_module, ref_inn_modules):
    """Full GraphINN checkpoint conversion (utils/torch_migration.py:
    convert_cinn_state_dict): a synthetic reference cINN state dict —
    [coupling, permute] x 2 in FrEIA's ``module_list.{i}`` layout, built from
    the actual reference block modules — converts to FlowChain params +
    permutation indices, and the migrated CaloChallengeCINN reproduces the
    torch composition (z and log|det J|), plus the EMA shadow mapping."""
    import jax.numpy as jnp
    import torch.nn as tnn

    from vit4hep_tpu.utils.config import instantiate
    from vit4hep_tpu.utils.torch_migration import (
        convert_cinn_state_dict,
        convert_ema_state_dict,
        strip_state_dict_prefixes,
    )

    ref_nflows, _ = ref_inn_modules
    sys.path.insert(0, REFERENCE)
    try:
        from nn.inn.subnets import SubnetViT
    finally:
        sys.path.remove(REFERENCE)

    T, P, COND, NB, NBLOCKS = 6, 8, 4, 6, 2
    vit_kwargs = {
        "dim": 3, "condition_dim": COND, "hidden_dim": 48, "depth": 1,
        "num_heads": 2, "mlp_ratio": 2.0, "learn_pos_embed": True,
        "use_torch_sdpa": True,
    }

    def ref_subnet_ctor(x_in, x_out):
        return SubnetViT(
            x_out=x_out, patch_dim=P, num_patches=[[3, 1, 2]],
            prod_num_patches=T // 2, **vit_kwargs,
        )

    class PermuteShim(tnn.Module):
        """FrEIA PermuteRandom state-dict layout: perm/perm_inv as
        non-trainable parameters (reference nn/inn/permute.py:31-32)."""

        def __init__(self, n, seed):
            super().__init__()
            perm = np.random.RandomState(seed).permutation(n)
            self.perm = tnn.Parameter(
                torch.LongTensor(perm), requires_grad=False)
            self.perm_inv = tnn.Parameter(
                torch.LongTensor(np.argsort(perm)), requires_grad=False)

        def forward(self, x):
            return x[:, self.perm]

    torch.manual_seed(11)
    modules = []
    for i in range(NBLOCKS):
        block = ref_nflows.CaloRationalQuadraticSplineBlock(
            dims_in=[(T, P)], dims_c=[(COND,)],
            subnet_constructor=ref_subnet_ctor, num_bins=NB, bounds_init=1.0,
            tails="linear", bounds_type="SOFTPLUS", spatial=False,
        )
        # zero-init FinalLayers make blocks the identity; perturb to expose
        for name, p in block.named_parameters():
            if "adaLN" in name or "final_layer.linear" in name:
                with torch.no_grad():
                    p.copy_(0.05 * torch.randn_like(p))
        modules.append(block)
        modules.append(PermuteShim(T, seed=100 + i))

    graph = tnn.Module()
    graph.module_list = tnn.ModuleList(modules)
    full_sd = {f"net.{k}": v for k, v in graph.state_dict().items()}

    model_sd = strip_state_dict_prefixes(full_sd)
    params, perms = convert_cinn_state_dict(model_sd, "CaloRQSplineNFlows")
    assert len(perms) == NBLOCKS
    np.testing.assert_array_equal(
        perms[0], graph.module_list[1].perm.numpy())

    model = instantiate({
        "_target_": "vit4hep_tpu.models.calochallenge.CaloChallengeCINN",
        "shape": [6, 2, 4], "patch_shape": [[2, 2, 2]], "in_channels": 1,
        "coupling_block": "CaloRQSplineNFlows", "nblocks": NBLOCKS,
        "is_spatial": [False] * NBLOCKS,
        "cinn_kwargs": {"num_bins": NB, "bounds_init": 1.0},
        "vit_kwargs": {k: v for k, v in vit_kwargs.items()
                       if k != "use_torch_sdpa"},
        "permutations": perms,
    })
    variables = {"params": params}

    gen = np.random.default_rng(41)
    x_tok = gen.uniform(-1.2, 1.2, (5, T, P)).astype(np.float32)
    c = gen.standard_normal((5, COND)).astype(np.float32)

    # torch composition: block -> token permute, twice; then its inverse
    with torch.no_grad():
        zt = torch.from_numpy(x_tok)
        jt = torch.zeros(5)
        for i in range(NBLOCKS):
            (zt,), j = graph.module_list[2 * i]((zt,), c=[torch.from_numpy(c)])
            jt = jt + j
            zt = graph.module_list[2 * i + 1](zt)
        back_t = zt
        for i in reversed(range(NBLOCKS)):
            back_t = back_t[:, graph.module_list[2 * i + 1].perm_inv]
            (back_t,), _ = graph.module_list[2 * i]((back_t,),
                                                    c=[torch.from_numpy(c)],
                                                    rev=True)

    z_ours, j_ours = model.net.apply(variables, jnp.asarray(x_tok),
                                     jnp.asarray(c), method=model.net.forward)
    np.testing.assert_allclose(np.asarray(z_ours), zt.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ours), jt.numpy(),
                               atol=1e-4, rtol=1e-4)

    # inverse parity vs the torch inverse (NB the perturbation is kept small:
    # at 0.3 the composed flow pushes values outside the spline domain where
    # the inverse is ill-conditioned in BOTH frameworks — the reference's own
    # round-trip error is ~0.21 there — and element-wise comparison of two
    # f32 implementations becomes meaningless)
    x_back, _ = model.net.apply(variables, z_ours, jnp.asarray(c),
                                method=model.net.inverse)
    np.testing.assert_allclose(np.asarray(x_back), back_t.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(x_back), x_tok, atol=1e-4, rtol=1e-3)

    # EMA shadows pair positionally with the trainable parameters
    shadows = [1.01 * p.detach().clone()
               for p in graph.parameters() if p.requires_grad]
    ema_vars = convert_ema_state_dict(
        {"shadow_params": shadows, "num_updates": 5}, model_sd, "cinn",
        coupling_block="CaloRQSplineNFlows",
    )
    ref_leaf = 1.01 * model_sd["module_list.0._spline1.subnet.vit.x_embedder.weight"]
    ours_leaf = ema_vars["params"]["blocks_0"]["subnet1"]["x_embedder"]["kernel"]
    np.testing.assert_allclose(np.asarray(ours_leaf), ref_leaf.numpy().T,
                               atol=1e-6)


def test_cinn_torch_pt_warm_start_e2e(ref_vit_module, ref_inn_modules, tmp_path):
    """Drop-in migration for cINN run dirs: a reference-format GraphINN
    models/model_run0.pt warm-starts `train=false` sampling end to end, with
    the checkpoint's permutation indices injected into the rebuilt model and
    re-snapshotted into config.yaml."""
    import torch.nn as tnn

    from tests.conftest import make_binning_xml, make_shower_hdf5
    from tests.test_cinn_e2e import _cfg
    from vit4hep_tpu.experiments.calochallenge import CaloChallenge

    _, ref_v2 = ref_inn_modules
    sys.path.insert(0, REFERENCE)
    try:
        from nn.inn.subnets import SubnetViT
    finally:
        sys.path.remove(REFERENCE)

    xml = make_binning_xml(tmp_path / "binning.xml", n_layers=4, n_r=3, n_alpha=4)
    h5 = make_shower_hdf5(tmp_path / "showers.hdf5", n_events=256, n_voxels=48)
    cfg = _cfg(tmp_path, {"xml": str(xml), "h5": str(h5)})

    # reference-side graph matching cfg.model: shape [4,4,3] / patch [1,2,1]
    # -> 24 tokens x patch_dim 2; CaloRQSplineFrEIA = rqs_v2 spline w/ SubnetViT
    T, P, COND, NBLOCKS = 24, 2, 5, 2
    vk = cfg.model.vit_kwargs.to_container()
    torch.manual_seed(53)
    modules = []
    for i in range(NBLOCKS):
        block = ref_v2.RationalQuadraticSpline(
            [(T, P)], [(COND,)],
            subnet_constructor=lambda x_in, x_out: SubnetViT(
                x_out=x_out, patch_dim=P, num_patches=[[4, 2, 3]],
                prod_num_patches=T // 2, use_torch_sdpa=True,
                **{k: v for k, v in vk.items() if k != "out_channels"},
                ),
            bins=int(cfg.model.cinn_kwargs.bins),
            min_bin_sizes=tuple(cfg.model.cinn_kwargs.min_bin_sizes),
            default_domain=tuple(cfg.model.cinn_kwargs.default_domain),
            identity_tails=bool(cfg.model.cinn_kwargs.identity_tails),
            spatial=False,
        )
        for name, p in block.named_parameters():
            if "adaLN" in name or "final_layer.linear" in name:
                with torch.no_grad():
                    p.copy_(0.05 * torch.randn_like(p))
        modules.append(block)

        perm = np.random.RandomState(7 + i).permutation(T)
        shim = tnn.Module()
        shim.perm = tnn.Parameter(torch.LongTensor(perm), requires_grad=False)
        shim.perm_inv = tnn.Parameter(
            torch.LongTensor(np.argsort(perm)), requires_grad=False)
        modules.append(shim)

    graph = tnn.Module()
    graph.module_list = tnn.ModuleList(modules)

    run_dir = tmp_path / "runs" / "TestCINN" / "run_torchpt"
    (run_dir / "models").mkdir(parents=True)
    torch.save(
        {
            "model": {f"net.{k}": v for k, v in graph.state_dict().items()},
            "optimizer": {},
            "scheduler": None,
            "ema": {
                "decay": 0.999,
                "num_updates": 7,
                "shadow_params": [
                    p.detach().clone() for p in graph.parameters()
                    if p.requires_grad
                ],
            },
        },
        str(run_dir / "models" / "model_run0.pt"),
    )

    cfg.run_name = "run_torchpt"
    cfg.ema = True
    cfg.train = False
    cfg.warm_start_idx = 0
    cfg.run_idx = 0
    cfg.run_dir = str(run_dir)
    exp = CaloChallenge(cfg)
    exp()
    assert int(exp.state.ema_updates) == 7
    # the permutations must be injected + re-snapshotted for later resumes
    assert list(exp.cfg.model.permutations[0]) == list(
        graph.module_list[1].perm.numpy())
    assert "permutations" in (run_dir / "config.yaml").read_text()
    samples, conds = exp.sample_n()
    assert np.all(np.isfinite(np.asarray(samples)))
