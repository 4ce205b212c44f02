"""Tensor parallelism over the (data, model) mesh: sharded params produce the
same numerics as replicated params, with XLA inserting the collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit4hep_tpu.parallel import mesh as mesh_lib
from vit4hep_tpu.parallel.sharding_rules import shard_tree, spec_for_path


def _tiny_vit_model():
    from vit4hep_tpu.utils.config import instantiate

    return instantiate({
        "_target_": "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM",
        "in_channels": 1, "shape": [4, 4, 2], "patch_shape": [1, 2, 1],
        "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.5}},
        "net": {"_target_": "nn.vit.ViT", "param": {
            "dim": 3, "condition_dim": 3, "hidden_dim": 48, "depth": 2,
            "num_heads": 2, "mlp_ratio": 2.0, "num_patches": [[4, 2, 2]],
            "patch_dim": 2}},
    })


def test_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert spec_for_path(("block_0", "Attention_0", "Dense_0", "kernel")) == P(None, "model")
    assert spec_for_path(("block_1", "Attention_0", "Dense_1", "kernel")) == P("model", None)
    assert spec_for_path(("block_0", "MlpBlock_0", "Dense_0", "kernel")) == P(None, "model")
    assert spec_for_path(("block_0", "MlpBlock_0", "Dense_0", "bias")) == P("model",)
    assert spec_for_path(("x_embedder", "kernel")) == P()
    assert spec_for_path(("final_layer", "Dense_0", "kernel")) == P()
    # optimizer-state mirror (mu/nu nest the same names deeper)
    assert spec_for_path(
        ("0", "mu", "params", "block_0", "Attention_0", "Dense_0", "kernel")
    ) == P(None, "model")


def test_tp_matches_replicated():
    model = _tiny_vit_model()
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 1, 4, 4, 2)), jnp.float32)
    t = jnp.full((8, 1), 0.4)
    c = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)), jnp.float32)

    mesh_dp = mesh_lib.create_mesh(model_parallel=1)
    mesh_tp = mesh_lib.create_mesh(model_parallel=2)

    fwd = jax.jit(lambda p, x, t, c: model.forward(p, x, t, c))

    p_rep = mesh_lib.replicate(params, mesh_dp)
    x_dp = mesh_lib.shard_batch(x, mesh_dp)
    out_ref = np.asarray(fwd(p_rep, x_dp, t, c))

    p_tp = shard_tree(params, mesh_tp)
    # qkv kernel really is sharded over the model axis
    qkv = p_tp["params"]["block_0"]["Attention_0"]["Dense_0"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    x_tp = mesh_lib.shard_batch(x, mesh_tp)
    out_tp = np.asarray(fwd(p_tp, x_tp, t, c))
    np.testing.assert_allclose(out_tp, out_ref, rtol=2e-5, atol=2e-6)


def test_tp_train_step():
    """Full jitted train step with TP-sharded state on a (4, 2) mesh."""
    from vit4hep_tpu.experiments import train_state as ts

    model = _tiny_vit_model()
    params = model.init_params(jax.random.PRNGKey(0))

    class TCfg(dict):
        __getattr__ = dict.get
        lr = 1e-3
        iterations = 10

    tx = ts.make_optimizer(TCfg())
    state = ts.create_train_state(params, tx, use_ema=True)
    mesh = mesh_lib.create_mesh(model_parallel=2)
    state = mesh_lib.shard_state(state, mesh)

    step = jax.jit(
        ts.make_train_step(
            lambda p, x, c, rng: model.batch_loss(p, x, c, rng), tx,
            clip_grad_norm=1.0, ema_decay=0.999,
        ),
        donate_argnums=(0,),
    )
    x = np.random.default_rng(0).normal(size=(8, 1, 4, 4, 2)).astype(np.float32)
    c = np.random.default_rng(1).normal(size=(8, 3)).astype(np.float32)
    data = mesh_lib.shard_batch((x, c), mesh)
    state, metrics = step(state, data, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # params stay TP-sharded after the update
    qkv = state.params["params"]["block_0"]["Attention_0"]["Dense_0"]["kernel"]
    assert not qkv.sharding.is_fully_replicated


@pytest.mark.slow
def test_checkpoint_roundtrip_under_sharding(tmp_path):
    """Save a TP-sharded train state with orbax, restore it, and re-place it on
    the mesh: values and shardings survive (SURVEY.md section 4 item 3)."""
    import optax

    from vit4hep_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from vit4hep_tpu.experiments import train_state as ts

    model = _tiny_vit_model()
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.adamw(1e-3)
    state = ts.create_train_state(params, tx, use_ema=True)

    mesh = mesh_lib.create_mesh(num_devices=4, model_parallel=2,
                                devices=jax.devices()[:4])
    sharded = mesh_lib.shard_state(state, mesh)
    # take one real step so opt state is non-trivial
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 1, 4, 4, 2)), jnp.float32)
    c = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)), jnp.float32)
    step = jax.jit(ts.make_train_step(
        lambda p, xx, cc, rng: model.batch_loss(p, xx, cc, rng), tx,
        clip_grad_value=None, clip_grad_norm=None, max_grad_norm=50.0,
        ema_decay=0.99,
    ))
    sharded, _ = step(sharded, (mesh_lib.shard_batch((x, c), mesh)), jax.random.PRNGKey(1))

    path = tmp_path / "ckpt"
    save_checkpoint(path, sharded)
    restored = load_checkpoint(path, target=jax.tree.map(np.zeros_like, sharded))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0),
        jax.tree.map(np.asarray, sharded), restored,
    )

    # re-place on the mesh and continue training: still works, loss finite
    resharded = mesh_lib.shard_state(jax.tree.map(jnp.asarray, restored), mesh)
    _, m = step(resharded, mesh_lib.shard_batch((x, c), mesh), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


def test_tp_matches_replicated_at_kernel_shapes():
    """Same TP parity check but at >=128 tokens, where `attn_impl: auto`
    routes through the fused-layout Pallas kernel — verifies XLA's SPMD
    partitioner composes the pallas_call with Megatron-sharded qkv/out
    kernels correctly (round 2: the kernel consumes the qkv Dense output
    natively, so its operand inherits the column-sharded layout)."""
    from vit4hep_tpu.utils.config import instantiate

    model = instantiate({
        "_target_": "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM",
        "in_channels": 1, "shape": [9, 8, 2], "patch_shape": [1, 1, 1],
        "odeint_kwargs": {"method": "euler", "options": {"step_size": 0.5}},
        "net": {"_target_": "nn.vit.ViT", "param": {
            "dim": 3, "condition_dim": 3, "hidden_dim": 48, "depth": 1,
            "num_heads": 2, "mlp_ratio": 2.0, "num_patches": [[9, 8, 2]],
            "patch_dim": 1}},
    })
    assert model.net.cfg.num_patches == ((9, 8, 2),)  # 144 tokens >= 128

    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 1, 9, 8, 2)), jnp.float32)
    t = jnp.full((8, 1), 0.4)
    c = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)), jnp.float32)

    fwd = jax.jit(lambda p, x, t, c: model.forward(p, x, t, c))

    mesh_dp = mesh_lib.create_mesh(model_parallel=1)
    out_ref = np.asarray(fwd(mesh_lib.replicate(params, mesh_dp),
                             mesh_lib.shard_batch(x, mesh_dp), t, c))

    mesh_tp = mesh_lib.create_mesh(model_parallel=2)
    p_tp = shard_tree(params, mesh_tp)
    qkv = p_tp["params"]["block_0"]["Attention_0"]["Dense_0"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    out_tp = np.asarray(fwd(p_tp, mesh_lib.shard_batch(x, mesh_tp), t, c))
    np.testing.assert_allclose(out_tp, out_ref, atol=1e-5)


def _fused_block_model(fused_stack=True, fused_group=1):
    """144-token model with the DiT megakernel tier enabled (fused_block: true):
    with fused_stack the whole-ViT kernel (ops/fused_dit_block.py:
    fused_vit_forward) runs; without it, one megakernel per block.
    fused_group > 1 exercises the batch-grouped grid."""
    from vit4hep_tpu.utils.config import instantiate

    return instantiate({
        "_target_": "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM",
        "in_channels": 1, "shape": [9, 8, 2], "patch_shape": [1, 1, 1],
        "odeint_kwargs": {"method": "euler", "options": {"step_size": 0.5}},
        "net": {"_target_": "nn.vit.ViT", "param": {
            "dim": 3, "condition_dim": 3, "hidden_dim": 48, "depth": 2,
            "num_heads": 2, "mlp_ratio": 2.0, "num_patches": [[9, 8, 2]],
            "patch_dim": 1, "fused_block": True, "fused_stack": fused_stack,
            "fused_group": fused_group}},
    })


@pytest.mark.slow
@pytest.mark.parametrize("fused_stack,fused_group", [
    (True, 1), (False, 1), (True, 2),
], ids=["whole_vit_kernel", "per_block_megakernel", "grouped_whole_vit"])
def test_tp_fused_block_matches_replicated(fused_stack, fused_group):
    """VERDICT r2 #6: the whole-ViT kernel and the per-block DiT megakernel
    must compose with Megatron TP — XLA's SPMD partitioner resolves each
    pallas_call against column/row-sharded qkv/out/MLP weights. Parity is
    checked TP vs replicated AND fused vs composed on the same params.
    The grouped variant (fused_group 2, local batch 2 per data shard) checks
    the batch-grouped grid still partitions over the data axis."""
    model = _fused_block_model(fused_stack, fused_group)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 1, 9, 8, 2)), jnp.float32)
    t = jnp.full((8, 1), 0.4)
    c = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)), jnp.float32)

    fwd = jax.jit(lambda p, x, t, c: model.forward(p, x, t, c))

    mesh_dp = mesh_lib.create_mesh(model_parallel=1)
    out_rep = np.asarray(fwd(mesh_lib.replicate(params, mesh_dp),
                             mesh_lib.shard_batch(x, mesh_dp), t, c))

    mesh_tp = mesh_lib.create_mesh(model_parallel=2)
    p_tp = shard_tree(params, mesh_tp)
    qkv = p_tp["params"]["block_0"]["Attention_0"]["Dense_0"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    out_tp = np.asarray(fwd(p_tp, mesh_lib.shard_batch(x, mesh_tp), t, c))
    np.testing.assert_allclose(out_tp, out_rep, atol=1e-5)

    # same params through the composed (non-fused) path: the kernels compute
    # the same function (param tree is shared by design)
    composed = _tiny_vit_model_144()
    out_composed = np.asarray(jax.jit(
        lambda p, x, t, c: composed.forward(p, x, t, c))(params, x, t, c))
    np.testing.assert_allclose(out_rep, out_composed, atol=1e-4)

    if fused_group > 1:  # grouped == per-element grid to f32 roundoff
        ungrouped = _fused_block_model(fused_stack, 1)
        out_g1 = np.asarray(jax.jit(
            lambda p, x, t, c: ungrouped.forward(p, x, t, c))(params, x, t, c))
        np.testing.assert_allclose(out_rep, out_g1, atol=1e-5)


def _tiny_vit_model_144():
    from vit4hep_tpu.utils.config import instantiate

    return instantiate({
        "_target_": "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM",
        "in_channels": 1, "shape": [9, 8, 2], "patch_shape": [1, 1, 1],
        "odeint_kwargs": {"method": "euler", "options": {"step_size": 0.5}},
        "net": {"_target_": "nn.vit.ViT", "param": {
            "dim": 3, "condition_dim": 3, "hidden_dim": 48, "depth": 2,
            "num_heads": 2, "mlp_ratio": 2.0, "num_patches": [[9, 8, 2]],
            "patch_dim": 1}},
    })


@pytest.mark.slow
def test_tp_fused_block_train_step():
    """fused_block: true TRAINS correctly under the 2-D mesh: the all-Pallas
    backward (fwd-recompute + backward megakernel per block) partitions with
    TP-sharded weight grads. Loss and grads must match the replicated run."""
    from vit4hep_tpu.experiments import train_state as ts

    model = _fused_block_model(True)
    params = model.init_params(jax.random.PRNGKey(0))

    class TCfg(dict):
        __getattr__ = dict.get
        lr = 1e-3
        iterations = 10

    x = np.random.default_rng(0).normal(size=(8, 1, 9, 8, 2)).astype(np.float32)
    c = np.random.default_rng(1).normal(size=(8, 3)).astype(np.float32)

    def one_step(mesh):
        tx = ts.make_optimizer(TCfg())
        # fresh param buffers per run: the donated step consumes them
        state = ts.create_train_state(
            jax.tree.map(lambda a: jnp.array(np.asarray(a)), params),
            tx, use_ema=True)
        state = mesh_lib.shard_state(state, mesh)
        step = jax.jit(
            ts.make_train_step(
                lambda p, xx, cc, rng: model.batch_loss(p, xx, cc, rng), tx,
                clip_grad_norm=1.0, ema_decay=0.999,
            ),
            donate_argnums=(0,),
        )
        data = mesh_lib.shard_batch((x, c), mesh)
        state, metrics = step(state, data, jax.random.PRNGKey(2))
        return state, float(metrics["loss"])

    state_tp, loss_tp = one_step(mesh_lib.create_mesh(model_parallel=2))
    _, loss_dp = one_step(mesh_lib.create_mesh(model_parallel=1))
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)
    qkv = state_tp.params["params"]["block_0"]["Attention_0"]["Dense_0"]["kernel"]
    assert not qkv.sharding.is_fully_replicated


@pytest.mark.slow
def test_tp_flash_qkv_matches_replicated():
    """TP parity through the panel-native flash tier (round 4,
    ops/flash_qkv_attention.py): attn_impl 'flash' at 144 tokens routes the
    qkv Dense output straight into the online-softmax kernel; Megatron
    column-sharded qkv / row-sharded out projections must compose with it
    exactly like the one-shot fused kernel."""
    from vit4hep_tpu.utils.config import instantiate

    model = instantiate({
        "_target_": "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM",
        "in_channels": 1, "shape": [9, 8, 2], "patch_shape": [1, 1, 1],
        "odeint_kwargs": {"method": "euler", "options": {"step_size": 0.5}},
        "net": {"_target_": "nn.vit.ViT", "param": {
            "dim": 3, "condition_dim": 3, "hidden_dim": 48, "depth": 1,
            "num_heads": 2, "mlp_ratio": 2.0, "num_patches": [[9, 8, 2]],
            "patch_dim": 1, "attn_impl": "flash"}},
    })

    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 1, 9, 8, 2)),
                    jnp.float32)
    t = jnp.full((8, 1), 0.4)
    c = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)), jnp.float32)

    fwd = jax.jit(lambda p, x, t, c: model.forward(p, x, t, c))

    mesh_dp = mesh_lib.create_mesh(model_parallel=1)
    out_ref = np.asarray(fwd(mesh_lib.replicate(params, mesh_dp),
                             mesh_lib.shard_batch(x, mesh_dp), t, c))

    mesh_tp = mesh_lib.create_mesh(model_parallel=2)
    p_tp = shard_tree(params, mesh_tp)
    out_tp = np.asarray(fwd(p_tp, mesh_lib.shard_batch(x, mesh_tp), t, c))
    np.testing.assert_allclose(out_tp, out_ref, atol=1e-5)

    # gradients through the flash custom VJP under TP
    def loss(p, x, t, c):
        return jnp.sum(model.forward(p, x, t, c) ** 2)

    g_ref = jax.grad(loss)(mesh_lib.replicate(params, mesh_dp),
                           mesh_lib.shard_batch(x, mesh_dp), t, c)
    g_tp = jax.grad(loss)(p_tp, mesh_lib.shard_batch(x, mesh_tp), t, c)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
