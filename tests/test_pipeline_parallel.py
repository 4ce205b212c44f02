"""GPipe-style pipeline parallelism (parallel/pipeline.py): the microbatched
ppermute schedule over a virtual ``pipe`` mesh axis must reproduce sequential
block application exactly."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from vit4hep_tpu.parallel.pipeline import (
    pipelined_stack,
    spmd_pipeline,
    stack_stage_params,
)

DEPTH, HID = 8, 16


def _pipe_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("pipe",))


def _mlp_params(key, depth=DEPTH, hid=HID):
    keys = jax.random.split(key, depth)
    return [
        {
            "w1": jax.random.normal(k, (hid, 2 * hid)) * 0.3,
            "w2": jax.random.normal(jax.random.fold_in(k, 1), (2 * hid, hid)) * 0.3,
        }
        for k in keys
    ]


def _mlp_block(p, x, c):
    return x + jnp.tanh((x + c[:, None, :]) @ p["w1"]) @ p["w2"]


def _sequential(params, x, c):
    for p in params:
        x = _mlp_block(p, x, c)
    return x


def test_stack_stage_params_shapes():
    params = _mlp_params(jax.random.PRNGKey(0))
    stacked = stack_stage_params(params, 4)
    assert stacked["w1"].shape == (4, 2, HID, 2 * HID)
    # stage 1's first block is global block 2
    np.testing.assert_array_equal(stacked["w1"][1, 0], params[2]["w1"])


def test_pipeline_matches_sequential():
    key = jax.random.PRNGKey(0)
    params = _mlp_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (8, 6, HID))
    c = jax.random.normal(jax.random.fold_in(key, 2), (8, HID))

    ref = _sequential(params, x, c)
    for n_stages, n_micro in [(2, 4), (4, 4), (8, 8), (4, 8)]:
        mesh = _pipe_mesh(n_stages)
        out = jax.jit(
            lambda xx, cc, m=mesh, nm=n_micro: pipelined_stack(
                _mlp_block, params, m, xx, cc, n_micro=nm
            )
        )(x, c)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_pipeline_grads_match():
    key = jax.random.PRNGKey(3)
    params = _mlp_params(key, depth=4)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 3, HID))
    c = jax.random.normal(jax.random.fold_in(key, 2), (4, HID))
    mesh = _pipe_mesh(4)

    def loss_pipe(ps):
        return jnp.sum(pipelined_stack(_mlp_block, ps, mesh, x, c) ** 2)

    def loss_seq(ps):
        return jnp.sum(_sequential(ps, x, c) ** 2)

    g_pipe = jax.grad(loss_pipe)(params)
    g_seq = jax.grad(loss_seq)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        g_pipe, g_seq,
    )


@pytest.mark.slow
def test_pipeline_dit_blocks():
    """The real model block (ViT DiTBlock) streams through the pipeline."""
    import flax.linen as nn

    from vit4hep_tpu.models.vit import DiTBlock

    block = DiTBlock(hidden=HID, num_heads=2, mlp_ratio=2.0, attn_impl="xla")
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.fold_in(key, 1), (8, 5, HID))
    c = jax.random.normal(jax.random.fold_in(key, 2), (8, HID))

    def rand_like(k, tree):
        leaves, treedef = jax.tree.flatten(tree)
        keys = jax.random.split(k, len(leaves))
        return jax.tree.unflatten(
            treedef, [0.2 * jax.random.normal(kk, l.shape) for kk, l in zip(keys, leaves)]
        )

    init = block.init(key, x, c)["params"]
    params = [rand_like(jax.random.fold_in(key, i), init) for i in range(4)]

    def block_fn(p, xx, cc):
        return block.apply({"params": p}, xx, cc)

    ref = x
    for p in params:
        ref = block_fn(p, ref, c)

    mesh = _pipe_mesh(4)
    out = pipelined_stack(block_fn, params, mesh, x, c, n_micro=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
