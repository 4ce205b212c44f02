"""GPipe-style SPMD pipeline parallelism over a mesh axis.

The reference scales only by DDP (reference main.py:49-66 wraps the model in
``DistributedDataParallel``); on TPU pods the depth dimension is an extra
axis worth sharding when a model stops fitting a chip. This module provides a
generic pipeline combinator in the shard_map + ``ppermute`` style of the
scaling-book recipe:

- the transformer stack is cut into ``n_stages`` equal stages, one per device
  along the ``pipe`` mesh axis; each device holds only its stage's params
  (stacked params sharded on the leading axis),
- the batch is split into microbatches that stream through the stages; the
  schedule runs ``n_micro + n_stages - 1`` ticks of a ``lax.scan``, shifting
  activations stage->stage+1 with ``lax.ppermute`` (ICI neighbours),
- outputs are collected on the last stage and replicated with a masked
  ``psum``, so callers see ordinary replicated outputs.

Everything is a single jitted SPMD program: XLA overlaps the ppermute with
the next tick's stage compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def stack_stage_params(per_block_params: list, n_stages: int):
    """Stack per-block param trees into per-stage trees.

    ``per_block_params`` is a list of ``depth`` identical-structure trees;
    the result has leading axes (n_stages, blocks_per_stage, ...) so it can
    be sharded ``P("pipe")`` on axis 0 and scanned over axis 0 in-stage.
    """
    depth = len(per_block_params)
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by n_stages {n_stages}")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_block_params)
    return jax.tree.map(
        lambda x: x.reshape(n_stages, depth // n_stages, *x.shape[1:]), stacked
    )


def _stage_apply(block_fn, stage_params, x, *ctx):
    """Apply this stage's ``blocks_per_stage`` blocks with a lax.scan."""

    def body(h, p):
        return block_fn(p, h, *ctx), None

    out, _ = jax.lax.scan(body, x, stage_params)
    return out


def spmd_pipeline(block_fn, stage_params, x_mb, *ctx, axis_name="pipe"):
    """Run microbatches through the pipeline. Call INSIDE shard_map.

    block_fn: (params_one_block, x, *ctx) -> x, shapes preserved.
    stage_params: this device's (blocks_per_stage, ...) param slice.
    x_mb: (n_micro, mb, ...) microbatched input (replicated across stages).
    ctx: extra per-microbatch inputs, each (n_micro, mb, ...).
    Returns (n_micro, mb, ...) outputs, replicated across stages.
    """
    n_stages = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    n_micro = x_mb.shape[0]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        act, out = carry
        # stage 0 ingests microbatch t (while in range), others keep the
        # activation shifted to them on the previous tick
        feed = x_mb[jnp.minimum(t, n_micro - 1)]
        act = jnp.where(stage == 0, feed, act)
        mb_ctx = [c[jnp.minimum(jnp.maximum(t - stage, 0), n_micro - 1)] for c in ctx]
        act = _stage_apply(block_fn, stage_params, act, *mb_ctx)
        # the microbatch leaving the last stage this tick entered at
        # t - (n_stages - 1); store it once it is a real one
        done = t - (n_stages - 1)
        is_last = stage == n_stages - 1
        store = jnp.logical_and(is_last, jnp.logical_and(done >= 0, done < n_micro))
        out = jnp.where(
            store, out.at[jnp.maximum(done, 0)].set(act), out
        )
        act = jax.lax.ppermute(act, axis_name, perm)
        return (act, out), None

    # carries become device-varying after the ppermute/.set; type them so
    # from the start (otherwise lax.scan rejects the carry as unequal types)
    act0 = jax.lax.pvary(jnp.zeros_like(x_mb[0]), axis_name)
    out0 = jax.lax.pvary(jnp.zeros_like(x_mb), axis_name)
    (_, out), _ = jax.lax.scan(
        tick, (act0, out0), jnp.arange(n_micro + n_stages - 1)
    )
    # replicate: only the last stage holds real outputs
    out = jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out))
    return jax.lax.psum(out, axis_name)


def pipelined_stack(block_fn, per_block_params, mesh: Mesh, x, *ctx,
                    n_micro=None, axis_name="pipe"):
    """Convenience wrapper: shard a block stack over ``mesh[axis_name]`` and
    run ``x`` (batch-first) through it in ``n_micro`` microbatches.

    block_fn: (params_one_block, x_mb, *ctx_mb) -> x_mb.
    per_block_params: list of per-block param trees (len = depth).
    Returns outputs with the same shape as x, fully replicated.
    """
    n_stages = mesh.shape[axis_name]
    n_micro = n_micro or n_stages
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
    stacked = stack_stage_params(per_block_params, n_stages)

    def to_mb(a):
        return a.reshape(n_micro, b // n_micro, *a.shape[1:])

    x_mb = to_mb(x)
    ctx_mb = tuple(to_mb(c) for c in ctx)

    def shard_fn(stage_stack, xs, *cs):
        # shard_map leaves a leading axis of size 1 (this device's stage)
        sp = jax.tree.map(lambda a: jnp.squeeze(a, 0), stage_stack)
        return spmd_pipeline(block_fn, sp, xs, *cs, axis_name=axis_name)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name),) + (P(),) * (1 + len(ctx_mb)),
        out_specs=P(),
    )
    out_mb = fn(stacked, x_mb, *ctx_mb)
    return out_mb.reshape(b, *x.shape[1:])
