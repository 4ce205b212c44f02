"""Unit tests for the train-step skip guard and Lookahead sync.

Both were rewritten from ``lax.cond`` (whose param-tuple branches force XLA
to materialize copies of every state leaf per scanned step — xplane-profiled
on-chip, tools/train_roofline.py) to per-leaf ``jnp.where`` selects. These
tests pin the exact semantics the cond version had (reference
base_experiment.py:562-591 skip guard, weaver Ranger lookahead):

- nonfinite grads: params/opt_state/EMA bitwise-unchanged, step advances,
  ema counter does not, metrics flag the skip
- spike skip after MIN_STEP_SKIP: same
- lookahead: slow params frozen between syncs, fast lands ON the blended
  slow value at the sync step
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit4hep_tpu.experiments.train_state import (
    MIN_STEP_SKIP,
    _lookahead,
    create_train_state,
    make_train_step,
)


def _loss(params, x, rng):
    return jnp.sum(params["w"] * x) + 0.5 * jnp.sum(params["w"] ** 2)


def _make(max_grad_norm=50.0, use_ema=True):
    tx = optax.adam(1e-2)
    params = {"w": jnp.arange(4.0) + 1.0}
    state = create_train_state(params, tx, use_ema=use_ema)
    step = make_train_step(
        _loss, tx, clip_grad_norm=1.0, max_grad_norm=max_grad_norm,
        ema_decay=0.9999 if use_ema else None,
    )
    return step, state


def _leaves(tree):
    return [np.asarray(leaf) for leaf in jax.tree.leaves(tree)]


def test_finite_step_applies():
    step, state = _make()
    x = jnp.ones(4)
    new_state, metrics = jax.jit(step)(state, (x,), jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 0
    assert int(new_state.step) == 1
    assert int(new_state.ema_updates) == 1
    assert not np.allclose(np.asarray(new_state.params["w"]),
                           np.asarray(state.params["w"]))
    # EMA moved toward the new params (warmup decay makes it nearly a copy)
    assert not np.allclose(np.asarray(new_state.ema_params["w"]),
                           np.asarray(state.ema_params["w"]))


def test_nonfinite_grads_skip_bitwise():
    step, state = _make()
    x = jnp.array([1.0, jnp.nan, 1.0, 1.0])
    new_state, metrics = jax.jit(step)(state, (x,), jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 1
    assert int(new_state.step) == 1          # step always advances
    assert int(new_state.ema_updates) == 0   # ema counter does not
    for new, old in zip(_leaves(new_state.params), _leaves(state.params)):
        np.testing.assert_array_equal(new, old)
    for new, old in zip(_leaves(new_state.opt_state), _leaves(state.opt_state)):
        np.testing.assert_array_equal(new, old)
    for new, old in zip(_leaves(new_state.ema_params), _leaves(state.ema_params)):
        np.testing.assert_array_equal(new, old)


def test_spike_skip_after_min_step():
    step, state = _make(max_grad_norm=50.0)
    x_spike = jnp.full((4,), 1e4)  # grad norm >> 50

    # before MIN_STEP_SKIP the spike guard is inactive (reference :586-591)
    new_state, metrics = jax.jit(step)(state, (x_spike,), jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 0
    assert float(metrics["grad_norm"]) > 50.0

    # past MIN_STEP_SKIP the same spike skips, bitwise
    late = state.replace(step=jnp.asarray(MIN_STEP_SKIP + 1, jnp.int32))
    new_state, metrics = jax.jit(step)(late, (x_spike,), jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 1
    assert int(new_state.step) == MIN_STEP_SKIP + 2
    for new, old in zip(_leaves(new_state.params), _leaves(late.params)):
        np.testing.assert_array_equal(new, old)


def test_no_ema_state_skip():
    step, state = _make(use_ema=False)
    assert state.ema_params is None
    x = jnp.array([jnp.nan, 1.0, 1.0, 1.0])
    new_state, metrics = jax.jit(step)(state, (x,), jax.random.PRNGKey(0))
    assert int(metrics["skipped"]) == 1
    assert new_state.ema_params is None
    for new, old in zip(_leaves(new_state.params), _leaves(state.params)):
        np.testing.assert_array_equal(new, old)


@pytest.mark.parametrize("sync_period", [2, 3])
def test_lookahead_sync_semantics(sync_period):
    """Slow params frozen between syncs; at a sync step the emitted updates
    land the fast params exactly ON the blended slow value (weaver Ranger:
    fast := slow + 0.5*(fast - slow))."""
    inner = optax.sgd(0.1)
    tx = _lookahead(inner, sync_period=sync_period, slow_step=0.5)
    params = jnp.arange(4.0)
    state = tx.init(params)
    slow0 = np.asarray(state["slow"])

    g = jnp.ones(4)
    for k in range(1, sync_period + 1):
        prev_params = np.asarray(params)
        updates, state = jax.jit(tx.update)(g, state, params)
        params = optax.apply_updates(params, updates)
        if k < sync_period:
            np.testing.assert_array_equal(np.asarray(state["slow"]), slow0)
            # plain inner-SGD step between syncs
            np.testing.assert_allclose(
                np.asarray(params), prev_params - 0.1, rtol=1e-6)
        else:
            fast_pre = prev_params - 0.1
            expected_slow = slow0 + 0.5 * (fast_pre - slow0)
            np.testing.assert_allclose(
                np.asarray(state["slow"]), expected_slow, rtol=1e-6)
            # fast params land exactly on the new slow value
            np.testing.assert_allclose(
                np.asarray(params), expected_slow, rtol=1e-6)
