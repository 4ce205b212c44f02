"""Training state and the jitted SPMD train step.

This is the TPU-native core runtime replacing the reference's stateful
``BaseExperiment._step`` (base_experiment.py:555-620): loss, gradients, the
gradient-hygiene chain (norm measurement, value clip, global-norm clip,
spike-skip after MIN_STEP_SKIP, nonfinite-skip), the optax update, and the EMA
update are one pure function compiled once over the device mesh. Gradient
all-reduce across data-parallel shards is inserted by the XLA partitioner —
there is no DDP wrapper.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

# reference base_experiment.py:31 — spike-skip only active after this many steps
MIN_STEP_SKIP = 1000


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any          # None when EMA disabled
    step: jnp.ndarray        # int32 scalar — number of *applied* updates
    ema_updates: jnp.ndarray  # int32 scalar — EMA update counter (torch_ema parity)
    lr_scale: jnp.ndarray    # float32 scalar — ReduceLROnPlateau multiplier


def create_train_state(params, tx, use_ema: bool) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        step=jnp.zeros((), jnp.int32),
        ema_updates=jnp.zeros((), jnp.int32),
        lr_scale=jnp.ones((), jnp.float32),
    )


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def _clip_by_value(grads, clip_value):
    return jax.tree.map(lambda g: jnp.clip(g, -clip_value, clip_value), grads)


def _clip_by_global_norm(grads, norm, max_norm):
    # torch.nn.utils.clip_grad_norm_ semantics: scale by min(1, max/(norm+1e-6))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)


def _ema_decay(base_decay, num_updates):
    """torch_ema decay warmup: min(decay, (1 + n) / (10 + n)) where n is the
    POST-increment update count (torch_ema increments num_updates before
    computing the decay — the first update uses n=1, i.e. decay 2/11)."""
    n = num_updates.astype(jnp.float32)
    return jnp.minimum(base_decay, (1.0 + n) / (10.0 + n))


def make_train_step(
    loss_fn,
    tx: optax.GradientTransformation,
    *,
    clip_grad_value: float | None = None,
    clip_grad_norm: float | None = None,
    max_grad_norm: float | None = None,
    ema_decay: float | None = None,
):
    """Build the pure train step.

    loss_fn(params, *batch, rng) -> scalar loss.
    Returns fn(state, batch, rng) -> (state, metrics dict).
    """

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *batch, rng)

        grad_norm_net = global_norm(grads)  # reference base_experiment.py:562-564
        if clip_grad_value is not None:
            grads = _clip_by_value(grads, clip_grad_value)
        grad_norm = global_norm(grads)
        if clip_grad_norm is not None:
            grads = _clip_by_global_norm(grads, grad_norm, clip_grad_norm)

        # update-skip guard: nonfinite grads always skip; spikes skip after
        # MIN_STEP_SKIP when max_grad_norm is set (reference :586-591)
        ok = jnp.isfinite(grad_norm)
        if max_grad_norm is not None:
            ok = jnp.logical_and(
                ok,
                jnp.logical_or(state.step <= MIN_STEP_SKIP, grad_norm <= max_grad_norm),
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)

        # skip = per-leaf select, NOT lax.cond: a cond whose branches return
        # the full (params, opt_state, ema) tuple forces XLA to materialize
        # tuple copies of every leaf each step inside the scanned train
        # program (xplane: %conditional + while-carry copy fusions).
        # jnp.where fuses into the optimizer-update fusions instead, and is
        # exact — where(ok=False, nan_update, old) returns old, so nonfinite
        # grads still leave params/opt_state/EMA untouched, and the
        # step/EMA counters advance exactly as the branches did.
        def _sel(new, old):
            return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)

        new_params = _sel(new_params, state.params)
        new_opt_state = _sel(new_opt_state, state.opt_state)
        if state.ema_params is not None:
            decay = _ema_decay(ema_decay, state.ema_updates + 1)
            new_ema = _sel(
                jax.tree.map(
                    lambda e, p: e * decay + p * (1.0 - decay),
                    state.ema_params,
                    new_params,
                ),
                state.ema_params,
            )
            ema_updates = state.ema_updates + ok.astype(state.ema_updates.dtype)
        else:
            new_ema = None
            ema_updates = state.ema_updates
        new_state = state.replace(
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            step=state.step + 1,
            ema_updates=ema_updates,
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "grad_norm_net": grad_norm_net,
            "skipped": jnp.logical_not(ok).astype(jnp.int32),
        }
        return new_state, metrics

    return train_step


# ---------------------------------------------------------------------------
# optimizer / schedule factories (reference base_experiment.py:329-431)
# ---------------------------------------------------------------------------
def make_schedule(training_cfg, lr=None) -> optax.Schedule:
    lr = float(training_cfg.lr if lr is None else lr)
    name = training_cfg.get("scheduler")
    if name is None:
        return optax.constant_schedule(lr)
    iterations = int(training_cfg.iterations)
    scale = float(training_cfg.get("scheduler_scale", 1))
    steps = max(1, int(iterations * scale))
    if name == "CosineAnnealingLR":
        eta_min = float(training_cfg.get("cosanneal_eta_min", 0.0))
        return optax.cosine_decay_schedule(lr, steps, alpha=eta_min / lr if lr else 0.0)
    if name == "OneCycleLR":
        return optax.cosine_onecycle_schedule(
            transition_steps=steps,
            peak_value=lr * float(training_cfg.get("onecycle_max_lr", 10)),
            pct_start=float(training_cfg.get("onecycle_pct_start", 0.2)),
        )
    if name == "ReduceLROnPlateau":
        # plateau handling is host-driven via TrainState.lr_scale
        if training_cfg.get("optimizer") == "Ranger":
            # lr_scale multiplies the final updates, which would corrupt
            # Lookahead's exact sync step (fast params must land ON the
            # stored slow weights) — torch scales only the inner RAdam lr
            raise ValueError(
                "ReduceLROnPlateau + Ranger is not supported: the host-driven "
                "lr_scale would break Lookahead's sync step"
            )
        return optax.constant_schedule(lr)
    raise ValueError(f"Learning rate scheduler {name} not implemented")


def make_optimizer(training_cfg, schedule=None) -> optax.GradientTransformation:
    name = training_cfg.get("optimizer", "AdamW")
    lr = schedule if schedule is not None else make_schedule(training_cfg)
    betas = tuple(training_cfg.get("betas", (0.9, 0.999)))
    eps = float(training_cfg.get("eps", 1e-8))
    wd = float(training_cfg.get("weight_decay", 0.0))
    def _coupled_l2(tx):
        # torch Adam/RAdam apply weight_decay as coupled L2: grad += wd * param
        # BEFORE the moment updates (reference base_experiment.py:333-353)
        if wd:
            return optax.chain(optax.add_decayed_weights(wd), tx)
        return tx

    if name == "Adam":
        return _coupled_l2(optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps))
    if name == "AdamW":
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd)
    if name == "RAdam":
        return _coupled_l2(optax.radam(lr, b1=betas[0], b2=betas[1], eps=eps))
    if name == "Lion":
        return optax.lion(lr, b1=betas[0], b2=betas[1], weight_decay=wd)
    if name == "Ranger":
        # weaver-style Ranger = RAdam(0.95, 0.999, eps 1e-5, coupled wd)
        # + Lookahead(k=6, alpha=0.5)
        inner = _coupled_l2(optax.radam(lr, b1=0.95, b2=0.999, eps=1e-5))
        return _lookahead(inner, sync_period=6, slow_step=0.5)
    raise ValueError(f"Optimizer {name} not implemented")


def _lookahead(inner, sync_period: int, slow_step: float) -> optax.GradientTransformation:
    """Lookahead wrapper operating directly on the fast params (no param-pair
    wrapper, unlike optax.lookahead, so it composes with our TrainState)."""

    def init(params):
        return {
            "inner": inner.init(params),
            "slow": jax.tree.map(jnp.copy, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(updates, state, params):
        inner_updates, inner_state = inner.update(updates, state["inner"], params)
        count = state["count"] + 1
        sync = count % sync_period == 0
        fast = optax.apply_updates(params, inner_updates)

        # per-leaf select, not lax.cond (same reason as make_train_step's
        # skip guard: cond branches returning param-sized tuples force XLA
        # tuple copies every step inside the scanned train program)
        synced_slow = jax.tree.map(
            lambda s, f: s + slow_step * (f - s), state["slow"], fast
        )
        new_slow = jax.tree.map(
            lambda ns, s: jnp.where(sync, ns, s), synced_slow, state["slow"]
        )
        out_updates = jax.tree.map(
            lambda ns, p, u: jnp.where(sync, ns - p, u),
            synced_slow, params, inner_updates,
        )
        return out_updates, {"inner": inner_state, "slow": new_slow, "count": count}

    return optax.GradientTransformation(init, update)
