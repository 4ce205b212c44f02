"""On-chip A/B: select-based skip guard vs the old lax.cond one.

make_train_step's nonfinite/spike skip guard was a ``lax.cond`` whose
branches returned the full (params, opt_state, ema) state; inside the
scanned train program XLA materializes tuple copies of every leaf each
step (xplane: %conditional + while-carry copies, tools/train_roofline.py).
The shipped implementation now blends per-leaf with ``jnp.where``. This
tool keeps a frozen copy of the cond version and times both as full
20-step scanned ds2/ds3 train programs (bench.py's exact pattern: state
scan-carried, outer jit boundary NOT donated — both arms share the same
initial params, which donation would invalidate) in ONE process, arms
alternated (the tools/cinn_micro_ab.py pattern — never signal-kill a TPU
client between arms).

Run: python tools/skip_select_ab.py [--ds3] [--smoke]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CASES = {
    "ds2": ("model/cfm/cfm_ds2_electrons.yaml", (1, 45, 16, 9), 64),
    "ds3": ("model/cfm/cfm_ds3_electrons.yaml", (1, 45, 50, 18), 16),
}


def make_cond_train_step(loss_fn, tx, *, clip_grad_norm, max_grad_norm,
                         ema_decay):
    """Frozen copy of the pre-select train step (lax.cond skip guard)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vit4hep_tpu.experiments.train_state import (
        MIN_STEP_SKIP,
        _clip_by_global_norm,
        _ema_decay,
        global_norm,
    )

    def train_step(state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *batch, rng)
        grad_norm_net = global_norm(grads)
        grad_norm = global_norm(grads)
        if clip_grad_norm is not None:
            grads = _clip_by_global_norm(grads, grad_norm, clip_grad_norm)
        ok = jnp.isfinite(grad_norm)
        if max_grad_norm is not None:
            ok = jnp.logical_and(
                ok,
                jnp.logical_or(state.step <= MIN_STEP_SKIP,
                               grad_norm <= max_grad_norm),
            )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)

        def apply(_):
            decay = _ema_decay(ema_decay, state.ema_updates + 1)
            new_ema = jax.tree.map(
                lambda e, p: e * decay + p * (1.0 - decay),
                state.ema_params, new_params)
            return state.replace(
                params=new_params, opt_state=new_opt_state,
                ema_params=new_ema, step=state.step + 1,
                ema_updates=state.ema_updates + 1)

        def skip(_):
            return state.replace(step=state.step + 1)

        new_state = jax.lax.cond(ok, apply, skip, None)
        return new_state, {"loss": loss, "grad_norm": grad_norm,
                           "grad_norm_net": grad_norm_net,
                           "skipped": jnp.logical_not(ok).astype(jnp.int32)}

    return train_step


def main():
    import jax
    import jax.numpy as jnp

    from vit4hep_tpu.experiments import train_state as ts
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    case = "ds3" if "--ds3" in sys.argv else "ds2"
    smoke = "--smoke" in sys.argv
    yaml_rel, shape, batch = _CASES[case]
    inner = 2 if smoke else 20
    rounds = 1 if smoke else 4
    if smoke:
        # plumbing check only: batch 8 keeps both arms' CPU compiles to
        # tens of seconds (official batch = minutes on this 1-vCPU host)
        batch = 8

    model = instantiate(_load_yaml(os.path.join(_REPO, "configs", yaml_rel)))
    params = model.init_params(jax.random.PRNGKey(0))

    class TCfg(dict):
        __getattr__ = dict.get
        lr = 1e-3
        iterations = 1000

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch,) + shape).astype(np.float32))
    c = jnp.asarray(np.random.default_rng(1).normal(
        size=(batch, 46)).astype(np.float32))
    loss_fn = lambda p, xx, cc, rng: model.batch_loss(p, xx, cc, rng)

    # zero-arg builders so each arm's exact kwargs are visible in one place
    # (the lib signature has the extra clip_grad_value kwarg)
    builders = [
        ("select", lambda tx: ts.make_train_step(
            loss_fn, tx, clip_grad_value=None, clip_grad_norm=1.0,
            max_grad_norm=50.0, ema_decay=0.9999)),
        ("cond", lambda tx: make_cond_train_step(
            loss_fn, tx, clip_grad_norm=1.0, max_grad_norm=50.0,
            ema_decay=0.9999)),
    ]
    arms = {}
    for name, builder in builders:
        tx = ts.make_optimizer(TCfg())
        step = builder(tx)
        state = ts.create_train_state(params, tx, use_ema=True)

        @jax.jit
        def run(state, key, _step=step):
            def body(carry, i):
                s, _ = _step(carry, (x, c), jax.random.fold_in(key, i))
                return s, None
            state, _ = jax.lax.scan(body, state, jnp.arange(inner))
            return state

        state = run(state, jax.random.PRNGKey(1))  # compile
        float(jnp.sum(jax.tree.leaves(state.params)[0]))
        arms[name] = [run, state, 0.0]

    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}  case {case} "
          f"(batch {batch}, inner {inner})", flush=True)
    for r in range(rounds):
        for name in ("select", "cond") if r % 2 == 0 else ("cond", "select"):
            run, state, acc = arms[name]
            t0 = time.perf_counter()
            state = run(state, jax.random.PRNGKey(2 + r))
            float(jnp.sum(jax.tree.leaves(state.params)[0]))
            arms[name] = [run, state, acc + time.perf_counter() - t0]
    for name, (_, _, acc) in arms.items():
        per_step = acc / (rounds * inner)
        print(f"{name:6s}: {1 / per_step:7.1f} it/s ({per_step * 1e3:6.2f} "
              f"ms/step)", flush=True)


if __name__ == "__main__":
    main()
