"""Roofline + mechanism A/B for the full train step (ds2 batch 64, ds3 batch 16).

Sampling got the shape-stage roofline (tools/roofline_ds3.py) and the xplane
op breakdown (tools/profile_xplane.py); training only ever had it/s A/Bs
(tools/train_attn_bench.py). This tool closes the gap:

- measures the 20-step scanned train program exactly as bench.py's
  ``_timed_train`` builds it (loss + grad + clip + AdamW + EMA; the state is
  the scan carry — the outer jit boundary is NOT donated, matching bench.py
  so the numbers stay comparable),
- derives matmul MFU from the analytic FLOP count — 3x the forward matmuls
  (fwd + dL/dx + dL/dW), using BASELINE.md's per-block formula
  12*H^2*N + 2*N^2*H (embedders/adaLN ~0.6%, ignored, consistent with the
  sampling roofline),
- runs mechanism arms in ONE process (the tools/cinn_micro_ab.py pattern —
  never signal-kill a TPU client):
    * forward-only loss scan  -> fwd vs bwd split
    * batch 64 -> 128 -> 256  -> row-starvation share (workload pins batch,
      so this is a mechanism proof, not a shippable lever)
    * EMA off / grad-clip off -> per-step overhead of the update extras

Timing matches reference semantics: the reference logs ``time_per_step``
(reference experiments/base_experiment.py:612-620); our it/s is the inverse
at the same batch.

Run (serial on this 1-vCPU host, never concurrently with bench/tests):
    python tools/train_roofline.py [--ds3] [--profile] [--profile-only] [--smoke]

--profile appends an xplane trace + op summary after the sweep;
--profile-only skips the sweep/arms and goes straight to the trace (for
re-profiling on a fragile tunnel without re-paying the sweep).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    # axon plugin overrides JAX_PLATFORMS from the env; re-assert it
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (yaml, input shape, official batch, N tokens, hidden, depth)
_CASES = {
    "ds2": ("model/cfm/cfm_ds2_electrons.yaml", (1, 45, 16, 9), 64, 135, 480, 6),
    "ds3": ("model/cfm/cfm_ds3_electrons.yaml", (1, 45, 50, 18), 16, 450, 480, 6),
}

BF16_PEAK_TFLOPS = 197.0  # v5e


def _fwd_matmul_tflops(batch, n, hidden, depth):
    """Matmul-only forward FLOPs per net eval (BASELINE.md formula: the
    12 H^2 N + 2 N^2 H per-block term counts MACs; FLOPs are 2x)."""
    per_sample = 2 * (12 * hidden * hidden * n + 2 * n * n * hidden) * depth
    return batch * per_sample / 1e12


def _build(yaml_rel, shape, batch, inner):
    import jax
    import jax.numpy as jnp

    from vit4hep_tpu.experiments import train_state as ts
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

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

    def make_run(use_ema=True, clip_grad_norm=1.0):
        tx = ts.make_optimizer(TCfg())
        state = ts.create_train_state(params, tx, use_ema=use_ema)
        step = ts.make_train_step(
            lambda p, xx, cc, rng: model.batch_loss(p, xx, cc, rng),
            tx, clip_grad_value=None, clip_grad_norm=clip_grad_norm,
            max_grad_norm=50.0, ema_decay=0.9999 if use_ema else None,
        )

        @jax.jit
        def run(state, key):
            def body(carry, i):
                s, _ = step(carry, (x, c), jax.random.fold_in(key, i))
                return s, None
            state, _ = jax.lax.scan(body, state, jnp.arange(inner))
            return state

        return run, state

    @jax.jit
    def fwd_only(p, key):
        def body(carry, i):
            loss = model.batch_loss(p, x, c, jax.random.fold_in(key, i))
            return carry + loss, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(inner))
        return acc

    @jax.jit
    def grad_only(p, key):
        # fwd+bwd without optimizer/EMA/skip: isolates the update+control
        # share of the full step. Grads are consumed by a global-norm
        # scalar so nothing param-sized rides the scan carry.
        from vit4hep_tpu.experiments.train_state import global_norm

        def body(carry, i):
            loss, grads = jax.value_and_grad(model.batch_loss)(
                p, x, c, jax.random.fold_in(key, i))
            return carry + loss + global_norm(grads), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(inner))
        return acc

    return model, params, make_run, fwd_only, grad_only


def _time_steps(run_once, sync, inner, n_iters):
    run_once()  # ensure compiled
    sync()
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run_once()
    sync()
    dt = time.perf_counter() - t0
    return dt / (inner * n_iters)  # seconds per step


def main():
    import jax
    import jax.numpy as jnp

    case = "ds3" if "--ds3" in sys.argv else "ds2"
    smoke = "--smoke" in sys.argv
    yaml_rel, shape, batch0, n_tok, hidden, depth = _CASES[case]
    inner = 2 if smoke else 20
    n_iters = 1 if smoke else 3
    if smoke:
        # a smoke validates plumbing, not timing: batch 8 keeps the CPU
        # compile of the scanned train program to tens of seconds (the
        # official batch takes several minutes on this 1-vCPU host)
        batch0 = 8

    float(jnp.zeros(()))  # absorb any first-fetch tunnel backlog
    print(f"device: {jax.devices()[0].platform}  case {case} "
          f"(N={n_tok}, H={hidden}, depth {depth})", flush=True)

    if "--profile-only" in sys.argv:
        batches = []
    elif smoke:
        batches = [batch0]
    else:
        batches = [batch0, batch0 * 2, batch0 * 4]
    base_per_step = None
    for batch in batches:
        _, params, make_run, fwd_only, grad_only = _build(
            yaml_rel, shape, batch, inner)
        run, state0 = make_run()
        state = run(state0, jax.random.PRNGKey(1))  # compile
        sync = lambda: float(jnp.sum(jax.tree.leaves(state.params)[0]))

        def once():
            nonlocal state
            state = run(state, jax.random.PRNGKey(2))

        per_step = _time_steps(once, sync, inner, n_iters)
        fwd_t = _fwd_matmul_tflops(batch, n_tok, hidden, depth)
        mfu = 3 * fwd_t / per_step / BF16_PEAK_TFLOPS

        # forward-only loss scan at the same batch: fwd vs bwd+update split
        _ = float(fwd_only(params, jax.random.PRNGKey(3)))  # compile
        t0 = time.perf_counter()
        for i in range(n_iters):
            _ = float(fwd_only(params, jax.random.PRNGKey(4 + i)))
        fwd_per_eval = (time.perf_counter() - t0) / (inner * n_iters)
        fwd_mfu = fwd_t / fwd_per_eval / BF16_PEAK_TFLOPS

        # fwd+bwd only (no optimizer/EMA/skip-cond): the update+control share
        _ = float(grad_only(params, jax.random.PRNGKey(5)))  # compile
        t0 = time.perf_counter()
        for i in range(n_iters):
            _ = float(grad_only(params, jax.random.PRNGKey(6 + i)))
        gb_per_eval = (time.perf_counter() - t0) / (inner * n_iters)
        gb_mfu = 3 * fwd_t / gb_per_eval / BF16_PEAK_TFLOPS

        tag = " (official)" if batch == batch0 else ""
        print(f"batch {batch:4d}{tag}: {1 / per_step:7.1f} it/s "
              f"({per_step * 1e3:6.2f} ms/step, {3 * fwd_t / per_step:6.1f} "
              f"TFLOP/s, MFU {100 * mfu:4.1f}%) | fwd-only "
              f"{fwd_per_eval * 1e3:6.2f} ms (MFU {100 * fwd_mfu:4.1f}%) | "
              f"fwd+bwd {gb_per_eval * 1e3:6.2f} ms (MFU {100 * gb_mfu:4.1f}%) "
              f"| update+control {1e3 * (per_step - gb_per_eval):5.2f} ms "
              f"({100 * (per_step - gb_per_eval) / per_step:4.1f}% of step)",
              flush=True)
        if batch == batch0:
            base_per_step = per_step

    if not smoke and batches:
        # mechanism arms at the official batch: EMA / clip-norm overhead
        _, _, make_run, _, _ = _build(yaml_rel, shape, batch0, inner)
        for label, kw in [("no EMA", dict(use_ema=False)),
                          ("no grad-norm clip", dict(clip_grad_norm=None))]:
            run, state0 = make_run(**kw)
            state = run(state0, jax.random.PRNGKey(1))
            sync = lambda: float(jnp.sum(jax.tree.leaves(state.params)[0]))

            def once():
                nonlocal state
                state = run(state, jax.random.PRNGKey(2))

            per_step = _time_steps(once, sync, inner, n_iters)
            print(f"arm {label:18s}: {1 / per_step:7.1f} it/s "
                  f"({1e3 * (base_per_step - per_step):+6.2f} ms vs official)",
                  flush=True)

    if "--profile" in sys.argv or "--profile-only" in sys.argv:
        import tempfile

        from tools.profile_xplane import summarize

        _, _, make_run, _, _ = _build(yaml_rel, shape, batch0, inner)
        run, state = make_run()
        state = run(state, jax.random.PRNGKey(1))
        float(jnp.sum(jax.tree.leaves(state.params)[0]))
        trace_dir = tempfile.mkdtemp(prefix=f"xplane_train_{case}_")
        print(f"tracing -> {trace_dir}", flush=True)
        with jax.profiler.trace(trace_dir):
            state = run(state, jax.random.PRNGKey(2))
            float(jnp.sum(jax.tree.leaves(state.params)[0]))
        summarize(trace_dir, top_k=30)


if __name__ == "__main__":
    main()
