"""cINN TRAIN remat A/B: spline remat x subnet remat, one process.

The round-5 train roofline pinned the cINN step at fwd 46 ms / bwd ~78 ms
with the spline vjp at ~22x its forward (autodiff materializes ~a dozen
(B, D, K) elementwise intermediates per coupling side) and the subnet vjp
at the ~20% small-shape MFU wall. Two remat levers attack the residual
traffic without touching the math (both are EXACT — gradients unchanged):

  spline  `remat_spline: true`  (models/bijectors.py): save only
          (flat, theta), recompute constrain+rqs in the backward
  subnet  `checkpoint_grads: true` in vit_kwargs: flax.nn.remat on the
          ViT1D DiT blocks (saves block inputs, recomputes block fwd)

Arms (full donated-scan train step, batch 64, bench.py pattern):
  baseline / +spline-remat / +subnet-remat / +both

Run: python tools/cinn_train_ab.py  (axon TPU; --smoke for CPU plumbing)
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

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench_arm(tag, spline_remat, subnet_remat, smoke):
    from vit4hep_tpu.experiments import train_state as ts
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    batch = 8 if smoke else 64
    inner = 2 if smoke else 10
    n_iters = 1 if smoke else 3
    cfg = _load_yaml(os.path.join(
        _REPO, "configs", "model/cinn/cinn_ds2_electrons.yaml"))
    if spline_remat:
        cfg["cinn_kwargs"]["remat_spline"] = True
    if subnet_remat:
        cfg["vit_kwargs"]["checkpoint_grads"] = True
    model = instantiate(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    class TCfg(dict):
        __getattr__ = dict.get
        lr = 1e-3
        iterations = 1000

    tx = ts.make_optimizer(TCfg())
    state = ts.create_train_state(params, tx, use_ema=True)
    step = ts.make_train_step(
        lambda p, xx, cc, rng: model.batch_loss(p, xx, cc, rng),
        tx, clip_grad_value=None, clip_grad_norm=1.0, max_grad_norm=50.0,
        ema_decay=0.9999,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 1, 45, 16, 9)).astype(np.float32))
    c = jnp.asarray(np.random.default_rng(1).normal(
        size=(batch, 46)).astype(np.float32))

    @jax.jit
    def run(st, k):
        def body(carry, i):
            s, _ = step(carry, (x, c), jax.random.fold_in(k, i))
            return s, None
        st, _ = jax.lax.scan(body, st, jnp.arange(inner))
        return st

    state = run(state, jax.random.PRNGKey(1))
    float(jnp.sum(jax.tree.leaves(state.params)[0]))
    t0 = time.perf_counter()
    for i in range(n_iters):
        state = run(state, jax.random.PRNGKey(2 + i))
    float(jnp.sum(jax.tree.leaves(state.params)[0]))
    it_s = inner * n_iters / (time.perf_counter() - t0)
    print(f"{tag:24s}: {it_s:6.2f} it/s", flush=True)
    return it_s


def main():
    smoke = "--smoke" in sys.argv
    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}", flush=True)
    base = bench_arm("baseline", False, False, smoke)
    spl = bench_arm("spline remat", True, False, smoke)
    sub = bench_arm("subnet remat", False, True, smoke)
    both = bench_arm("spline + subnet remat", True, True, smoke)
    print(f"delta vs baseline: spline {spl / base - 1:+.1%}  "
          f"subnet {sub / base - 1:+.1%}  both {both / base - 1:+.1%}")


if __name__ == "__main__":
    main()
