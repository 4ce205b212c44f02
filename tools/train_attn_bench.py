"""Train-step throughput A/B: attn_impl auto vs xla at ds2/ds3 shapes.

The model path's `auto` dispatch (ops/attention.py:qkv_attention) routes
N>=128 through the fused-layout kernel pair (ops/fused_qkv_attention.py,
fwd + bwd) — this tool measures full donated train steps (`inner` steps
scanned inside one jitted program, bench.py's bench_train pattern) for
each impl, so any backward-kernel regression shows up as train it/s.
History: this A/B caught the einsum-backward regression (ds2 51.6 vs 54.6
xla) that motivated the dedicated backward kernel (63.0 after), and the
round-2 numbers in BASELINE.md (ds2 63.0/72.3, ds3 88.0 vs ~55 xla).

Run: python tools/train_attn_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

if __import__("os").environ.get("JAX_PLATFORMS"):
    # axon plugin overrides JAX_PLATFORMS from the env; re-assert it
    import jax

    jax.config.update("jax_platforms",
                      __import__("os").environ["JAX_PLATFORMS"])

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench_train(yaml_rel: str, shape, attn_impl: str, batch=16, inner=10,
                n_iters=3, fused_block=None) -> float:
    import jax
    import jax.numpy as jnp

    from vit4hep_tpu.experiments import train_state as ts
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    cfg = _load_yaml(os.path.join(_REPO, "configs", yaml_rel))
    cfg["net"]["param"]["attn_impl"] = attn_impl
    if fused_block is not None:
        # the VERDICT-3 decision knob: `true` trains through the DiT
        # megakernel tier (all-Pallas fwd+bwd); `sample`/False keep the
        # composed train step. checkpoint_grads vetoes the kernels, so
        # clear it for the A/B (models/vit.py:_blocks).
        cfg["net"]["param"]["fused_block"] = fused_block
        cfg["net"]["param"]["checkpoint_grads"] = False
    model = instantiate(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    class TCfg(dict):
        __getattr__ = dict.get
        lr = 1e-3
        iterations = 1000

    tx = ts.make_optimizer(TCfg())
    state = ts.create_train_state(params, tx, use_ema=True)
    step = ts.make_train_step(
        lambda p, x, c, rng: model.batch_loss(p, x, c, rng),
        tx, clip_grad_value=None, clip_grad_norm=1.0, max_grad_norm=50.0,
        ema_decay=0.9999,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch,) + tuple(shape)).astype(np.float32))
    c = jnp.asarray(np.random.default_rng(1).normal(
        size=(batch, 46)).astype(np.float32))

    @jax.jit
    def run(state, key):
        def body(carry, i):
            s, _ = step(carry, (x, c), jax.random.fold_in(key, i))
            return s, None
        state, _ = jax.lax.scan(body, state, jnp.arange(inner))
        return state

    state = run(state, jax.random.PRNGKey(1))
    float(jnp.sum(jax.tree.leaves(state.params)[0]))  # sync
    t0 = time.perf_counter()
    for i in range(n_iters):
        state = run(state, jax.random.PRNGKey(2 + i))
    float(jnp.sum(jax.tree.leaves(state.params)[0]))
    dt = time.perf_counter() - t0
    return inner * n_iters / dt


def main():
    import jax.numpy as jnp

    smoke = "--smoke" in sys.argv  # CPU plumbing check: ds2 only, tiny steps
    float(jnp.zeros(()))  # tunnel warm-up fetch
    workloads = [
        ("ds2", "model/cfm/cfm_ds2_electrons.yaml", (1, 45, 16, 9), 64),
        ("ds3", "model/cfm/cfm_ds3_electrons.yaml", (1, 45, 50, 18), 16),
    ]
    if smoke:
        workloads = workloads[:1]
        global bench_train
        _orig = bench_train
        bench_train = (lambda y, s, i, batch=64, **kw:
                       _orig(y, s, i, batch=2, inner=1, n_iters=1, **kw))
    for name, yaml_rel, shape, batch in workloads:
        for impl in ("xla", "auto"):
            rate = bench_train(yaml_rel, shape, impl, batch=batch)
            print(f"{name} train (batch {batch}) attn_impl={impl:5s}: "
                  f"{rate:6.2f} it/s")
        # the fused_block decision arms: `true` = all-Pallas megakernel
        # fwd+bwd (VERDICT r2 #3, lost -5.7%/-13% round 4); "hybrid" = the
        # round-5 arm (VERDICT r4 next #2): megakernel forward writing the
        # residual set + composed-XLA backward over those residuals
        # (batched dW matmuls, zero recompute)
        for fb in (True, "hybrid"):
            rate = bench_train(yaml_rel, shape, "auto", batch=batch,
                               fused_block=fb)
            print(f"{name} train (batch {batch}) fused_block={fb}:   "
                  f"{rate:6.2f} it/s")


if __name__ == "__main__":
    main()
