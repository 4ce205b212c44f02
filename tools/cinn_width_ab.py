"""cINN subnet-width A/B: hidden 192 (parity) vs 256 (2 full lane tiles).

VERDICT r4 next #3 / the round-4 budget's only remaining cINN lever: 63%
of sampling time sits in the ViT1D subnets at ~22% MFU, HBM/lane-bound on
(B*T_half, 192) panels. `cinn_ds2_electrons_tpu.yaml` widens the subnets
to hidden 256. This A/B runs both configs in ONE process (the
cinn_micro_ab pattern — never signal-kill a TPU client):

  - sampling e2e (batch 256, the bench workload)
  - train step (batch 64, the round-5 bench workload)
  - subnet-forward micro + its MFU at both widths

Adoption is gated on the classifier AUC recipe (tools/validate_tpu_config
--tpu-model cinn/cinn_ds2_electrons_tpu); this tool answers the
throughput half only.

Run: python tools/cinn_width_ab.py  (axon TPU; --smoke for CPU plumbing)
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

import tools.roofline_small_stages as rs

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BF16_PEAK_TFLOPS = 197.0
N_HALF = 135


def _subnet_tflops(batch, hid, depth=3):
    macs = depth * (12 * hid * hid * N_HALF + 2 * N_HALF * N_HALF * hid)
    return batch * 2.0 * macs / 1e12


def measure(tag, yaml_rel, smoke):
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    batch = 8 if smoke else 256
    n_iters = 1 if smoke else 4
    model = instantiate(_load_yaml(os.path.join(_REPO, "configs", yaml_rel)))
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    cond = jax.device_put(
        np.random.randn(batch, model.condition_dim).astype(np.float32) * 0.1)

    # sampling e2e
    smp = jax.jit(lambda pr, cc, k: jnp.sum(model.sample_batch(pr, cc, k)))
    float(smp(params, cond, key))
    t0 = time.perf_counter()
    for i in range(n_iters):
        float(smp(params, cond, jax.random.fold_in(key, i)))
    rate = batch * n_iters / (time.perf_counter() - t0)

    # subnet-forward micro
    cb = next(b for b in model.net.blocks if hasattr(b, "subnet_ctor"))
    subnet = cb.subnet_ctor(cb.n_params)
    hid = subnet.cfg.hidden_dim
    x_half = jax.device_put(
        np.random.randn(batch, N_HALF, subnet.cfg.patch_dim).astype(np.float32))
    sp = subnet.init(key, x_half, cond)

    def scan(h0, cc):
        def body(h, _):
            return h + 1e-6 * subnet.apply(sp, h, cc)[..., :h.shape[-1]], None
        h, _ = jax.lax.scan(body, h0, None, length=rs.INNER)
        return h

    t_sub = rs.timed(scan, x_half, cond)
    mfu = _subnet_tflops(batch, hid) / t_sub / BF16_PEAK_TFLOPS

    # train step (batch 64 per configs/training/cinn/ds23.yaml)
    tbatch = 8 if smoke else 64
    inner = 2 if smoke else 10
    from vit4hep_tpu.experiments import train_state as ts

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
        size=(tbatch, 1, 45, 16, 9)).astype(np.float32))
    tc = jnp.asarray(np.random.default_rng(1).normal(
        size=(tbatch, 46)).astype(np.float32))

    @jax.jit
    def run(st, k):
        def body(carry, i):
            s, _ = step(carry, (x, tc), jax.random.fold_in(k, i))
            return s, None
        st, _ = jax.lax.scan(body, st, jnp.arange(inner))
        return st

    state = run(state, jax.random.PRNGKey(1))
    float(jnp.sum(jax.tree.leaves(state.params)[0]))
    t0 = time.perf_counter()
    for i in range(2 if smoke else 3):
        state = run(state, jax.random.PRNGKey(2 + i))
    float(jnp.sum(jax.tree.leaves(state.params)[0]))
    it_s = inner * (2 if smoke else 3) / (time.perf_counter() - t0)

    print(f"{tag:8s} hidden {hid:3d}: sample {rate:8.1f} showers/s | "
          f"train {it_s:6.2f} it/s | subnet {t_sub * 1e3:6.3f} ms "
          f"MFU {mfu * 100:5.1f}%", flush=True)
    return rate, it_s


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        rs.INNER = 2
    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}, dispatch floor "
          f"{rs.measure_dispatch_floor() * 1e3:.1f} ms", flush=True)
    r0, t0 = measure("parity", "model/cinn/cinn_ds2_electrons.yaml", smoke)
    r1, t1 = measure("tpu", "model/cinn/cinn_ds2_electrons_tpu.yaml", smoke)
    print(f"delta: sample {(r1 / r0 - 1) * 100:+.1f}%  "
          f"train {(t1 / t0 - 1) * 100:+.1f}%  "
          f"(the _tpu variant has +{33:.0f}% subnet params — adoption "
          f"needs the AUC gate)")


if __name__ == "__main__":
    main()
