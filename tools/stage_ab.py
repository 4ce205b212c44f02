"""A/B the energy-decoder megakernel against the composed energy sampler
(and report the cINN sampler for context) on the attached device.

Measures `sample_batch` throughput at the shipped workloads
(cfm_ds2_energy.yaml batch 1024, cinn_ds2_electrons.yaml batch 256) with the
same timing discipline as bench.py (jitted program per batch, scalar-fetch
sync, warm-up fetch for tunnel backlog).

Run: python tools/stage_ab.py [energy|cinn|both] [group ...] [--cfg REL]
  energy: composed vs fused_block=true at each requested kernel group size
  (default groups: 8 16 32). --cfg picks the energy yaml (default
  model/cfm/cfm_ds2_energy.yaml) so ds1/ds3 shapes get their own decision.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    # the axon TPU plugin overrides JAX_PLATFORMS from the environment;
    # re-assert it (same guard as main.py) so CPU smoke runs stay on CPU
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _model(rel, patch=None):
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    raw = _load_yaml(os.path.join(_REPO, "configs", rel))
    if patch:
        patch(raw)
    return instantiate(raw)


def _rate(model, cond_dim, batch, n_iters=4, seed=0):
    key = jax.random.PRNGKey(seed)
    params = model.init_params(key)
    cond = jax.device_put(np.random.randn(batch, cond_dim).astype(np.float32))
    fn = jax.jit(lambda p, c, k: jnp.sum(model.sample_batch(p, c, k)))
    float(fn(params, cond, key))  # compile + warmup fetch
    t0 = time.perf_counter()
    for i in range(n_iters):
        s = float(fn(params, cond, jax.random.fold_in(key, 100 + i)))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return batch * n_iters / dt


def ab_energy(groups=(8, 16, 32), batch=1024,
              cfg="model/cfm/cfm_ds2_energy.yaml"):
    def strip(raw):  # measure the composed path even after the config flip
        raw["net"]["param"].pop("fused_block", None)
        raw["net"]["param"].pop("fused_group", None)
    from vit4hep_tpu.utils.config import _load_yaml
    cond_dim = int(_load_yaml(os.path.join(_REPO, "configs", cfg))
                   ["net"]["param"]["dims_c"])
    base = _rate(_model(cfg, strip), cond_dim, batch)
    print(f"energy composed [{cfg}]: {base:.1f} u-vec/s")
    for g in groups:
        def patch(raw, g=g):
            strip(raw)
            raw["net"]["param"]["fused_block"] = True
            raw["net"]["param"]["fused_group"] = int(g)
        r = _rate(_model(cfg, patch), cond_dim, batch)
        print(f"energy fused (group={g}): {r:.1f} u-vec/s "
              f"({(r / base - 1) * 100:+.0f}%)")


def cinn_rate(batch=256, groups=(1, 8, 16, 32)):
    """A/B the composed cINN inverse (the shipped default since the
    round-3 spline fix) against the `fused_block: sample` twin at each
    batch-group size: group=1 is the retired round-2 twin (measured -6%);
    grouped panels are the fused_energy_decoder trick applied to the tiny
    ViT1D subnet shapes (N=135, H=192 at ds2)."""
    cfg = "model/cinn/cinn_ds2_electrons.yaml"

    def strip(raw):
        raw["vit_kwargs"].pop("fused_block", None)
        raw["vit_kwargs"].pop("fused_group", None)

    base = _rate(_model(cfg, strip), 46, batch)
    print(f"cinn ds2 sampler (composed): {base:.1f} showers/s")
    for g in groups:
        def patch(raw, g=g):
            strip(raw)
            raw["vit_kwargs"]["fused_block"] = "sample"
            raw["vit_kwargs"]["fused_group"] = int(g)
        r = _rate(_model(cfg, patch), 46, batch)
        print(f"cinn twin (group={g}): {r:.1f} showers/s "
              f"({(r / base - 1) * 100:+.0f}%)")


if __name__ == "__main__":
    argv = sys.argv[1:]
    cfg = "model/cfm/cfm_ds2_energy.yaml"
    if "--cfg" in argv:
        i = argv.index("--cfg")
        cfg = argv[i + 1]
        del argv[i : i + 2]
    args = [a for a in argv if a != "--smoke"]
    smoke = "--smoke" in argv  # CPU plumbing check: tiny batch, 1 iter
    which = args[0] if args else "both"
    groups = tuple(int(a) for a in args[1:]) or ((4,) if smoke else (8, 16, 32))
    if smoke:
        _orig = _rate
        _rate = lambda m, cd, b, **kw: _orig(m, cd, 8, n_iters=1)
    float(jnp.zeros(()))  # absorb first-fetch backlog
    print("device:", jax.devices()[0].platform)
    if which in ("energy", "both"):
        ab_energy(groups, cfg=cfg)
    if which in ("cinn", "both"):
        cinn_rate(groups=(1,) + groups)
