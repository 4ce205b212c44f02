"""In-sampler and in-train A/B of the DiT-block megakernel paths.

Measures, on the real chip, the shipped parity configs with
``fused_block`` disabled / enabled:

- sampling showers/s for ds1/ds2/ds3 (plus cINN ds2 inverse throughput)
  via bench.py's `_timed_sampler` (scan-jitted batches, exact sync);
- full train-step it/s for ds2/ds3 via tools/train_attn_bench.bench_train.

These are the numbers behind BASELINE.md's megakernel section; re-run
after kernel changes. The `sample` mode ships in configs, so `False`
below reproduces the composed path by overriding the knob.

Run: python tools/megakernel_bench.py [--train-only|--sample-only]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _model(yaml_rel, fused):
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    cfg = _load_yaml(os.path.join(_REPO, "configs", yaml_rel))
    key = "vit_kwargs" if "vit_kwargs" in cfg else None
    if key:
        cfg[key]["fused_block"] = fused
    else:
        cfg["net"]["param"]["fused_block"] = fused
    return instantiate(cfg)


def bench_sampling():
    from bench import _timed_sampler

    workloads = [
        ("ds1", "model/cfm/cfm_ds1_photons.yaml", 6),
        ("ds2", "model/cfm/cfm_ds2_electrons.yaml", 46),
        ("ds3", "model/cfm/cfm_ds3_electrons.yaml", 46),
        ("cinn-ds2", "model/cinn/cinn_ds2_electrons.yaml", 46),
    ]
    for name, yaml_rel, cond_dim in workloads:
        for fused in (False, "sample"):
            m = _model(yaml_rel, fused)
            r = _timed_sampler(m, cond_dim=cond_dim, n_iters=4)
            print(f"{name:9s} sampling fused_block={str(fused):6s}: "
                  f"{r:7.1f} showers/s", flush=True)


def bench_training():
    from tools.train_attn_bench import bench_train
    import vit4hep_tpu.utils.config as C

    workloads = [
        ("ds2", "model/cfm/cfm_ds2_electrons.yaml", (1, 45, 16, 9), 64),
        ("ds3", "model/cfm/cfm_ds3_electrons.yaml", (1, 45, 50, 18), 16),
    ]
    orig = C._load_yaml
    for name, yaml_rel, shape, batch in workloads:
        for fused in (False, True):
            def patched(path, _f=fused):
                cfg = orig(path)
                if "net" in cfg and "param" in cfg.get("net", {}):
                    cfg["net"]["param"]["fused_block"] = _f
                return cfg

            C._load_yaml = patched
            try:
                r = bench_train(yaml_rel, shape, "auto", batch=batch)
            finally:
                C._load_yaml = orig
            print(f"{name} train (batch {batch}) fused_block={fused}: "
                  f"{r:6.2f} it/s", flush=True)


def main():
    import jax.numpy as jnp

    float(jnp.zeros(()))  # tunnel warm-up fetch
    if "--train-only" not in sys.argv:
        bench_sampling()
    if "--sample-only" not in sys.argv:
        bench_training()


if __name__ == "__main__":
    main()
