"""Head-count sweep at the CURRENT kernel tier (round-3 megakernel stack).

The `_tpu` configs ship num_heads 3 on round-2 measurements (fused-layout
attention era: 3 heads +9-11%). The round-3 DiT megakernel's documented
residue is the per-head lane pad of (N, d) panels — d=80 (6 heads) and
d=160 (3 heads) both land on 62.5% lane density (80->128, 160->256), while
d=120 (4 heads) lands on 93.75% (120->128). If the lane-pad model is right,
4 heads should now beat both shipped options at identical FLOPs/params.

Single process, all arms one TPU session (composed-arm session variance is
larger than the expected deltas), results stream line-by-line so a mid-run
wedge still leaves a record. No subprocesses, no signal-killed clients.

Run: python tools/head_sweep.py            # ds2 + ds3 + ds1, heads {6,4,3}
     python tools/head_sweep.py ds2        # one dataset only
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._bench_util import reassert_platform, sampler_rate  # noqa: E402

reassert_platform()

import jax  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, yaml, cond_dim, batch, n_iters)
_WORKLOADS = {
    "ds2": ("model/cfm/cfm_ds2_electrons.yaml", 46, 256, 8),
    "ds3": ("model/cfm/cfm_ds3_electrons.yaml", 46, 256, 4),
    "ds1": ("model/cfm/cfm_ds1_photons.yaml", 6, 256, 8),
    # round 4: the other families share the hidden-480/6-head geometry, so
    # the same d=120 lever should transfer — measure, don't assume
    "lemurs": ("model/cfm_lemurs/cfm_lemurs.yaml", 53, 256, 8),
    "calohadronic": ("model/cfm_calohad/cfm_calohad.yaml", 59, 256, 3),
    "calogan": ("model/cfm_calogan/cfm_eplus.yaml", 4, 256, 8),
}


def main():
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    import jax.numpy as jnp

    which = sys.argv[1:] or ["ds2", "ds3", "ds1"]
    # warm-up fetch: absorbs the first-transfer backlog penalty of the link
    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}", flush=True)
    for name in which:
        yaml_rel, cond_dim, batch, n_iters = _WORKLOADS[name]
        for heads in (6, 4, 3):
            cfg = _load_yaml(os.path.join(_REPO, "configs", yaml_rel))
            cfg["net"]["param"]["num_heads"] = heads
            model = instantiate(cfg)
            d = cfg["net"]["param"]["hidden_dim"] // heads
            r = sampler_rate(model, cond_dim, batch, n_iters)
            print(f"{name}  heads={heads} (d={d:3d})  {r:8.1f} showers/s",
                  flush=True)


if __name__ == "__main__":
    main()
