"""On-chip sampling rates for the non-CaloChallenge model families.

The north-star bench (bench.py) pins CaloChallenge ds1/ds2/ds3 + cINN +
energy; LEMURS, CaloHadronic and CaloGAN ride the same ViT/CFM kernel tier
(fused_block: sample, attn_impl: auto) but had no measured numbers.
CaloHadronic is the longest shipped sequence (606 = 30 ECal + 576 HCal
tokens — past ds3's 450); CaloGAN (84 tokens) and LEMURS (135, the ds2
geometry with 53-dim conditioning) bracket the short end.

Timing is bench.py's exact sampler pattern (one jitted program per batch,
every timed iteration ends in a device->host scalar fetch). Single process,
results stream line-by-line. Run AFTER bench.py, never concurrently
(1-vCPU host).

Run: python tools/family_rates.py [batch]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._bench_util import reassert_platform, sampler_rate  # noqa: E402

reassert_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (yaml, cond_dim, n_iters, tokens-for-the-log)
_FAMILIES = {
    "lemurs": ("model/cfm_lemurs/cfm_lemurs.yaml", 53, 8, 135),
    "calohadronic": ("model/cfm_calohad/cfm_calohad.yaml", 59, 3, 606),
    "calogan_eplus": ("model/cfm_calogan/cfm_eplus.yaml", 4, 8, 84),
}




def main():
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    float(jnp.zeros(()))  # absorb any first-fetch backlog before timing
    print(f"device: {jax.devices()[0].platform}, batch {batch}", flush=True)
    for name, (yaml_rel, cond_dim, n_iters, tokens) in _FAMILIES.items():
        model = instantiate(
            _load_yaml(os.path.join(_REPO, "configs", yaml_rel)))
        r = sampler_rate(model, cond_dim, batch, n_iters)
        print(f"{name:14s} ({tokens:3d} tokens)  {r:8.1f} showers/s",
              flush=True)


if __name__ == "__main__":
    main()
