"""Single-process A/B of the round-3 cINN data-path levers, one TPU session.

Round-3 late-session change set (models/bijectors.py + ops/fused_spline.py):
  1. theta4  — hand the spline kernel theta in the subnet's native
     (B, T, S, P) layout (one fused transpose) instead of the
     reshape-to-(B, D, P) + swapaxes pair (two relayouts of ~100 MB).
  2. onehot-permute — Permute rides the MXU via a one-hot matmul instead of
     jnp.take (which lowers to a serialized dynamic-slice chain on TPU).
  3. strided-split — coupling even/odd splits via static stride-2 slices
     instead of take(arange(0, n, 2)) gathers.

Session-to-session composed-arm readings vary 1300-1440 showers/s
(BASELINE.md), so adoption decisions need all arms in ONE process run —
this script measures each variant by monkeypatching the lever off, re-jitting
in place. No subprocesses, no killed clients (the 2026-08-19 15:3x wedge came
from a `timeout`-killed stash A/B client — don't repeat it). Results are
appended to the log line-by-line so a mid-run wedge still leaves a record.

Run: python tools/cinn_micro_ab.py [batch]
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from vit4hep_tpu.models import bijectors
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    model = instantiate(
        _load_yaml(os.path.join(_REPO, "configs/model/cinn/cinn_ds2_electrons.yaml")))
    params = model.init_params(jax.random.PRNGKey(0))
    print(f"device: {jax.devices()[0].platform}, batch {batch}", flush=True)

    # keep originals
    new_split = bijectors.BinnedRQSCouplingBlock._split
    new_perm_fwd = bijectors.Permute.forward
    new_perm_inv = bijectors.Permute.inverse
    new_apply = bijectors.BinnedRQSCouplingBlock._apply_spline

    def take_split(self, x):
        ax = 2 if self.spatial else 1
        return x.take(jnp.arange(0, x.shape[ax], 2), axis=ax), x.take(
            jnp.arange(1, x.shape[ax], 2), axis=ax)

    def take_fwd(self, x, c=None):
        return jnp.take(x, self.perm, axis=self.axis), 0.0

    def take_inv(self, y, c=None):
        return jnp.take(y, self.perm_inv, axis=self.axis), 0.0

    def theta3_apply(self, subnet, active, passive, c, rev):
        from vit4hep_tpu.ops.fused_spline import fused_binned_rqs_inverse
        from vit4hep_tpu.ops import rqs

        theta = subnet(passive, c)
        b = active.shape[0]
        flat = active.reshape(b, -1)
        theta = theta.reshape(b, flat.shape[1], self.n_params)
        if rev and self.fused_spline:
            y, logdet = fused_binned_rqs_inverse(
                flat, theta, self.bins, tuple(self.min_bin_sizes),
                tuple(self.default_domain), self.identity_tails,
                self.domain_clamping)
            return y.reshape(active.shape), logdet
        p = rqs.binned_constrain(
            theta, self.bins, tuple(self.min_bin_sizes),
            tuple(self.default_domain), self.identity_tails,
            self.domain_clamping)
        y, logdet = rqs.binned_rqs(flat, p, rev=rev)
        return y.reshape(active.shape), logdet

    variants = [
        ("all-new (theta4 + onehot-permute + strided-split)", {}),
        ("minus theta4 (3-D reshape+swapaxes)",
         {"_apply_spline": theta3_apply}),
        ("minus onehot-permute (take)",
         {"forward": take_fwd, "inverse": take_inv}),
        ("minus strided-split (take-arange)", {"_split": take_split}),
        ("all-old (HEAD-equivalent data path)",
         {"_apply_spline": theta3_apply, "forward": take_fwd,
          "inverse": take_inv, "_split": take_split}),
    ]
    for name, patches in variants:
        bijectors.BinnedRQSCouplingBlock._split = patches.get("_split", new_split)
        bijectors.BinnedRQSCouplingBlock._apply_spline = patches.get(
            "_apply_spline", new_apply)
        bijectors.Permute.forward = patches.get("forward", new_perm_fwd)
        bijectors.Permute.inverse = patches.get("inverse", new_perm_inv)
        # seed_base=0 keeps this tool's historical fold_in offsets (its
        # banked A/B logs) — sampler_rate's default of 1000 is head_sweep's
        r = sampler_rate(model, batch=batch, params=params, seed_base=0)
        print(f"{r:8.1f} showers/s  {name}", flush=True)


if __name__ == "__main__":
    main()
