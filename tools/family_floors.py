"""Family MFU floors on one convention (VERDICT r4 next #4).

ds1/ds2/ds3 each carry an MFU statement in BASELINE.md; the three
non-CaloChallenge families only had bench numbers. This tool puts all the
sampling metrics on the SAME convention used everywhere else in the repo:

  FLOPs/shower = evals x 2 x depth x (12 H^2 N + 2 N^2 H)
  (matmul MACs only — embedders/adaLN ~0.6%, ignored, consistent with the
   ds2/ds3 rooflines; evals = 80 from the shipped RK4 step 0.05)
  implied TFLOP/s = rate x FLOPs/shower;  MFU = implied / 197 (v5e bf16)

Geometry is read from the shipped model configs; rates come from the
newest banked bench capture (BENCH_r*.json / BENCH_MIDROUND_r*.json) or
--rates name=value overrides. Pure arithmetic — no device needed.

Run: python tools/family_floors.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BF16_PEAK_TFLOPS = 197.0  # v5e

# metric key -> (model yaml, label)
FAMILIES = {
    "ds2_sampling_showers_s": ("model/cfm/cfm_ds2_electrons.yaml", "ds2"),
    "ds3_sampling_showers_s": ("model/cfm/cfm_ds3_electrons.yaml", "ds3"),
    "ds1_sampling_showers_s": ("model/cfm/cfm_ds1_photons.yaml", "ds1 photons"),
    "lemurs_showers_s": ("model/cfm_lemurs/cfm_lemurs.yaml", "LEMURS"),
    "calohadronic_showers_s": ("model/cfm_calohad/cfm_calohad.yaml",
                               "CaloHadronic"),
    "calogan_showers_s": ("model/cfm_calogan/cfm_eplus.yaml", "CaloGAN e+"),
}


def geometry(yaml_rel):
    """(tokens, hidden, depth, evals) from a shipped model config."""
    from vit4hep_tpu.utils.config import _load_yaml

    cfg = _load_yaml(os.path.join(_REPO, "configs", yaml_rel))
    p = cfg["net"]["param"]
    tokens = sum(int(a) * int(b) * int(c) for a, b, c in p["num_patches"])
    step = float(cfg["odeint_kwargs"]["options"]["step_size"])
    evals = int(round(1.0 / step)) * 4  # RK4
    return tokens, int(p["hidden_dim"]), int(p["depth"]), evals


def flops_per_shower(tokens, hidden, depth, evals):
    macs = depth * (12 * hidden * hidden * tokens
                    + 2 * tokens * tokens * hidden)
    return 2.0 * macs * evals


def newest_rates():
    caps = sorted(
        glob.glob(os.path.join(_REPO, "BENCH_r*.json"))
        + glob.glob(os.path.join(_REPO, "BENCH_MIDROUND_r*.json")),
        key=os.path.getmtime)
    for path in reversed(caps):
        try:
            with open(path) as f:
                cap = json.load(f)
            rec = cap.get("parsed", cap)
            if "tail" in rec:  # driver record wraps the JSON line in `tail`
                line = [l for l in rec["tail"].splitlines()
                        if l.startswith("{")][-1]
                rec = json.loads(line)
            rates = {k: v["value"] for k, v in rec.get("extra", {}).items()
                     if isinstance(v, dict) and v.get("value")}
            if rec.get("value"):
                rates["ds2_sampling_showers_s"] = rec["value"]
            if rates:
                return rates, os.path.basename(path)
        except Exception:
            continue
    return {}, None


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    rates, src = newest_rates()
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            rates[k] = float(v)
    print(f"rates from: {src or 'overrides only'}")
    print(f"{'family':14s} {'N':>5s} {'H':>4s} {'GF/shower':>10s} "
          f"{'showers/s':>10s} {'TFLOP/s':>8s} {'MFU':>6s}")
    for key, (yaml_rel, label) in FAMILIES.items():
        n, hdim, depth, evals = geometry(yaml_rel)
        fl = flops_per_shower(n, hdim, depth, evals)
        rate = rates.get(key)
        if rate is None:
            print(f"{label:14s} {n:5d} {hdim:4d} {fl / 1e9:10.1f} "
                  f"{'--':>10s}")
            continue
        tf = rate * fl / 1e12
        print(f"{label:14s} {n:5d} {hdim:4d} {fl / 1e9:10.1f} "
              f"{rate:10.1f} {tf:8.1f} {tf / BF16_PEAK_TFLOPS * 100:5.1f}%")


if __name__ == "__main__":
    main()
