"""AUC gate for TPU-tuned head-count configs (BASELINE.md "Head-count lever").

The 3-head configs (`configs/model/cfm/cfm_ds2_electrons_tpu.yaml`, ds3
variant) are +28-35% faster at identical FLOPs/params, but head count changes
the learned function — so adoption on a new dataset requires one classifier
check: train both configs, sample, evaluate, and compare the classifier AUC
(target AUC -> 0.5; matched fidelity = the TPU config's |AUC - 0.5| is not
worse than the parity config's by more than the tolerance).

This tool runs that comparison end to end through the normal launcher
(matching the reference's classifier gate,
/root/reference/experiments/calo_utils/ugr_evaluation/evaluate.py:737-756):

    python tools/validate_tpu_config.py -cn calochallenge/cfm/calochallenge_ds2 \
        [--tpu-model model/cfm/cfm_ds2_electrons_tpu] [--tol 0.02] [overrides...]

Both runs share every setting except the model config; results are parsed
from the eval harness's ``classifier_*_*.txt`` outputs in each run dir.
Exit code 0 = TPU config passes the gate, 1 = it fails, 2 = harness error.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_classifier_results(run_dir):
    """Collect {classifier_key: (auc, jsd)} from a run dir's eval outputs
    (``eval_*/classifier_<mode>_<key>_<dataset>.txt``; the final appended
    block is the authoritative one)."""
    results = {}
    for path in sorted(glob.glob(os.path.join(run_dir, "eval_*", "classifier_*.txt"))):
        m = re.match(r"classifier_[^_]+_(cls-[a-z-]+)_(.+)\.txt", os.path.basename(path))
        if not m:
            continue
        key = m.group(1)
        with open(path, encoding="utf-8") as f:
            # JSD may be negative (estimator noise on near-identical sets)
            pairs = re.findall(r"(-?[0-9.]+) / (-?[0-9.]+)", f.read())
        if pairs:
            results[key] = (float(pairs[-1][0]), float(pairs[-1][1]))
    return results


def compare_aucs(parity, tpu, tol=0.02):
    """Gate verdict: for every classifier both runs produced, the TPU config's
    distance from the ideal AUC 0.5 may exceed the parity config's by at most
    ``tol``. Returns (ok, list of per-classifier report lines)."""
    lines, ok = [], True
    shared = sorted(set(parity) & set(tpu))
    if not shared:
        return False, ["no common classifier results to compare"]
    for key in shared:
        pa, ta = parity[key][0], tpu[key][0]
        d_par, d_tpu = abs(pa - 0.5), abs(ta - 0.5)
        passed = d_tpu <= d_par + tol
        ok &= passed
        lines.append(
            f"{key:16s} parity AUC {pa:.4f} (|d|={d_par:.4f})  "
            f"tpu AUC {ta:.4f} (|d|={d_tpu:.4f})  "
            f"{'PASS' if passed else 'FAIL'}"
        )
    return ok, lines


def run_one(config_name, run_name, overrides, config_path="configs"):
    from main import get_experiment
    from vit4hep_tpu.utils.config import compose

    cfg = compose(config_path=config_path, config_name=config_name,
                  overrides=[f"run_name={run_name}", *overrides])
    get_experiment(cfg.exp_type)(cfg)()
    return os.path.join(cfg.base_dir, "runs", cfg.exp_name, run_name)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-cn", dest="config_name", required=True,
                    help="experiment config (parity model)")
    ap.add_argument("-cp", dest="config_path", default="configs",
                    help="config tree root (default: configs)")
    ap.add_argument("--tpu-model", default=None,
                    help="model-group override for the TPU variant "
                         "(default: <model>_tpu)")
    ap.add_argument("--tol", type=float, default=0.02,
                    help="allowed extra |AUC-0.5| for the TPU config")
    ap.add_argument("overrides", nargs="*", help="hydra-style overrides for BOTH runs")
    arg = ap.parse_args(argv)

    # hydra group-override value is relative to the group ("cfm/..._tpu");
    # tolerate the fully-qualified "model/cfm/..._tpu" spelling too
    tpu_model = arg.tpu_model
    if tpu_model and tpu_model.startswith("model/"):
        tpu_model = tpu_model[len("model/"):]
    tpu_override = (
        f"model={tpu_model}" if tpu_model
        else "model.net.param.num_heads=3"
    )
    try:
        parity_dir = run_one(arg.config_name, "auc_gate_parity", arg.overrides,
                             config_path=arg.config_path)
        tpu_dir = run_one(arg.config_name, "auc_gate_tpu",
                          [tpu_override, *arg.overrides],
                          config_path=arg.config_path)
    except Exception as e:  # pragma: no cover - surfaced to the caller
        print(f"harness error: {e}")
        return 2

    parity = parse_classifier_results(parity_dir)
    tpu = parse_classifier_results(tpu_dir)
    ok, lines = compare_aucs(parity, tpu, tol=arg.tol)
    print("\n".join(lines))
    print("GATE:", "PASS — adopt the TPU head-count config for this dataset"
          if ok else "FAIL — keep the parity head count")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
