"""LEMURS evaluation harness (reference
`/root/reference/experiments/lemurs/evaluate.py:317-707`): angle-sliced
reference extraction, the CaloChallenge histogram suite + z/r energy profiles
+ condition histograms, FPD/KPD, and the classifier tests, all on showers
transposed to the CaloChallenge voxel convention.
"""

from __future__ import annotations

import os

import h5py
import numpy as np

from vit4hep_tpu.evaluation import plots
from vit4hep_tpu.evaluation.high_level_features import HighLevelFeatures
from vit4hep_tpu.evaluation.metrics import fpd, kpd
from vit4hep_tpu.evaluation.ugr_evaluation import (
    EvalArgs,
    _run_classifier,
    prepare_high_data_for_classifier,
    prepare_low_data_for_classifier,
)
from vit4hep_tpu.utils.logger import LOGGER


def extract_shower_and_energy(events, max_len=-1, energy_bin=None, theta_bin=None,
                              phi_bin=None):
    """Slice the structured events table by condition windows
    (reference evaluate.py:49-83)."""
    shower = np.asarray(events["showers"])
    energy = np.asarray(events["incident_energy"]).reshape(-1, 1)
    theta = np.asarray(events["incident_theta"]).reshape(-1, 1)
    phi = np.asarray(events["incident_phi"]).reshape(-1, 1)
    mask = np.ones(len(energy), bool)
    for arr, win in ((energy, energy_bin), (theta, theta_bin), (phi, phi_bin)):
        if win is not None:
            mask &= ((arr >= win[0]) & (arr < win[1])).squeeze()
    return (
        shower[mask][:max_len].astype(np.float32),
        energy[mask][:max_len].astype(np.float32),
        theta[mask][:max_len].astype(np.float32),
        phi[mask][:max_len].astype(np.float32),
    )


class LemursArgs(EvalArgs):
    def __init__(self, cfg):
        # LEMURS reuses the CaloChallenge eval options (eval_dataset "2" sets
        # particle/min-energy) + adds the slicing windows; the dataset tag in
        # filenames becomes "LEMURS" (reference evaluate.py:287-315, 330)
        ev = cfg.evaluation
        super().__init__(cfg)
        self.dataset = "LEMURS"
        self.energy_bin = ev.get("eval_energy_bin")
        self.theta_bin = ev.get("eval_theta_bin")
        self.phi_bin = ev.get("eval_phi_bin")
        self.energy_bin = list(self.energy_bin) if self.energy_bin else None
        self.theta_bin = list(self.theta_bin) if self.theta_bin else None
        self.phi_bin = list(self.phi_bin) if self.phi_bin else None


def run_from_py(sample, energy, theta, phi, cfg):
    LOGGER.info("Running LEMURS evaluation:")
    arg = LemursArgs(cfg)
    arg.output_dir = os.path.join(str(cfg.run_dir), f"eval_{cfg.run_idx}")
    os.makedirs(arg.output_dir, exist_ok=True)

    sample = np.array(sample)
    num_voxels = int(np.prod(sample.shape[1:]))
    hlf = HighLevelFeatures(arg.particle, filename=cfg.data.xml_filename)

    # match the CaloChallenge voxel convention: (B, H, W, L) -> (B, L, W, H) flat
    sample = sample.transpose(0, 3, 2, 1).reshape(-1, num_voxels)
    np.nan_to_num(sample, copy=False, nan=0.0, neginf=0.0, posinf=0.0)
    sample[sample < arg.cut] = 0.0
    sample_conds = np.concatenate([energy, theta, phi], axis=1)

    with h5py.File(str(arg.reference_file), "r") as f:
        events = f["events"][:]
    LOGGER.info(
        f"slicing with energy bin {arg.energy_bin}, theta bin {arg.theta_bin}, "
        f"phi bin {arg.phi_bin}"
    )
    reference_shower, reference_energy, reference_theta, reference_phi = (
        extract_shower_and_energy(
            events, max_len=len(sample), energy_bin=arg.energy_bin,
            theta_bin=arg.theta_bin, phi_bin=arg.phi_bin,
        )
    )
    LOGGER.info(f"reference showers after slicing: {len(reference_energy)}")
    reference_shower = reference_shower.transpose(0, 3, 2, 1).reshape(-1, num_voxels)
    reference_shower[reference_shower < arg.cut] = 0.0
    reference_hlf = HighLevelFeatures(arg.particle, filename=cfg.data.xml_filename)
    reference_hlf.Einc = reference_energy
    reference_conds = np.concatenate(
        [reference_energy, reference_theta, reference_phi], axis=1
    )

    if arg.mode in ("all", "no-cls", "avg"):
        plots.plot_layer_comparison(
            hlf, sample.mean(axis=0, keepdims=True),
            reference_hlf, reference_shower.mean(axis=0, keepdims=True), arg,
        )
        hlf.DrawAverageShower(
            sample,
            filename=os.path.join(arg.output_dir, f"average_shower_dataset_{arg.dataset}.png"),
            title="Shower average",
        )
        hlf.DrawAverageShower(
            reference_shower.mean(axis=0, keepdims=True),
            filename=os.path.join(
                arg.output_dir, f"reference_average_shower_dataset_{arg.dataset}.png"
            ),
            title="Shower average reference dataset",
        )

    needs_features = arg.mode != "avg"
    if needs_features:
        LOGGER.info("Calculating high-level features ...")
        hlf.CalculateFeatures(sample)
        hlf.Einc = energy
        if reference_hlf.E_tot is None:
            reference_hlf.CalculateFeatures(reference_shower)

    if arg.mode in ("all", "no-cls", "hist-p", "hist-chi", "hist"):
        with open(
            os.path.join(arg.output_dir, f"histogram_chi2_{arg.dataset}.txt"),
            "w", encoding="utf-8",
        ) as f:
            f.write("List of chi2 of the plotted histograms (eq. 15 of 2009.03796).\n")
        LOGGER.info("Plotting histograms ...")
        common = ([hlf], reference_hlf, arg, arg.labels, [""], arg.p_label)
        plots.plot_Etot_Einc_scaled(*common)
        plots.plot_E_layers(*common)
        plots.plot_ECEtas(*common)
        plots.plot_ECPhis(*common)
        plots.plot_ECWidthEtas(*common)
        plots.plot_ECWidthPhis(*common)
        plots.plot_sparsity(*common)
        plots.plot_weighted_depth_a(*common)
        plots.plot_weighted_depth_r(*common)
        plots.plot_z_profile(*common)
        plots.plot_r_profile(*common)
        plots.plot_cell_dist([sample], reference_shower, arg, arg.labels, [""], arg.p_label)
        plots.plot_conditions(sample_conds, reference_conds, arg, arg.labels, [""], arg.p_label)

    if arg.mode in ("all", "fpd", "kpd"):
        LOGGER.info("Computing FPD/KPD ...")
        src = prepare_high_data_for_classifier(sample, energy, hlf, 0.0)[:, :-1]
        ref = prepare_high_data_for_classifier(
            reference_shower, reference_energy, reference_hlf, 1.0
        )[:, :-1]
        # exact reference invocation (evaluate.py:778-783): jetnet draws with
        # replacement, so no clamping to the available statistics is needed
        fpd_val, fpd_err = fpd(ref, src, min_samples=10000)
        kpd_val, kpd_err = kpd(ref, src, batch_size=10000)
        result = (
            f"FPD (x10^3): {fpd_val * 1e3:.4f} ± {fpd_err * 1e3:.4f}\n"
            f"KPD (x10^3): {kpd_val * 1e3:.4f} ± {kpd_err * 1e3:.4f}"
        )
        LOGGER.info(result)
        with open(
            os.path.join(arg.output_dir, f"fpd_kpd_{arg.dataset}.txt"), "w",
            encoding="utf-8",
        ) as f:
            f.write(result)

    if arg.mode in ("all", "all-cls", "cls-low", "cls-high", "cls-low-normed", "cls-resnet"):
        list_cls = (
            ["cls-low", "cls-high", "cls-resnet"]
            if arg.mode in ("all", "all-cls") else [arg.mode]
        )
        for key in list_cls:
            LOGGER.info(f"Training classifier {key} ...")
            if key in ("cls-low", "cls-resnet"):
                src = prepare_low_data_for_classifier(sample, energy, hlf, 0.0, cut=arg.cut)
                ref = prepare_low_data_for_classifier(
                    reference_shower, reference_energy, reference_hlf, 1.0, cut=arg.cut
                )
            elif key == "cls-low-normed":
                src = prepare_low_data_for_classifier(
                    sample, energy, hlf, 0.0, cut=arg.cut, normed=True
                )
                ref = prepare_low_data_for_classifier(
                    reference_shower, reference_energy, reference_hlf, 1.0,
                    cut=arg.cut, normed=True,
                )
            else:
                src = prepare_high_data_for_classifier(sample, energy, hlf, 0.0, cut=arg.cut)
                ref = prepare_high_data_for_classifier(
                    reference_shower, reference_energy, reference_hlf, 1.0, cut=arg.cut
                )
            acc, auc, jsd = _run_classifier(key, src, ref, arg)
            LOGGER.info(f"{key}: AUC {auc:.4f} / JSD {jsd:.4f}")
