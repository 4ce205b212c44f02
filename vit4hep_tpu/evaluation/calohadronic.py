"""CaloHadronic evaluation (reference
`/root/reference/experiments/calohadronic/evaluate.py:89-311`): shower
centroids, E_tot/E_inc, hit counts, per-layer energies; feature histograms and
a DNN classifier on the standardized feature vector against the (sum-pooled)
Geant4 reference.
"""

from __future__ import annotations

import os

import h5py
import numpy as np

from vit4hep_tpu.data.calohadronic.datasets import load_data
from vit4hep_tpu.evaluation.classifiers import run_dnn_classifier
from vit4hep_tpu.evaluation.plots import ratio_panel
from vit4hep_tpu.utils.logger import LOGGER


def get_centroid_z(ecal, hcal):
    """Energy-weighted mean layer index over the joint calo (reference :89-96)."""
    profile = np.concatenate([ecal.mean((-1, -2)), hcal.mean((-1, -2))], axis=1)
    idx = np.arange(profile.shape[1])[None, :]
    return (idx * profile).sum(1) / profile.sum(-1)


def _transverse_centroid(ecal, hcal, axis_e, axis_h, ecalmm):
    hcal_mm = 30
    ecal_avg = ecal.mean(axis_e)
    hcal_avg = hcal.mean(axis_h)
    pos_e = (np.arange(ecal_avg.shape[1]) * ecalmm)[None, :]
    pos_h = (np.arange(hcal_avg.shape[1]) * hcal_mm)[None, :]
    weighted = np.concatenate([ecal_avg * pos_e, hcal_avg * pos_h], axis=1)
    total = np.concatenate([ecal_avg, hcal_avg], axis=1)
    return weighted.sum(1) / total.sum(-1) - 430.0


def get_centroid_x(ecal, hcal, ecalmm=5.1):
    return _transverse_centroid(ecal, hcal, (-1, -3), (-1, -3), ecalmm)


def get_centroid_y(ecal, hcal, ecalmm=5.1):
    return _transverse_centroid(ecal, hcal, (-2, -3), (-2, -3), ecalmm)


def get_total_energy(ecal, hcal):
    return ecal.sum((-1, -2, -3)) + hcal.sum((-1, -2, -3))


def get_n_hits(ecal, hcal, threshold=1.0e-6):
    return (ecal > threshold).sum((-1, -2, -3)) + (hcal > threshold).sum((-1, -2, -3))


def _sum_pool_ecal(ecal, kernel=(3, 12, 12)):
    b, l, h, w = ecal.shape
    kl, kh, kw = kernel
    return ecal.reshape(b, l // kl, kl, h // kh, kh, w // kw, kw).sum((2, 4, 6))


FEATURES = [
    ("cog_x", r"$\langle x \rangle$ [mm]"),
    ("cog_y", r"$\langle y \rangle$ [mm]"),
    ("cog_z", r"$\langle z \rangle$ layer number"),
    ("energy", r"$E_{tot}/E_{inc}$"),
    ("nhits", r"$n_{hits}$"),
]


def run_from_py(ecal, hcal, energy, cfg):
    LOGGER.info("Running CaloHadronic evaluation:")
    ev = cfg.evaluation
    output_dir = os.path.join(str(cfg.run_dir), f"eval_{cfg.run_idx}")
    os.makedirs(output_dir, exist_ok=True)

    ecal = np.array(ecal)
    hcal = np.array(hcal)
    energy = np.asarray(energy).reshape(-1, 1)

    with h5py.File(str(ev.eval_hdf5_file), "r") as f:
        ref = load_data(f, local_index=None)
    # reference ECal arrives raw (30x180x180); sum-pool to the generated grid
    # (reference evaluate.py:174-179)
    ecal_g4 = (
        _sum_pool_ecal(ref["ecal"]) if ref["ecal"].shape[1:] != ecal.shape[1:]
        else np.array(ref["ecal"])
    )
    hcal_g4 = np.array(ref["hcal"])
    energy_g4 = np.asarray(ref["energy"]).reshape(-1, 1)

    min_energy = 1.0e-6
    for arr in (ecal, hcal, ecal_g4, hcal_g4):
        arr[arr < min_energy] = 0.0

    def features(ec, hc, en):
        return {
            "cog_x": get_centroid_x(ec, hc, ecalmm=5.1 * 12),
            "cog_y": get_centroid_y(ec, hc, ecalmm=5.1 * 12),
            "cog_z": get_centroid_z(ec, hc),
            "energy": get_total_energy(ec, hc) / en.flatten(),
            "nhits": get_n_hits(ec, hc, threshold=min_energy).astype(np.float64),
        }

    f_gen = features(ecal, hcal, energy)
    f_g4 = features(ecal_g4, hcal_g4, energy_g4)

    class _Arg:
        pass

    arg = _Arg()
    arg.output_dir = output_dir
    arg.dataset = "CaloHad"

    # feature + voxel histograms (reference plot_histograms :30-88)
    for name, label in FEATURES:
        both = np.concatenate([f_gen[name], f_g4[name]])
        bins = np.linspace(np.nanmin(both), np.nanmax(both) + 1e-9, 41)
        ratio_panel(
            [f_gen[name]], f_g4[name], bins, label, ["ViT-CFM"],
            filename=os.path.join(output_dir, f"{name}_CaloHad.pdf"),
        )
    vox_gen = np.concatenate([ecal.ravel(), hcal.ravel()])
    vox_g4 = np.concatenate([ecal_g4.ravel(), hcal_g4.ravel()])
    with np.errstate(divide="ignore"):
        lv_gen = np.log10(vox_gen[vox_gen > 0])
        lv_g4 = np.log10(vox_g4[vox_g4 > 0])
    bins = np.linspace(min(lv_gen.min(), lv_g4.min()), max(lv_gen.max(), lv_g4.max()), 41)
    ratio_panel(
        [lv_gen], lv_g4, bins, r"$\log_{10} E_{voxel}$ [GeV]", ["ViT-CFM"],
        filename=os.path.join(output_dir, "voxels_CaloHad.pdf"),
    )

    # classifier on standardized features + per-layer energies (reference :211-311)
    def standardized(f, ref_stats):
        return {k: (v - ref_stats[k][0]) / ref_stats[k][1] for k, v in f.items()}

    stats = {k: (v.mean(), v.std() + 1e-12) for k, v in f_gen.items()}
    s_gen = standardized(f_gen, stats)
    s_g4 = standardized(f_g4, stats)
    layer_e_gen = np.concatenate([ecal.sum((-1, -2)), hcal.sum((-1, -2))], axis=1)
    layer_e_g4 = np.concatenate([ecal_g4.sum((-1, -2)), hcal_g4.sum((-1, -2))], axis=1)

    gen_arr = np.concatenate(
        [np.stack([s_gen[k] for k, _ in FEATURES], axis=1), layer_e_gen,
         np.ones((len(ecal), 1))], axis=1,
    )
    g4_arr = np.concatenate(
        [np.stack([s_g4[k] for k, _ in FEATURES], axis=1), layer_e_g4,
         np.zeros((len(ecal_g4), 1))], axis=1,
    )
    return run_dnn_classifier(
        gen_arr, g4_arr, ev, os.path.join(output_dir, "classifier.txt")
    )
