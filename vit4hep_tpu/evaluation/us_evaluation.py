"""u-space (per-layer energy-ratio) evaluation for energy models.

Counterpart of the reference
(`/root/reference/experiments/calo_utils/us_evaluation/`): per-u_i ratio-panel
histograms (:func:`plot_ui_dists`) and a DNN classifier test on the u-vectors
(:func:`eval_ui_dists`), sharing the Flax classifier machinery in
vit4hep_tpu/evaluation/classifiers.py.
"""

from __future__ import annotations

import os

import numpy as np

from vit4hep_tpu.evaluation.classifiers import run_dnn_classifier
from vit4hep_tpu.evaluation.plots import ratio_panel
from vit4hep_tpu.utils.logger import LOGGER


def _eval_dir(cfg):
    out = os.path.join(str(cfg.run_dir), f"eval_{cfg.run_idx}")
    os.makedirs(out, exist_ok=True)
    return out


def plot_ui_dists(
    gen_us,
    ref_us,
    xlim=(-0.05, 1.05),
    num_bins=64,
    cfg=None,
    labels=("Model",),
):
    """One 3-panel histogram per u_i (reference us_evaluation/plots.py:8).

    For i == 0 (u_0 = E_tot/E_inc, can exceed 1) the range is data-driven; for
    the remaining ratios the upper bound is fixed at 1.05.
    """
    out_dir = _eval_dir(cfg) if cfg is not None else None
    for i, (ref, gen) in enumerate(zip(np.asarray(ref_us).T, np.asarray(gen_us).T, strict=True)):
        both = np.concatenate([ref, gen])
        if i == 0 or xlim == "auto":
            lo, hi = float(both.min()), float(both.max())
        else:
            lo, hi = xlim[0], 1.05
        bins = np.linspace(lo, hi, num_bins)
        ratio_panel(
            [gen], ref, bins, f"$u_{{{i}}}$", list(labels), ref_label="Geant",
            filename=os.path.join(out_dir, f"u{i}_dist.pdf") if out_dir else None,
        )


def eval_ui_dists(source_array, reference_array, cfg):
    """DNN classifier on u-vectors; logs and writes AUC/JSD
    (reference us_evaluation/classifier.py:33-110)."""
    out_dir = _eval_dir(cfg)
    ev = cfg.evaluation

    src = np.concatenate(
        [np.asarray(source_array), np.zeros((len(source_array), 1))], axis=1
    )
    ref = np.concatenate(
        [np.asarray(reference_array), np.ones((len(reference_array), 1))], axis=1
    )
    return run_dnn_classifier(
        src, ref, ev,
        os.path.join(out_dir, f"classifier_{ev.eval_mode}_{ev.eval_dataset}.txt"),
    )
