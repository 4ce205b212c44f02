"""CaloGAN low-level classifier evaluation (reference
`/root/reference/experiments/calogan/evaluate.py:25-111`): a DNN on the flat
504 voxels, real vs generated, with isotonic calibration and AUC/JSD."""

from __future__ import annotations

import os

import numpy as np

from vit4hep_tpu.data.calogan.datasets import load_data
from vit4hep_tpu.evaluation.classifiers import run_dnn_classifier
from vit4hep_tpu.utils.logger import LOGGER


def eval_calogan_lowlevel(source_array, cfg):
    ev = cfg.evaluation
    out_dir = os.path.join(str(cfg.run_dir), f"eval_{cfg.run_idx}")
    os.makedirs(out_dir, exist_ok=True)

    ref = load_data(str(ev.eval_hdf5_file))
    reference_array = np.concatenate(
        [
            ref["layer_0"].reshape(-1, 288),
            ref["layer_1"].reshape(-1, 144),
            ref["layer_2"].reshape(-1, 72),
        ],
        axis=1,
    )

    src = np.concatenate(
        [np.asarray(source_array), np.zeros((len(source_array), 1))], axis=1
    )
    reference_array = np.concatenate(
        [reference_array, np.ones((len(reference_array), 1))], axis=1
    )
    return run_dnn_classifier(
        src, reference_array, ev,
        os.path.join(out_dir, f"classifier_{ev.eval_mode}_{ev.eval_dataset}.txt"),
    )
