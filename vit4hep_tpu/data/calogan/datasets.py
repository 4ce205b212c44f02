"""CaloGAN (arXiv:1712.10321) dataset: eager HDF5 load + dict-transform pipeline.

Counterpart of `/root/reference/experiments/calogan/datasets.py` and
``utils.py``: three calorimeter layers (288 + 144 + 72 voxels, GeV after the
1e3 scaling) plus incident energy, flattened and preprocessed once at
construction into host numpy arrays ready for device upload.
"""

from __future__ import annotations

import h5py
import numpy as np

from vit4hep_tpu.utils.logger import LOGGER


def load_data(data_file):
    """Read layer_0/1/2 (scaled to GeV) and energy (reference utils.py:4-19)."""
    with h5py.File(data_file, "r") as f:
        return {
            "layer_0": f["layer_0"][:] / 1e3,
            "layer_1": f["layer_1"][:] / 1e3,
            "layer_2": f["layer_2"][:] / 1e3,
            "energy": f["energy"][:] / 1e0,
        }


class CaloGANDataset:
    """Eagerly preprocessed CaloGAN showers (reference datasets.py:9-76).

    ``return_us=True`` yields (u-vectors, energy) for energy-model training;
    otherwise (flat 504-voxel showers with channel axis, [energy, u's])."""

    bin_edges = np.array([0, 288, 432, 504])

    def __init__(self, hdf5_file, transform=None, return_us=False, rank=0):
        data = load_data(hdf5_file)
        for key in data:
            data[key] = np.asarray(data[key], np.float32).reshape(len(data[key]), -1)

        if transform:
            for fn in transform:
                if fn.__class__.__name__ == "NormalizeLayerEnergyGAN":
                    fn.bin_edges = self.bin_edges
                data = fn(data, rank=rank)

        if return_us:
            self.layers = data["extra_dims"]
            self.energy = data["energy"]
        else:
            self.layers = np.concatenate(
                [data["layer_0"], data["layer_1"], data["layer_2"]], axis=1
            )[:, None, :]
            self.energy = np.concatenate([data["energy"], data["extra_dims"]], axis=1)

        self.layers = self.layers.astype(np.float32)
        self.energy = self.energy.astype(np.float32)
        LOGGER.info(f"datasets: loaded data with shape {self.layers.shape}")
        LOGGER.info(
            f"datasets: boundaries of dataset are "
            f"({self.layers.min()}, {self.layers.max()})"
        )

    def __len__(self):
        return len(self.energy)
